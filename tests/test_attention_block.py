"""Fused attention-block kernel: interpret-mode parity vs the XLA math and
the existing self_attention composition, plus gradient parity (custom_vjp)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autognothi_tpu.models.common import dense, self_attention
from autognothi_tpu.ops.attention_block import (
    _make_block_fn,
    _xla_attention_block,
    attention_block,
)


def _setup(mode, t=13, h=32, n_heads=4, b=2, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, h), jnp.float32)
    resid = jnp.asarray(rng.randn(b, t, h), jnp.float32)
    weights = tuple(
        jnp.asarray(a * 0.15, jnp.float32) for a in (
            rng.randn(h, h), rng.randn(h), rng.randn(h, h), rng.randn(h),
            rng.randn(h, h), rng.randn(h), rng.randn(h, h), rng.randn(h),
        )
    )
    mask01 = rng.randint(0, 2, (b, t)).astype(np.float32)
    mask01[:, 0] = 1
    if mode == "add":
        row = jnp.asarray((1 - mask01) * float(jnp.finfo(jnp.float32).min))
    else:
        row = jnp.asarray(mask01)
    return x, resid, row, weights


@pytest.mark.parametrize("mode", ["add", "mul"])
def test_xla_math_matches_composition(mode):
    x, resid, row, weights = _setup(mode)
    wq, bq, wk, bk, wv, bv, wo, bo = weights
    got = attention_block(x, resid, row, weights, 4, mode, use_pallas=False)

    mask = row[:, None, None, :] if mode == "add" else row
    ctx = self_attention(x, wq, bq, wk, bk, wv, bv, 4, mask,
                         "additive" if mode == "add" else "multiplicative")
    want = resid + dense(ctx, wo, bo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["add", "mul"])
def test_kernel_matches_xla_math(mode):
    x, resid, row, weights = _setup(mode, t=8, h=32)
    wq, bq, wk, bk, wv, bv, wo, bo = weights
    args = (x, resid, row,
            wq.T, bq, wk.T, bk, wv.T, bv, wo.T, bo)
    got = _make_block_fn(4, mode, True)(*args)
    want = _xla_attention_block(*args, n_heads=4, mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_gradients_flow_through_custom_vjp():
    x, resid, row, weights = _setup("add", t=8, h=32)
    wq, bq, wk, bk, wv, bv, wo, bo = weights

    def loss_kernel(x_, wq_):
        out = _make_block_fn(4, "add", True)(
            x_, resid, row, wq_.T, bq, wk.T, bk, wv.T, bv, wo.T, bo
        )
        return jnp.sum(out ** 2)

    def loss_xla(x_, wq_):
        out = _xla_attention_block(
            x_, resid, row, wq_.T, bq, wk.T, bk, wv.T, bv, wo.T, bo,
            n_heads=4, mode="add",
        )
        return jnp.sum(out ** 2)

    g_k = jax.grad(loss_kernel, argnums=(0, 1))(x, wq)
    g_x = jax.grad(loss_xla, argnums=(0, 1))(x, wq)
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)
