"""Fused MLP-block kernel: interpret-mode parity + gradients + VMEM gate."""

import jax
import jax.numpy as jnp
import numpy as np

from autognothi_tpu.ops.mlp_block import (
    _make_block_fn,
    _xla_mlp_block,
    mlp_block,
)


def _setup(t=13, h=32, inter=64, b=2, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, h) * 0.5, jnp.float32)
    resid = jnp.asarray(rng.randn(b, t, h) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(inter, h) * 0.15, jnp.float32)  # torch layout
    b1 = jnp.asarray(rng.randn(inter) * 0.15, jnp.float32)
    w2 = jnp.asarray(rng.randn(h, inter) * 0.15, jnp.float32)
    b2 = jnp.asarray(rng.randn(h) * 0.15, jnp.float32)
    return x, resid, w1, b1, w2, b2


def test_kernel_matches_xla():
    x, resid, w1, b1, w2, b2 = _setup()
    got = _make_block_fn(True)(x, resid, w1.T, b1, w2.T, b2)
    want = _xla_mlp_block(x, resid, w1.T, b1, w2.T, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_matches_unfused_composition():
    from autognothi_tpu.models.common import dense, gelu

    x, resid, w1, b1, w2, b2 = _setup()
    got = mlp_block(x, resid, w1, b1, w2, b2, use_pallas=False)
    want = resid + dense(gelu(dense(x, w1, b1)), w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_gradients_match():
    x, resid, w1, b1, w2, b2 = _setup(t=8)

    def loss_kernel(x_, w1_):
        return jnp.sum(_make_block_fn(True)(x_, resid, w1_.T, b1, w2.T, b2) ** 2)

    def loss_xla(x_, w1_):
        return jnp.sum(_xla_mlp_block(x_, resid, w1_.T, b1, w2.T, b2) ** 2)

    g_k = jax.grad(loss_kernel, argnums=(0, 1))(x, w1)
    g_x = jax.grad(loss_xla, argnums=(0, 1))(x, w1)
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_vmem_gate_falls_back_for_large_models():
    from autognothi_tpu.ops.mlp_block import _fits_vmem

    x_small = jnp.zeros((1, 197, 768), jnp.bfloat16)
    w1_small = jnp.zeros((3072, 768), jnp.bfloat16)
    assert _fits_vmem(x_small, w1_small)
    x_large = jnp.zeros((1, 197, 1024), jnp.bfloat16)
    w1_large = jnp.zeros((4096, 1024), jnp.bfloat16)
    assert not _fits_vmem(x_large, w1_large)
