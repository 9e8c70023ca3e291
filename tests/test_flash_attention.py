"""Pallas masked-attention kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autognothi_tpu.ops.flash_attention import masked_attention


def _reference(q, k, v, row, mode):
    d = q.shape[-1]
    scores = jnp.einsum("nhtd,nhsd->nhts", q, k) / math.sqrt(d)
    if mode == "add":
        scores = scores + row[:, None, None, :]
    else:
        scores = scores * row[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nhts,nhsd->nhtd", probs, v)


@pytest.mark.parametrize("mode", ["add", "mul"])
@pytest.mark.parametrize("t", [5, 128, 197])
def test_kernel_matches_xla(mode, t):
    rng = np.random.RandomState(0)
    n, h, d = 2, 3, 32
    q = jnp.asarray(rng.randn(n, h, t, d), jnp.float32)
    k = jnp.asarray(rng.randn(n, h, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(n, h, t, d), jnp.float32)
    if mode == "add":
        mask01 = rng.randint(0, 2, (n, t)).astype(np.float32)
        mask01[:, 0] = 1
        row = jnp.asarray((1.0 - mask01) * float(jnp.finfo(jnp.float32).min))
    else:
        mask01 = rng.randint(0, 2, (n, t)).astype(np.float32)
        mask01[:, 0] = 1
        row = jnp.asarray(mask01)

    got = masked_attention(q, k, v, row, mode=mode, interpret=True)
    want = _reference(q, k, v, row, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_kernel_bf16_inputs():
    rng = np.random.RandomState(1)
    n, h, t, d = 1, 2, 64, 32
    q = jnp.asarray(rng.randn(n, h, t, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(n, h, t, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(n, h, t, d), jnp.bfloat16)
    row = jnp.ones((n, t), jnp.float32)
    got = masked_attention(q, k, v, row, mode="mul", interpret=True)
    want = _reference(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32), row, "mul")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=3e-2, rtol=3e-2
    )
