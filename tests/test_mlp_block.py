"""Fused MLP-block kernel: interpret parity, LN modes, gradients, VMEM gate,
plus whole-layer fused-vs-unfused parity for both encoder families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autognothi_tpu.ops.mlp_block import (
    _fits_vmem,
    _make_block_fn,
    _xla_mlp_block,
    mlp_block,
)


def _setup(t=13, h=32, inter=64, b=2, seed=0):
    rng = np.random.RandomState(seed)
    resid = jnp.asarray(rng.randn(b, t, h) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(inter, h) * 0.15, jnp.float32)  # torch layout
    b1 = jnp.asarray(rng.randn(inter) * 0.15, jnp.float32)
    w2 = jnp.asarray(rng.randn(h, inter) * 0.15, jnp.float32)
    b2 = jnp.asarray(rng.randn(h) * 0.15, jnp.float32)
    ln = (jnp.asarray(1 + 0.1 * rng.randn(h), jnp.float32),
          jnp.asarray(0.1 * rng.randn(h), jnp.float32), 1e-12)
    return resid, w1, b1, w2, b2, ln


@pytest.mark.parametrize("ln_position", ["none", "prologue", "epilogue"])
def test_kernel_matches_xla(ln_position):
    resid, w1, b1, w2, b2, ln = _setup()
    args = (resid, w1.T, b1, w2.T, b2, ln[0], ln[1])
    got = _make_block_fn(ln_position, 1e-12, True)(*args)
    want = _xla_mlp_block(*args, ln_position=ln_position, ln_eps=1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_matches_unfused_composition():
    from autognothi_tpu.models.common import dense, gelu, layer_norm

    resid, w1, b1, w2, b2, ln = _setup()
    got = mlp_block(resid, w1, b1, w2, b2, use_pallas=False,
                    ln=ln, ln_position="prologue")
    x = layer_norm(resid, ln[0], ln[1], ln[2])
    want = resid + dense(gelu(dense(x, w1, b1)), w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_gradients_match():
    resid, w1, b1, w2, b2, ln = _setup(t=8)

    def loss_kernel(r_, w1_):
        return jnp.sum(_make_block_fn("epilogue", 1e-12, True)(
            r_, w1_.T, b1, w2.T, b2, ln[0], ln[1]) ** 2)

    def loss_xla(r_, w1_):
        return jnp.sum(_xla_mlp_block(
            r_, w1_.T, b1, w2.T, b2, ln[0], ln[1],
            ln_position="epilogue", ln_eps=1e-12) ** 2)

    g_k = jax.grad(loss_kernel, argnums=(0, 1))(resid, w1)
    g_x = jax.grad(loss_xla, argnums=(0, 1))(resid, w1)
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_vmem_gate_falls_back_for_large_models():
    x_small = jnp.zeros((1, 197, 768), jnp.bfloat16)
    w1_small = jnp.zeros((3072, 768), jnp.bfloat16)
    assert _fits_vmem(x_small, w1_small)
    x_large = jnp.zeros((1, 197, 1024), jnp.bfloat16)
    w1_large = jnp.zeros((4096, 1024), jnp.bfloat16)
    assert not _fits_vmem(x_large, w1_large)


@pytest.mark.parametrize("family", ["vit", "bert"])
def test_full_layer_fused_matches_unfused(family, monkeypatch):
    """Interpret-mode: a whole encoder layer via the fused kernels equals the
    pure-XLA path for both families (incl. the identity-LN explainer case)."""
    import autognothi_tpu.ops.attention_block as ab
    import autognothi_tpu.ops.mlp_block as mb

    # route the pallas calls through the interpreter on CPU — the same env
    # knobs CI uses for the kernel x GSPMD composition tests
    monkeypatch.setenv("AUTOGNOTHI_PALLAS", "2")
    monkeypatch.setenv("AUTOGNOTHI_PALLAS_INTERPRET", "1")
    ab._make_block_fn.cache_clear()
    mb._make_block_fn.cache_clear()

    rng = np.random.RandomState(0)
    if family == "vit":
        from autognothi_tpu.models.vit import (
            VanillaViTConfig, _init_vit_layer, _vit_layer_body,
        )

        cfg = VanillaViTConfig(
            attention_probs_dropout_prob=0.0, explainer_attn_num_layers=1,
            explainer_head_hidden_size=16, explainer_normalize=True,
            hidden_dropout_prob=0.0, hidden_size=32, intermediate_size=64,
            layer_norm_eps=1e-12, num_attention_heads=4, num_hidden_layers=1,
            num_labels=2, img_channels=3, img_px_size=16, img_patch_size=8,
        )
        layer = _init_vit_layer(jax.random.PRNGKey(0), cfg, skip_ln1=False)
        h = jnp.asarray(rng.randn(2, 5, 32), jnp.float32)
        mask = jnp.ones((2, 5), jnp.int32)
        fused = _vit_layer_body(layer, h, mask, cfg, has_ln1=True,
                                deterministic=True, rng=None)
        monkeypatch.setenv("AUTOGNOTHI_PALLAS", "0")
        plain = _vit_layer_body(layer, h, mask, cfg, has_ln1=True,
                                deterministic=True, rng=None)
    else:
        from autognothi_tpu.models.bert import (
            VanillaBertConfig, _bert_layer_body, _init_bert_layer,
        )
        from autognothi_tpu.models.common import additive_mask_bias

        cfg = VanillaBertConfig(
            attention_probs_dropout_prob=0.0, explainer_attn_num_layers=1,
            explainer_head_hidden_size=16, explainer_normalize=True,
            hidden_dropout_prob=0.0, hidden_size=32, intermediate_size=64,
            layer_norm_eps=1e-12, max_position_embeddings=8,
            num_attention_heads=4, num_hidden_layers=1, num_labels=2,
            pad_token_id=0, type_vocab_size=2, vocab_size=50,
        )
        layer = _init_bert_layer(jax.random.PRNGKey(0), cfg, ident_ln1=False)
        h = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
        bias = additive_mask_bias(jnp.ones((2, 8), jnp.int32))
        fused = _bert_layer_body(layer, h, bias, cfg, ident_ln1=False,
                                 deterministic=True, rng=None)
        monkeypatch.setenv("AUTOGNOTHI_PALLAS", "0")
        plain = _bert_layer_body(layer, h, bias, cfg, ident_ln1=False,
                                 deterministic=True, rng=None)

    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=3e-5, rtol=1e-4)


def test_tiled_split_matches_xla(monkeypatch):
    """ViT-L-like shapes route through the inter-dim split and match XLA."""
    import autognothi_tpu.ops.mlp_block as mb

    resid, w1, b1, w2, b2, ln = _setup(t=9, h=32, inter=128)
    # force the split path: budget so small only quarter tiles fit
    full = 2 * 32 * 128 * 4
    monkeypatch.setattr(mb, "_VMEM_BUDGET_BYTES", full // 2)
    orig = mb._pallas_mlp_sepx
    monkeypatch.setattr(
        mb, "_pallas_mlp_sepx",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    mb._make_sepx_fn.cache_clear()

    for ln_position in ("none", "prologue", "epilogue"):
        got = mb.mlp_block(resid, w1, b1, w2, b2, use_pallas=True,
                           ln=ln, ln_position=ln_position)
        want = mb._xla_mlp_block(resid, w1.T, b1, w2.T, b2, ln[0], ln[1],
                                 ln_position=ln_position, ln_eps=1e-12)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
