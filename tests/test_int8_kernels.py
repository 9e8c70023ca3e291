"""W8A8 int8 serving kernels (ops/attention_block._kernel_q,
ops/mlp_block._kernel_q): numerical sanity vs the fp32 XLA reference in
Pallas interpret mode, and quantizer round-trip properties."""

import jax
import jax.numpy as jnp
import numpy as np

from autognothi_tpu.ops.attention_block import attention_block
from autognothi_tpu.ops.mlp_block import mlp_block, quant_cols

RNG = np.random.RandomState(0)
B, T, H, I = 2, 8, 32, 64


def test_quant_cols_roundtrip():
    w = jnp.asarray(RNG.randn(16, 24).astype(np.float32))
    q, s = quant_cols(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 24)
    back = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(back - np.asarray(w)).max()
    # per-column symmetric int8: error bounded by half a quantization step
    assert err <= float(np.asarray(s).max()) * 0.51


def _mlp_args():
    resid = jnp.asarray(RNG.randn(B, T, H).astype(np.float32)) * 0.5
    w1 = jnp.asarray(RNG.randn(I, H).astype(np.float32)) * 0.1
    b1 = jnp.asarray(RNG.randn(I).astype(np.float32)) * 0.1
    w2 = jnp.asarray(RNG.randn(H, I).astype(np.float32)) * 0.1
    b2 = jnp.asarray(RNG.randn(H).astype(np.float32)) * 0.1
    ln = (jnp.ones((H,)), jnp.zeros((H,)), 1e-12)
    return resid, w1, b1, w2, b2, ln


def test_int8_mlp_block_close_to_fp32():
    resid, w1, b1, w2, b2, ln = _mlp_args()
    ref = mlp_block(resid, w1, b1, w2, b2, use_pallas=False,
                    ln=ln, ln_position="prologue")
    q = mlp_block(resid, w1, b1, w2, b2, use_pallas=True, interpret=True,
                  ln=ln, ln_position="prologue", quant="int8")
    rel = float(jnp.max(jnp.abs(ref - q))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.02, rel


def test_int8_attention_block_close_to_fp32():
    resid = jnp.asarray(RNG.randn(B, T, H).astype(np.float32)) * 0.5
    ws = [jnp.asarray(RNG.randn(H, H).astype(np.float32)) * 0.1
          for _ in range(4)]
    bs = [jnp.asarray(RNG.randn(H).astype(np.float32)) * 0.1
          for _ in range(4)]
    weights = (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3])
    mask = jnp.ones((B, T))
    ln = (jnp.ones((H,)), jnp.zeros((H,)), 1e-12)
    for mode in ("mul", "add"):
        m = mask if mode == "mul" else jnp.zeros((B, T))
        ref = attention_block(resid, m, weights, 4, mode, use_pallas=False,
                              ln=ln, ln_position="prologue")
        q = attention_block(resid, m, weights, 4, mode, use_pallas=True,
                            interpret=True, ln=ln, ln_position="prologue",
                            quant="int8")
        rel = float(jnp.max(jnp.abs(ref - q))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 0.02, (mode, rel)


def test_int8_gradients_flow_through_custom_vjp():
    """Backward recomputes in bf16/f32 XLA math — grads must be finite and
    close to the fp32 grads (serving path safety if someone differentiates)."""
    resid, w1, b1, w2, b2, ln = _mlp_args()

    def loss(f):
        return lambda r: jnp.sum(f(r) ** 2)

    f_q = loss(lambda r: mlp_block(r, w1, b1, w2, b2, use_pallas=True,
                                   interpret=True, ln=ln,
                                   ln_position="prologue", quant="int8"))
    f_ref = loss(lambda r: mlp_block(r, w1, b1, w2, b2, use_pallas=False,
                                     ln=ln, ln_position="prologue"))
    g_q = jax.grad(f_q)(resid)
    g_ref = jax.grad(f_ref)(resid)
    assert np.isfinite(np.asarray(g_q)).all()
    rel = float(jnp.max(jnp.abs(g_q - g_ref))) / (
        float(jnp.max(jnp.abs(g_ref))) + 1e-9)
    assert rel < 0.05, rel


def test_int8_tiled_mlp_close_to_fp32():
    """Shapes past the VMEM budget take the inter-dim-split int8 path
    (_kernel_sepx_q) — exercised here by forcing n_tiles via a small budget."""
    import autognothi_tpu.ops.mlp_block as mb

    resid, w1, b1, w2, b2, ln = _mlp_args()
    ref = mlp_block(resid, w1, b1, w2, b2, use_pallas=False,
                    ln=ln, ln_position="epilogue")
    old = mb._VMEM_BUDGET_BYTES
    try:
        # too small for the fused kernel, big enough for 2-way tiles
        mb._VMEM_BUDGET_BYTES = (
            2 * H * (I // 2) + T * (I // 2) * 6 + 3 * T * H * 4 + T * I + 1)
        q = mlp_block(resid, w1, b1, w2, b2, use_pallas=True, interpret=True,
                      ln=ln, ln_position="epilogue", quant="int8")
    finally:
        mb._VMEM_BUDGET_BYTES = old
    rel = float(jnp.max(jnp.abs(ref - q))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.02, rel


def _head_args(h_in=32, inter=64, c=5):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, h_in).astype(np.float32)) * 0.5
    w1 = jnp.asarray(rng.randn(inter, h_in).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.randn(inter).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.randn(inter, inter).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.randn(inter).astype(np.float32)) * 0.1
    w3 = jnp.asarray(rng.randn(c, inter).astype(np.float32)) * 0.1
    b3 = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1
    ln_w = jnp.ones((h_in,)) + 0.1
    ln_b = jnp.zeros((h_in,)) - 0.05
    return x, w1, b1, w2, b2, w3, b3, ln_w, ln_b


def test_int8_head_block_close_to_fp32():
    """The fused explainer-head kernel (LN + d1 + gelu + d2 + gelu + d3,
    int8 weights) matches the fp32 math, with and without the leading LN."""
    from autognothi_tpu.ops.head_block import explainer_head_block

    x, w1, b1, w2, b2, w3, b3, ln_w, ln_b = _head_args()
    for ln in ((ln_w, ln_b), (None, None)):
        ref = explainer_head_block(x, w1, b1, w2, b2, w3, b3, ln[0], ln[1],
                                   1e-5, use_pallas=False)
        q = explainer_head_block(x, w1, b1, w2, b2, w3, b3, ln[0], ln[1],
                                 1e-5, use_pallas=True, quant="int8",
                                 interpret=True)
        rel = float(jnp.max(jnp.abs(ref - q))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 0.03, (ln[0] is not None, rel)


def test_int8_head_block_nondivisible_tokens():
    """Token counts that don't divide the tile (e.g. T=197-like odd sizes):
    out-of-range rows are masked on store, real rows match."""
    from autognothi_tpu.ops import head_block as hb

    x, w1, b1, w2, b2, w3, b3, ln_w, ln_b = _head_args()
    x = jnp.concatenate([x] * 9, axis=1)[:, :37]  # T=37, tile 32 -> 2 tiles
    ref = hb.explainer_head_block(x, w1, b1, w2, b2, w3, b3, ln_w, ln_b,
                                  1e-5, use_pallas=False)
    q = hb.explainer_head_block(x, w1, b1, w2, b2, w3, b3, ln_w, ln_b,
                                1e-5, use_pallas=True, quant="int8",
                                interpret=True)
    rel = float(jnp.max(jnp.abs(ref - q))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.03, rel


def test_int8_head_block_gradients():
    from autognothi_tpu.ops.head_block import explainer_head_block

    x, w1, b1, w2, b2, w3, b3, ln_w, ln_b = _head_args()

    def loss_q(xx):
        return jnp.sum(explainer_head_block(
            xx, w1, b1, w2, b2, w3, b3, ln_w, ln_b, 1e-5,
            use_pallas=True, quant="int8", interpret=True) ** 2)

    def loss_ref(xx):
        return jnp.sum(explainer_head_block(
            xx, w1, b1, w2, b2, w3, b3, ln_w, ln_b, 1e-5,
            use_pallas=False) ** 2)

    g_q = jax.grad(loss_q)(x)
    g_ref = jax.grad(loss_ref)(x)
    assert np.isfinite(np.asarray(g_q)).all()
    rel = float(jnp.max(jnp.abs(g_q - g_ref))) / (
        float(jnp.max(jnp.abs(g_ref))) + 1e-9)
    assert rel < 0.05, rel


def test_grouped_blocks_match_ungrouped():
    """group>1 (images per grid step, the narrow-ladder amortization) is
    numerically identical to the per-image grid."""
    rng = np.random.RandomState(11)
    b, t, h = 8, 6, 32
    resid = jnp.asarray(rng.randn(b, t, h).astype(np.float32)) * 0.5
    # non-uniform masks so cross-image leakage would be caught
    mask = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    ws = [jnp.asarray(rng.randn(h, h).astype(np.float32)) * 0.1
          for _ in range(4)]
    bs = [jnp.asarray(rng.randn(h).astype(np.float32)) * 0.1
          for _ in range(4)]
    weights = (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3])
    ln = (jnp.ones((h,)), jnp.zeros((h,)), 1e-12)
    for quant in ("none", "int8"):
        ref = attention_block(resid, mask, weights, 4, "mul",
                              use_pallas=True, interpret=True, ln=ln,
                              ln_position="prologue", quant=quant)
        grp = attention_block(resid, mask, weights, 4, "mul",
                              use_pallas=True, interpret=True, ln=ln,
                              ln_position="prologue", quant=quant, group=4)
        np.testing.assert_allclose(np.asarray(grp), np.asarray(ref),
                                   atol=1e-5, err_msg=f"attn quant={quant}")

    w1 = jnp.asarray(rng.randn(2 * h, h).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.randn(2 * h).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.randn(h, 2 * h).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.randn(h).astype(np.float32)) * 0.1
    for quant in ("none", "int8"):
        ref = mlp_block(resid, w1, b1, w2, b2, use_pallas=True,
                        interpret=True, ln=ln, ln_position="prologue",
                        quant=quant)
        grp = mlp_block(resid, w1, b1, w2, b2, use_pallas=True,
                        interpret=True, ln=ln, ln_position="prologue",
                        quant=quant, group=4)
        np.testing.assert_allclose(np.asarray(grp), np.asarray(ref),
                                   atol=1e-5, err_msg=f"mlp quant={quant}")


def test_ladder_block_matches_xla():
    """The fused LTT ladder kernel (map + narrow attention via the
    head-mask trick + MLP, both branches in one launch) equals the XLA
    reference for both mask modes and norm orders."""
    from autognothi_tpu.ops.ladder_block import ladder_block

    rng = np.random.RandomState(5)
    b, t, hidden, s_h, heads = 3, 7, 32, 16, 4

    def mk_branch():
        return {
            "map_w": jnp.asarray(rng.randn(s_h, hidden), jnp.float32) * 0.1,
            "map_b": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "ln1_w": jnp.ones((s_h,)) + 0.1, "ln1_b": jnp.zeros((s_h,)),
            "wq": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bq": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "wk": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bk": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "wv": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bv": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "wo": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bo": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "ln2_w": jnp.ones((s_h,)) - 0.05, "ln2_b": jnp.zeros((s_h,)),
            "w1": jnp.asarray(rng.randn(2 * s_h, s_h), jnp.float32) * 0.2,
            "b1": jnp.asarray(rng.randn(2 * s_h), jnp.float32) * 0.1,
            "w2": jnp.asarray(rng.randn(s_h, 2 * s_h), jnp.float32) * 0.2,
            "b2": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
        }

    h = jnp.asarray(rng.randn(b, t, hidden), jnp.float32) * 0.5
    sides = [jnp.asarray(rng.randn(b, t, s_h), jnp.float32) * 0.5
             for _ in range(2)]
    branches = [mk_branch(), mk_branch()]
    mask_mul = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    mask_add = jnp.where(mask_mul > 0, 0.0, -1e9)
    for mode, mask, pre in (("mul", mask_mul, True), ("add", mask_add, False)):
        ref = ladder_block(h, sides, mask, branches, heads, mode, pre,
                           1e-12, use_pallas=False)
        out = ladder_block(h, sides, mask, branches, heads, mode, pre,
                           1e-12, use_pallas=True, interpret=True)
        for s in range(2):
            np.testing.assert_allclose(
                np.asarray(out[s]), np.asarray(ref[s]), atol=2e-5,
                err_msg=f"mode={mode} branch={s}")


def test_ladder_block_gradients_finite():
    from autognothi_tpu.ops.ladder_block import ladder_block

    rng = np.random.RandomState(6)
    b, t, hidden, s_h = 2, 5, 16, 8
    br = {
        "map_w": jnp.asarray(rng.randn(s_h, hidden), jnp.float32) * 0.1,
        "map_b": jnp.zeros((s_h,)),
        "ln1_w": jnp.ones((s_h,)), "ln1_b": jnp.zeros((s_h,)),
        "wq": jnp.eye(s_h) * 0.3, "bq": jnp.zeros((s_h,)),
        "wk": jnp.eye(s_h) * 0.3, "bk": jnp.zeros((s_h,)),
        "wv": jnp.eye(s_h) * 0.3, "bv": jnp.zeros((s_h,)),
        "wo": jnp.eye(s_h) * 0.3, "bo": jnp.zeros((s_h,)),
        "ln2_w": jnp.ones((s_h,)), "ln2_b": jnp.zeros((s_h,)),
        "w1": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
        "b1": jnp.zeros((s_h,)),
        "w2": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
        "b2": jnp.zeros((s_h,)),
    }
    h = jnp.asarray(rng.randn(b, t, hidden), jnp.float32)
    side = jnp.asarray(rng.randn(b, t, s_h), jnp.float32)
    mask = jnp.ones((b, t))

    def loss(hh):
        (out,) = ladder_block(hh, [side], mask, [br], 2, "mul", True,
                              1e-12, use_pallas=True, interpret=True)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(h)
    assert np.isfinite(np.asarray(g)).all()


def test_mlp_ladder_block_matches_xla():
    """The trunk-MLP + ladder fusion equals the XLA reference."""
    from autognothi_tpu.ops.ladder_block import mlp_ladder_block

    rng = np.random.RandomState(9)
    b, t, hidden, inter, s_h, heads = 2, 6, 32, 64, 16, 4

    def mk_branch():
        return {
            "map_w": jnp.asarray(rng.randn(s_h, hidden), jnp.float32) * 0.1,
            "map_b": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "ln1_w": jnp.ones((s_h,)) + 0.1, "ln1_b": jnp.zeros((s_h,)),
            "wq": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bq": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "wk": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bk": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "wv": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bv": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "wo": jnp.asarray(rng.randn(s_h, s_h), jnp.float32) * 0.2,
            "bo": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
            "ln2_w": jnp.ones((s_h,)) - 0.05, "ln2_b": jnp.zeros((s_h,)),
            "w1": jnp.asarray(rng.randn(2 * s_h, s_h), jnp.float32) * 0.2,
            "b1": jnp.asarray(rng.randn(2 * s_h), jnp.float32) * 0.1,
            "w2": jnp.asarray(rng.randn(s_h, 2 * s_h), jnp.float32) * 0.2,
            "b2": jnp.asarray(rng.randn(s_h), jnp.float32) * 0.1,
        }

    trunk = {
        "w1": jnp.asarray(rng.randn(inter, hidden), jnp.float32) * 0.1,
        "b1": jnp.asarray(rng.randn(inter), jnp.float32) * 0.1,
        "w2": jnp.asarray(rng.randn(hidden, inter), jnp.float32) * 0.1,
        "b2": jnp.asarray(rng.randn(hidden), jnp.float32) * 0.1,
        "ln_w": jnp.ones((hidden,)) + 0.1, "ln_b": jnp.zeros((hidden,)),
    }
    h_attn = jnp.asarray(rng.randn(b, t, hidden), jnp.float32) * 0.5
    sides = [jnp.asarray(rng.randn(b, t, s_h), jnp.float32) * 0.5
             for _ in range(2)]
    branches = [mk_branch(), mk_branch()]
    mask = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))

    ref = mlp_ladder_block(h_attn, sides, mask, trunk, branches, heads,
                           "mul", 1e-12, use_pallas=False)
    out = mlp_ladder_block(h_attn, sides, mask, trunk, branches, heads,
                           "mul", 1e-12, use_pallas=True, interpret=True)
    # trunk MLP runs W8A8 in the kernel vs bf16 in the reference: rel tol
    rel = float(jnp.max(jnp.abs(out[0] - ref[0]))) / float(
        jnp.max(jnp.abs(ref[0])))
    assert rel < 0.02, rel
    for s in range(2):
        rel = float(jnp.max(jnp.abs(out[1 + s] - ref[1 + s]))) / float(
            jnp.max(jnp.abs(ref[1 + s])))
        assert rel < 0.05, (s, rel)


def test_ladder_block_stacked_matches_loop(monkeypatch):
    """The head-stacked attention math (one big scores dot + one big PV
    dot, T padded to the sublane tile) equals the per-head-loop kernel and
    the XLA reference — including an unaligned T."""
    from autognothi_tpu.ops import ladder_block as lb

    rng = np.random.RandomState(11)
    b, t, hidden, s_h, heads = 2, 11, 32, 16, 4

    def mk_branch():
        def w(*s):
            return jnp.asarray(rng.randn(*s), jnp.float32) * 0.15
        return {
            "map_w": w(s_h, hidden), "map_b": w(s_h),
            "ln1_w": jnp.ones((s_h,)), "ln1_b": jnp.zeros((s_h,)),
            "wq": w(s_h, s_h), "bq": w(s_h), "wk": w(s_h, s_h),
            "bk": w(s_h), "wv": w(s_h, s_h), "bv": w(s_h),
            "wo": w(s_h, s_h), "bo": w(s_h),
            "ln2_w": jnp.ones((s_h,)), "ln2_b": jnp.zeros((s_h,)),
            "w1": w(2 * s_h, s_h), "b1": w(2 * s_h),
            "w2": w(s_h, 2 * s_h), "b2": w(s_h),
        }

    h = jnp.asarray(rng.randn(b, t, hidden), jnp.float32) * 0.5
    sides = [jnp.asarray(rng.randn(b, t, s_h), jnp.float32) * 0.5]
    branches = [mk_branch()]
    mask_mul = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    mask_add = jnp.where(mask_mul > 0, 0.0, -1e9)
    for mode, mask, pre in (("mul", mask_mul, True), ("add", mask_add, False)):
        ref = lb.ladder_block(h, sides, mask, branches, heads, mode, pre,
                              1e-12, use_pallas=False)
        outs = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("AUTOGNOTHI_LADDER_STACKED", flag)
            outs[flag] = lb.ladder_block(h, sides, mask, branches, heads,
                                         mode, pre, 1e-12, use_pallas=True,
                                         interpret=True)
        for flag in ("0", "1"):
            np.testing.assert_allclose(
                np.asarray(outs[flag][0]), np.asarray(ref[0]), atol=2e-5,
                err_msg=f"mode={mode} stacked={flag}")


def test_ladder_attention_matches_xla():
    """The standalone masked-attention-core kernel (ladder_attention)
    equals batched XLA attention for both mask modes, and its custom_vjp
    backward is finite."""
    from autognothi_tpu.ops.ladder_block import ladder_attention

    rng = np.random.RandomState(12)
    b, t, s_h, heads = 2, 13, 16, 4
    qkvs = [tuple(jnp.asarray(rng.randn(b, t, s_h), jnp.float32)
                  for _ in range(3)) for _ in range(2)]
    mask_mul = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    mask_add = jnp.where(mask_mul > 0, 0.0, -1e9)
    for mode, mask in (("mul", mask_mul), ("add", mask_add)):
        ref = ladder_attention(qkvs, mask, heads, mode, use_pallas=False)
        out = ladder_attention(qkvs, mask, heads, mode, use_pallas=True,
                               interpret=True)
        for s in range(2):
            np.testing.assert_allclose(
                np.asarray(out[s]), np.asarray(ref[s]), atol=1e-5,
                err_msg=f"mode={mode} branch={s}")

    g = jax.grad(lambda q: jnp.sum(ladder_attention(
        [(q, qkvs[0][1], qkvs[0][2])], mask_mul, heads, "mul",
        use_pallas=True, interpret=True)[0] ** 2))(qkvs[0][0])
    assert np.isfinite(np.asarray(g)).all()
