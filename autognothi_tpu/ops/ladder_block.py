"""Pallas TPU kernel: one FULL LTT ladder step fused — for every branch,
the 768->96 map dense + gelu, the side residual add, and the complete
narrow side layer (LN, QKV, per-head masked attention, out-proj, MLP) in
ONE kernel per trunk layer, with the trunk hidden read once.

Why: the 96-dim ladders are the dominant non-trunk cost of the LTT final
(r3 breakdown: ~90-107 us/img PER BRANCH of the 460 us total at B=256,
running at ~13 TF/s through the generic narrow-width kernels).  Two causes,
both fixed here:

1. head_dim = 8 lane slices: the generic attention kernel's per-head
   q[:, h*8:(h+1)*8] slices make K=8 / N=8 dots (1/16 MXU utilization and
   Mosaic-hostile layouts).  This kernel uses a HEAD-MASK trick instead:
   with m_h the 0/1 lane mask of head h's 8 columns,
       (q * m_h) @ k^T  ==  q_h @ k_h^T      (other columns contribute 0)
       p @ (v * m_h)    ==  concat-slot of p @ v_h
   so scores and PV run as 12 full-width K=96 dots at full MXU rate, and
   ctx = sum_h p_h @ (v * m_h) assembles the concat without lane slicing.
2. kernel-launch / HBM round trips: map-dense (XLA) + attention kernel +
   MLP kernel per branch per layer -> ONE launch; the <T, 768> trunk
   hidden is read once for BOTH branches.

Matches _vit_layer_body pre-norm semantics (multiplicative score mask, the
reference ViT quirk) and _bert_layer_body post-norm (additive mask).
Gradients: custom_vjp over the identical XLA math (the fused-kernel
convention).  Parity: /root/reference/models/ltt_vit.py:343-440 (side
ladder update rule side <- Layer(side + gelu(Map(h)))).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_block import _ln32, interpret_default
from .mlp_block import _gelu_exact

# per-branch weight tuple layout (all pre-transposed to (in, out)):
N_BRANCH_ARGS = 18  # map_w, map_b, ln1_w, ln1_b, wq, bq, wk, bk, wv, bv,
# wo, bo, ln2_w, ln2_b, w1, b1, w2, b2


def _branch_math(h, side, mask_row, args, *, n_heads: int, mode: str,
                 pre_norm: bool, ln_eps: float, gelu):
    """One branch's ladder update (shared by kernel and XLA reference;
    `gelu` is injected: in-kernel A&S erf vs jax.nn.gelu outside)."""
    (map_w, map_b, ln1_w, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
     ln2_w, ln2_b, w1, b1, w2, b2) = args

    def dot(a, w, b):
        y = jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b.astype(jnp.float32)
        return y.astype(a.dtype)

    mapped = jax.lax.dot_general(
        h, map_w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + map_b.astype(jnp.float32)
    x = side + gelu(mapped).astype(side.dtype)

    a = _ln32(x, ln1_w, ln1_b, ln_eps) if pre_norm else x
    q, k, v = dot(a, wq, bq), dot(a, wk, bk), dot(a, wv, bv)

    s_hidden = q.shape[-1]
    d = s_hidden // n_heads
    scale = 1.0 / math.sqrt(d)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_hidden), 1)
    ctx = jnp.zeros(q.shape, jnp.float32)
    for head in range(n_heads):
        m_h = (lane // d == head).astype(q.dtype)  # <1, s_hidden>
        scores = jax.lax.dot_general(
            (q * m_h), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # <T, T> == q_h @ k_h^T
        if mode == "add":
            scores = scores + mask_row[None, :]
        else:
            scores = scores * mask_row[None, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = ctx + jax.lax.dot_general(
            probs, v * m_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ctx = ctx.astype(x.dtype)

    attn_out = dot(ctx, wo, bo)
    x = x + attn_out
    if pre_norm:
        y = _ln32(x, ln2_w, ln2_b, ln_eps)
    else:
        x = _ln32(x, ln1_w, ln1_b, ln_eps)
        y = x
    inter = gelu(jax.lax.dot_general(
        y, w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)).astype(x.dtype)
    mlp_out = dot(inter, w2, b2)
    out = x + mlp_out
    if not pre_norm:
        out = _ln32(out, ln2_w, ln2_b, ln_eps)
    return out


def _xla_ladder(h, mask_row, *flat, n_branches: int, n_heads: int,
                mode: str, pre_norm: bool, ln_eps: float):
    """Batched XLA reference (vjp target).  flat = sides + branch args."""
    sides = flat[:n_branches]
    outs = []
    for s in range(n_branches):
        args = flat[n_branches + s * N_BRANCH_ARGS:
                    n_branches + (s + 1) * N_BRANCH_ARGS]

        def one(hh, ss, mm):
            return _branch_math(
                hh, ss, mm, args, n_heads=n_heads, mode=mode,
                pre_norm=pre_norm, ln_eps=ln_eps,
                gelu=lambda x: jax.nn.gelu(x.astype(jnp.float32),
                                           approximate=False),
            )

        outs.append(jax.vmap(one)(h, sides[s], mask_row))
    return tuple(outs)


def _kernel(mask_ref, h_ref, *refs, n_branches: int, n_heads: int,
            mode: str, pre_norm: bool, ln_eps: float):
    side_refs = refs[:n_branches]
    out_refs = refs[-n_branches:]
    h = h_ref[0]  # <T, 768>
    mask_row = mask_ref[0, 0]
    for s in range(n_branches):
        args = tuple(
            # vectors were lifted to (1, d) blocks; matrices are (in, out)
            # with in > 1 for every ladder weight
            r[0] if r.shape[0] == 1 else r[...]
            for r in refs[n_branches + s * N_BRANCH_ARGS:
                          n_branches + (s + 1) * N_BRANCH_ARGS]
        )
        out = _branch_math(
            h, side_refs[s][0], mask_row, args, n_heads=n_heads, mode=mode,
            pre_norm=pre_norm, ln_eps=ln_eps, gelu=_gelu_exact,
        )
        out_refs[s][0] = out.astype(out_refs[s].dtype)


def _pallas_ladder(h, mask_row, *flat, n_branches: int, n_heads: int,
                   mode: str, pre_norm: bool, ln_eps: float,
                   interpret: bool):
    b, t, hidden = h.shape
    s_hidden = flat[0].shape[-1]
    mask3 = mask_row.astype(jnp.float32)[:, None, :]

    h_spec = pl.BlockSpec((1, t, hidden), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    side_spec = pl.BlockSpec((1, t, s_hidden), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def const(x):
        shape = x.shape
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    sides = flat[:n_branches]
    weights = flat[n_branches:]
    # biases / LN vectors arrive 1-D; lift to (1, d) blocks
    weights = tuple(w if w.ndim == 2 else w[None] for w in weights)

    kernel = functools.partial(
        _kernel, n_branches=n_branches, n_heads=n_heads, mode=mode,
        pre_norm=pre_norm, ln_eps=ln_eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            h_spec,
            *([side_spec] * n_branches),
            *[const(w) for w in weights],
        ],
        out_specs=[side_spec] * n_branches,
        out_shape=[jax.ShapeDtypeStruct((b, t, s_hidden), sides[0].dtype)
                   for _ in range(n_branches)],
        interpret=interpret,
    )(mask3, h, *sides, *weights)


@functools.lru_cache(maxsize=None)
def _make_ladder_fn(n_branches: int, n_heads: int, mode: str, pre_norm: bool,
                    ln_eps: float, interpret: bool):
    xla = functools.partial(_xla_ladder, n_branches=n_branches,
                            n_heads=n_heads, mode=mode, pre_norm=pre_norm,
                            ln_eps=ln_eps)

    @jax.custom_vjp
    def ladder(h, mask_row, *flat):
        return _pallas_ladder(h, mask_row, *flat, n_branches=n_branches,
                              n_heads=n_heads, mode=mode, pre_norm=pre_norm,
                              ln_eps=ln_eps, interpret=interpret)

    def fwd(*args):
        return ladder(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(lambda *a: xla(*a), *args)
        return vjp(g)

    ladder.defvjp(fwd, bwd)
    return ladder


# ---------------------------------------------------------------------
# trunk-MLP + ladder fusion: one kernel per layer computes the trunk's
# int8 MLP block (pre-norm, residual) AND every ladder branch from the
# fresh layer output — the <B, T, 768> hidden never round-trips to HBM
# between the trunk MLP and the ladders, and one kernel launch replaces
# two (serving path; r3 breakdown: ladders ~128 us/img of a 381 us
# forward with ~16 us of pure h-DMA re-reads + per-launch overhead).


def _xla_mlp_ladder(h_attn, mask_row, w1t, b1, w2t, b2, ln_w, ln_b, *flat,
                    n_branches: int, n_heads: int, mode: str,
                    ln_eps: float):
    """Batched XLA reference: trunk pre-norm MLP then the ladder update."""
    from .mlp_block import _xla_mlp_block

    h = _xla_mlp_block(h_attn, w1t, b1, w2t, b2, ln_w, ln_b,
                       ln_position="prologue", ln_eps=ln_eps)
    outs = _xla_ladder(h, mask_row, *flat, n_branches=n_branches,
                       n_heads=n_heads, mode=mode, pre_norm=True,
                       ln_eps=ln_eps)
    return (h, *outs)


def _kernel_mlp_ladder_q(mask_ref, h_ref, w1_ref, s1_ref, b1_ref,
                         w2_ref, s2_ref, b2_ref, lnw_ref, lnb_ref, *refs,
                         n_branches: int, n_heads: int, mode: str,
                         ln_eps: float):
    from .mlp_block import _quant_rows

    side_refs = refs[:n_branches]
    h_out_ref = refs[-(n_branches + 1)]
    out_refs = refs[-n_branches:]

    resid = h_ref[0]  # <T, 768> attention-block output
    x = _ln32(resid, lnw_ref[0], lnb_ref[0], ln_eps)
    xq, xs = _quant_rows(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    inter = _gelu_exact(acc.astype(jnp.float32) * xs * s1_ref[0]
                        + b1_ref[0].astype(jnp.float32))
    iq, is_ = _quant_rows(inter)
    acc2 = jax.lax.dot_general(
        iq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc2.astype(jnp.float32) * is_ * s2_ref[0] \
        + b2_ref[0].astype(jnp.float32)
    h = resid + out.astype(resid.dtype)  # fresh trunk layer output
    h_out_ref[0] = h.astype(h_out_ref.dtype)

    mask_row = mask_ref[0, 0]
    for s in range(n_branches):
        args = tuple(
            r[0] if r.shape[0] == 1 else r[...]
            for r in refs[n_branches + s * N_BRANCH_ARGS:
                          n_branches + (s + 1) * N_BRANCH_ARGS]
        )
        upd = _branch_math(
            h, side_refs[s][0], mask_row, args, n_heads=n_heads, mode=mode,
            pre_norm=True, ln_eps=ln_eps, gelu=_gelu_exact,
        )
        out_refs[s][0] = upd.astype(out_refs[s].dtype)


def _pallas_mlp_ladder_q(h_attn, mask_row, w1t, b1, w2t, b2, ln_w, ln_b,
                         *flat, n_branches: int, n_heads: int, mode: str,
                         ln_eps: float, interpret: bool):
    from .mlp_block import quant_cols

    b, t, hidden = h_attn.shape
    s_hidden = flat[0].shape[-1]
    mask3 = mask_row.astype(jnp.float32)[:, None, :]
    w1_q, s1 = quant_cols(w1t)
    w2_q, s2 = quant_cols(w2t)

    h_spec = pl.BlockSpec((1, t, hidden), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    side_spec = pl.BlockSpec((1, t, s_hidden), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def const(x):
        shape = x.shape
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    sides = flat[:n_branches]
    weights = tuple(w if w.ndim == 2 else w[None] for w in flat[n_branches:])
    trunk = (w1_q, s1, b1[None], w2_q, s2, b2[None], ln_w[None], ln_b[None])

    kernel = functools.partial(
        _kernel_mlp_ladder_q, n_branches=n_branches, n_heads=n_heads,
        mode=mode, ln_eps=ln_eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            h_spec,
            *[const(w) for w in trunk],
            *([side_spec] * n_branches),
            *[const(w) for w in weights],
        ],
        out_specs=[h_spec] + [side_spec] * n_branches,
        out_shape=[jax.ShapeDtypeStruct((b, t, hidden), h_attn.dtype)]
        + [jax.ShapeDtypeStruct((b, t, s_hidden), sides[0].dtype)
           for _ in range(n_branches)],
        interpret=interpret,
    )(mask3, h_attn, *trunk, *sides, *weights)


@functools.lru_cache(maxsize=None)
def _make_mlp_ladder_fn(n_branches: int, n_heads: int, mode: str,
                        ln_eps: float, interpret: bool):
    xla = functools.partial(_xla_mlp_ladder, n_branches=n_branches,
                            n_heads=n_heads, mode=mode, ln_eps=ln_eps)

    @jax.custom_vjp
    def fused(h_attn, mask_row, w1t, b1, w2t, b2, ln_w, ln_b, *flat):
        return _pallas_mlp_ladder_q(
            h_attn, mask_row, w1t, b1, w2t, b2, ln_w, ln_b, *flat,
            n_branches=n_branches, n_heads=n_heads, mode=mode,
            ln_eps=ln_eps, interpret=interpret)

    def fwd(*args):
        return fused(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(lambda *a: xla(*a), *args)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def mlp_ladder_fits_vmem(hidden: int, inter: int, t: int,
                         s_hidden: int, n_branches: int) -> bool:
    weights = 2 * hidden * inter  # int8 trunk MLP
    weights += n_branches * 2 * (hidden * s_hidden + 4 * s_hidden * s_hidden
                                 + 2 * s_hidden * 4 * s_hidden)
    acts = (t * inter * (4 + 4 + 1)       # int32 acc + f32 inter + int8
            + 4 * t * hidden * 2          # h blocks in/out + x copies
            + t * hidden * 4              # f32 LN copy
            + n_branches * 4 * t * s_hidden * 4
            + t * t * 4)                  # one scores tile at a time
    return weights + acts < 15 * 1024 * 1024


def mlp_ladder_block(
    h_attn: jax.Array,          # <B, T, hidden> trunk attention-block out
    sides: Sequence[jax.Array],
    mask_row: jax.Array,
    trunk_mlp: dict,            # w1/b1/w2/b2 (torch layout) + ln_w/ln_b
    branch_weights: Sequence[dict],
    n_heads: int,
    mode: str,
    ln_eps: float,
    use_pallas: bool,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """-> (h_next, *updated_sides): trunk pre-norm int8 MLP block fused
    with the full ladder step (W8A8 trunk dots; ladders bf16)."""
    interpret = interpret or interpret_default()
    dtype = h_attn.dtype
    flat: list = [s for s in sides]
    for w in branch_weights:
        flat.extend(a.astype(dtype) for a in _flatten_branch(w))
    trunk = (trunk_mlp["w1"].T.astype(dtype), trunk_mlp["b1"],
             trunk_mlp["w2"].T.astype(dtype), trunk_mlp["b2"],
             trunk_mlp["ln_w"], trunk_mlp["ln_b"])
    if use_pallas:
        return _make_mlp_ladder_fn(len(sides), n_heads, mode,
                                   float(ln_eps), interpret)(
            h_attn, mask_row, *trunk, *flat)
    return _xla_mlp_ladder(h_attn, mask_row, *trunk, *flat,
                           n_branches=len(sides), n_heads=n_heads,
                           mode=mode, ln_eps=float(ln_eps))


def _flatten_branch(w: dict) -> Tuple[jax.Array, ...]:
    """Per-branch dict (torch-layout weights) -> the N_BRANCH_ARGS tuple in
    (in, out) layout.  Keys: map_w/map_b + the _vit/_bert layer names."""
    return (
        w["map_w"].T, w["map_b"], w["ln1_w"], w["ln1_b"],
        w["wq"].T, w["bq"], w["wk"].T, w["bk"], w["wv"].T, w["bv"],
        w["wo"].T, w["bo"], w["ln2_w"], w["ln2_b"],
        w["w1"].T, w["b1"], w["w2"].T, w["b2"],
    )


def ladder_block(
    h: jax.Array,               # <B, T, hidden> trunk layer output
    sides: Sequence[jax.Array],  # per-branch <B, T, s_hidden>
    mask_row: jax.Array,        # <B, T> (mul 0/1 or additive bias values)
    branch_weights: Sequence[dict],
    n_heads: int,
    mode: str,                  # "mul" (ViT quirk) | "add" (BERT)
    pre_norm: bool,             # True: ViT pre-norm; False: BERT post-norm
    ln_eps: float,
    use_pallas: bool,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """-> tuple of updated sides: SideLayer_b(side_b + gelu(Map_b(h)))."""
    interpret = interpret or interpret_default()
    dtype = h.dtype
    flat: list = [s for s in sides]
    for w in branch_weights:
        flat.extend(a.astype(dtype) if a.dtype != jnp.int32 else a
                    for a in _flatten_branch(w))
    if use_pallas:
        return _make_ladder_fn(len(sides), n_heads, mode, pre_norm,
                               float(ln_eps), interpret)(h, mask_row, *flat)
    return _xla_ladder(h, mask_row, *flat, n_branches=len(sides),
                       n_heads=n_heads, mode=mode, pre_norm=pre_norm,
                       ln_eps=float(ln_eps))
