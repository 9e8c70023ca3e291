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
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_block import (_VMEM_BUDGET_BYTES, _ln32,
                              interpret_default)
from .mlp_block import _gelu_exact

# per-branch weight tuple layout (all pre-transposed to (in, out)):
N_BRANCH_ARGS = 18  # map_w, map_b, ln1_w, ln1_b, wq, bq, wk, bk, wv, bv,
# wo, bo, ln2_w, ln2_b, w1, b1, w2, b2


def stack_branch_params(p, branch: int, n_layers: int, dtype):
    """Stack one side branch's ladder params along a leading layer axis
    (the lax.scan layout both LTT models consume); shared so the ViT and
    BERT encoders cannot drift apart."""
    maps = {
        "weight": jnp.stack([
            p[f"encoder.s_attn_maps.{branch}_{i}.weight"]
            for i in range(n_layers)
        ]).astype(dtype),
        "bias": jnp.stack([
            p[f"encoder.s_attn_maps.{branch}_{i}.bias"]
            for i in range(n_layers)
        ]).astype(dtype),
    }
    head = f"encoder.s_attn_layers.{branch}_0."
    suffixes = [k[len(head):] for k in p if k.startswith(head)]
    layers = {
        suffix: jnp.stack([
            p[f"encoder.s_attn_layers.{branch}_{i}.{suffix}"]
            for i in range(n_layers)
        ]).astype(dtype)
        for suffix in suffixes
    }
    return maps, layers



def _stacked_default() -> bool:
    """Head-stacked attention math (one big scores dot + one big PV dot
    instead of 2*n_heads chained narrow dots).  Opt-out knob."""
    return os.environ.get("AUTOGNOTHI_LADDER_STACKED", "1") == "1"


def _ctx_stacked(q, k, v, mask_row, *, n_heads: int, mode: str,
                 scale: float):
    """All-heads masked attention as TWO large dots.

    Stack (q * m_h) for every head along the sublane axis (T padded to the
    8-row tile boundary so the concat/slices stay Mosaic-aligned):
        scores_stack = Q_stack @ k^T        <n_heads*Tp, T>   (one dot)
        pv           = softmax(scores) @ v  <n_heads*Tp, s>   (one dot)
        ctx          = sum_h pv[h] * m_h    (disjoint lane masks assemble
                                             the head-concat)
    (p_h @ v) * m_h == p_h @ (v * m_h): masking the output lanes equals
    masking v's lanes.  Replaces 2*n_heads chained K=s/n_heads-structured
    dots with 2 dots at full M — the chained-dot serialization was the
    measured ladder overhead (BASELINE.md r3: 128 us/img vs ~60-70 floor).
    """
    t, s_hidden = q.shape
    d = s_hidden // n_heads
    tp = -(-t // 8) * 8  # sublane-aligned stacking pitch
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_hidden), 1)
    if tp != t:
        qp = jnp.concatenate(
            [q, jnp.zeros((tp - t, s_hidden), q.dtype)], axis=0)
    else:
        qp = q
    q_stack = jnp.concatenate(
        [qp * (lane // d == h).astype(q.dtype) for h in range(n_heads)],
        axis=0)  # <n_heads*tp, s_hidden>
    # probe-only cost-decomposition knob (playground/bench_ladder_ablate.py)
    ablate = os.environ.get("AUTOGNOTHI_LADDER_ABLATE", "")
    if "noqk" in ablate:
        scores = q_stack[:, :1] * jnp.ones((1, t), q.dtype)
        scores = scores.astype(jnp.float32)
    else:
        scores = jax.lax.dot_general(
            q_stack, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # row block h == q_h @ k_h^T
    if mode == "add":
        scores = scores + mask_row[None, :]
    else:
        scores = scores * mask_row[None, :]
    if "nosm" in ablate:
        probs = (scores * (1.0 / t)).astype(v.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if "nopv" in ablate:
        pv = probs[:, :s_hidden].astype(jnp.float32)
    else:
        pv = jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ctx = jnp.zeros((t, s_hidden), jnp.float32)
    for h in range(n_heads):
        m_h = (lane // d == h).astype(jnp.float32)
        ctx = ctx + pv[h * tp:h * tp + t] * m_h
    return ctx


def _xla_ctx(q, k, v, mask_row, *, n_heads: int, mode: str, scale: float):
    """Batched XLA reference for the masked ladder attention core
    (vjp target of ladder_attention): <B, T, S> -> <B, T, S>."""
    b, t, s_hidden = q.shape
    d = s_hidden // n_heads

    def heads(x):  # <B, T, S> -> <B, H, T, d>
        return x.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    m = mask_row[:, None, None, :]
    scores = scores + m if mode == "add" else scores * m
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", probs, vh,
                     preferred_element_type=jnp.float32)
    return ctx.transpose(0, 2, 1, 3).reshape(b, t, s_hidden).astype(q.dtype)


def _attn_kernel(mask_ref, *refs, n_branches: int, n_heads: int, mode: str):
    mask_row = mask_ref[0, 0]
    for s in range(n_branches):
        q, k, v = (refs[3 * s][0], refs[3 * s + 1][0], refs[3 * s + 2][0])
        d = q.shape[-1] // n_heads
        ctx = _ctx_stacked(q, k, v, mask_row, n_heads=n_heads, mode=mode,
                           scale=1.0 / math.sqrt(d))
        out_ref = refs[3 * n_branches + s]
        out_ref[0] = ctx.astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_attn_fn(n_branches: int, n_heads: int, mode: str, interpret: bool):
    @jax.custom_vjp
    def attn(mask_row, *qkv_flat):
        b, t, s_hidden = qkv_flat[0].shape
        spec = pl.BlockSpec((1, t, s_hidden), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        kernel = functools.partial(_attn_kernel, n_branches=n_branches,
                                   n_heads=n_heads, mode=mode)
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [spec] * (3 * n_branches),
            out_specs=[spec] * n_branches,
            out_shape=[jax.ShapeDtypeStruct((b, t, s_hidden),
                                            qkv_flat[0].dtype)
                       for _ in range(n_branches)],
            interpret=interpret,
        )(mask_row.astype(jnp.float32)[:, None, :], *qkv_flat)

    def xla(mask_row, *qkv_flat):
        outs = []
        for s in range(n_branches):
            q, k, v = qkv_flat[3 * s:3 * s + 3]
            d = q.shape[-1] // n_heads
            outs.append(_xla_ctx(q, k, v, mask_row, n_heads=n_heads,
                                 mode=mode, scale=1.0 / math.sqrt(d)))
        return tuple(outs)

    def fwd(*args):
        return attn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(lambda *a: xla(*a), *args)
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn


def ladder_attention(qkvs, mask_row, n_heads: int, mode: str,
                     use_pallas: bool, interpret: bool = False):
    """Masked multi-head attention core for every ladder branch at once —
    the only ladder stage that pays for T×T score materialization under
    XLA.  `qkvs` = sequence of (q, k, v) triples <B, T, S>; returns the
    per-branch ctx tuple.  The denses around it (map/QKV/proj/MLP) belong
    OUTSIDE, as fat batched XLA dots (hybrid ladder: the in-kernel narrow
    dense chain measured latency-bound, playground/bench_ladder_ablate.py).
    """
    interpret = interpret or interpret_default()
    flat = [a for triple in qkvs for a in triple]
    if use_pallas:
        return _make_attn_fn(len(qkvs), n_heads, mode, interpret)(
            mask_row, *flat)
    outs = []
    for q, k, v in qkvs:
        d = q.shape[-1] // n_heads
        outs.append(_xla_ctx(q, k, v, mask_row, n_heads=n_heads, mode=mode,
                             scale=1.0 / math.sqrt(d)))
    return tuple(outs)


def _branch_math(h, side, mask_row, args, *, n_heads: int, mode: str,
                 pre_norm: bool, ln_eps: float, gelu,
                 stacked: bool = False):
    """One branch's ladder update (shared by kernel and XLA reference;
    `gelu` is injected: in-kernel A&S erf vs jax.nn.gelu outside)."""
    (map_w, map_b, ln1_w, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
     ln2_w, ln2_b, w1, b1, w2, b2) = args
    ablate = os.environ.get("AUTOGNOTHI_LADDER_ABLATE", "")  # probe-only

    def dot(a, w, b):
        y = jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b.astype(jnp.float32)
        return y.astype(a.dtype)

    def ln(x, w, bias):
        if "noln" in ablate:
            return x
        return _ln32(x, w, bias, ln_eps)

    if "nomap" in ablate:
        x = side + h[:, :side.shape[-1]].astype(side.dtype)
    else:
        mapped = jax.lax.dot_general(
            h, map_w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + map_b.astype(jnp.float32)
        x = side + gelu(mapped).astype(side.dtype)

    a = ln(x, ln1_w, ln1_b) if pre_norm else x
    if "noqkv" in ablate:
        q = k = v = a
    else:
        q, k, v = dot(a, wq, bq), dot(a, wk, bk), dot(a, wv, bv)

    s_hidden = q.shape[-1]
    d = s_hidden // n_heads
    scale = 1.0 / math.sqrt(d)
    if stacked:
        ctx = _ctx_stacked(q, k, v, mask_row, n_heads=n_heads, mode=mode,
                           scale=scale)
    else:
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

    attn_out = ctx if "noproj" in ablate else dot(ctx, wo, bo)
    x = x + attn_out
    if pre_norm:
        y = ln(x, ln2_w, ln2_b)
    else:
        x = ln(x, ln1_w, ln1_b)
        y = x
    if "nomlp" in ablate:
        out = x + y
    else:
        inter = gelu(jax.lax.dot_general(
            y, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1.astype(jnp.float32)).astype(x.dtype)
        mlp_out = dot(inter, w2, b2)
        out = x + mlp_out
    if not pre_norm:
        out = ln(out, ln2_w, ln2_b)
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
            mode: str, pre_norm: bool, ln_eps: float, stacked: bool):
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
            stacked=stacked,
        )
        out_refs[s][0] = out.astype(out_refs[s].dtype)


def _pallas_ladder(h, mask_row, *flat, n_branches: int, n_heads: int,
                   mode: str, pre_norm: bool, ln_eps: float,
                   interpret: bool, stacked: bool):
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
        pre_norm=pre_norm, ln_eps=ln_eps, stacked=stacked,
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
                    ln_eps: float, interpret: bool, stacked: bool):
    xla = functools.partial(_xla_ladder, n_branches=n_branches,
                            n_heads=n_heads, mode=mode, pre_norm=pre_norm,
                            ln_eps=ln_eps)

    @jax.custom_vjp
    def ladder(h, mask_row, *flat):
        return _pallas_ladder(h, mask_row, *flat, n_branches=n_branches,
                              n_heads=n_heads, mode=mode, pre_norm=pre_norm,
                              ln_eps=ln_eps, interpret=interpret,
                              stacked=stacked)

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
                         ln_eps: float, stacked: bool):
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
            pre_norm=True, ln_eps=ln_eps, gelu=_gelu_exact, stacked=stacked,
        )
        out_refs[s][0] = upd.astype(out_refs[s].dtype)


def _pallas_mlp_ladder_q(h_attn, mask_row, w1t, b1, w2t, b2, ln_w, ln_b,
                         *flat, n_branches: int, n_heads: int, mode: str,
                         ln_eps: float, interpret: bool, stacked: bool):
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
        mode=mode, ln_eps=ln_eps, stacked=stacked,
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
                        ln_eps: float, interpret: bool, stacked: bool):
    xla = functools.partial(_xla_mlp_ladder, n_branches=n_branches,
                            n_heads=n_heads, mode=mode, ln_eps=ln_eps)

    @jax.custom_vjp
    def fused(h_attn, mask_row, w1t, b1, w2t, b2, ln_w, ln_b, *flat):
        return _pallas_mlp_ladder_q(
            h_attn, mask_row, w1t, b1, w2t, b2, ln_w, ln_b, *flat,
            n_branches=n_branches, n_heads=n_heads, mode=mode,
            ln_eps=ln_eps, interpret=interpret, stacked=stacked)

    def fwd(*args):
        return fused(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(lambda *a: xla(*a), *args)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def _score_stack_ok(t: int, n_heads: int) -> bool:
    """Cap on the stacked-attention score stack <n_heads*Tp, T> f32.

    The per-buffer byte models below are calibrated against shapes measured
    working on hardware (ViT T=197 and BERT T=512, BASELINE.md r3) — Mosaic
    tiles the in-kernel dots, so a naive sum of all stacked buffers
    over-counts and would reject those shapes.  This cap only rejects
    BEYOND the measured range (e.g. T>=640 at 12 heads), where the score
    stack alone outgrows a core's VMEM and the kernel would fail to compile
    instead of falling back to XLA."""
    return n_heads * t * t * 4 <= 16 * 1024 * 1024


def ladder_fits_vmem(hidden: int, t: int, s_hidden: int, n_heads: int,
                     n_branches: int) -> bool:
    """Gate for the whole-step ladder kernel (ladder_block)."""
    weights = n_branches * 2 * (hidden * s_hidden + 4 * s_hidden * s_hidden
                                + 2 * s_hidden * 4 * s_hidden)
    acts = (t * hidden * (2 + 4)          # h in (bf16) + f32 LN copy
            + n_branches * 4 * t * s_hidden * 4)
    return (weights + acts < _VMEM_BUDGET_BYTES
            and _score_stack_ok(t, n_heads))


def mlp_ladder_fits_vmem(hidden: int, inter: int, t: int,
                         s_hidden: int, n_branches: int,
                         n_heads: int = 12) -> bool:
    weights = 2 * hidden * inter  # int8 trunk MLP
    weights += n_branches * 2 * (hidden * s_hidden + 4 * s_hidden * s_hidden
                                 + 2 * s_hidden * 4 * s_hidden)
    acts = (t * inter * (4 + 4 + 1)       # int32 acc + f32 inter + int8
            + 4 * t * hidden * 2          # h blocks in/out + x copies
            + t * hidden * 4              # f32 LN copy
            + n_branches * 4 * t * s_hidden * 4
            + t * t * 4)                  # one scores tile at a time
    return (weights + acts < _VMEM_BUDGET_BYTES
            and _score_stack_ok(t, n_heads))


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
                                   float(ln_eps), interpret,
                                   _stacked_default())(
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
                               float(ln_eps), interpret,
                               _stacked_default())(h, mask_row, *flat)
    return _xla_ladder(h, mask_row, *flat, n_branches=len(sides),
                       n_heads=n_heads, mode=mode, pre_norm=pre_norm,
                       ln_eps=float(ln_eps))
