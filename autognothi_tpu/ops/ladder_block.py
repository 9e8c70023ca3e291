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
