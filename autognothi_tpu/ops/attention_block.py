"""Pallas TPU kernel: the full attention block fused — optional LayerNorm
(prologue or epilogue), QKV projections, per-head masked attention, output
projection and the residual add in ONE kernel, with weights resident in VMEM
across the batch grid.

Why: on this chip the model is HBM-bandwidth-bound and XLA materializes the
<B, h, T, T> scores (measured: 634MB temp pool for ViT-B fwd at B=128, vs
~39MB per activation).  The earlier attention-only kernel
(ops/flash_attention.py) lost because pallas_call is a fusion barrier: XLA
had to materialize q/k/v in split-head layout first.  This kernel takes the
<B, T, H> hidden states directly, so per layer the only HBM traffic is
read x + write out + the one-time weight blocks.

LayerNorm fusion: "prologue" computes x_attn = LN(resid) in-kernel (the ViT
pre-norm — saves materializing the normed tensor AND its extra read);
"epilogue" applies LN to the residual sum (the BERT post-norm).

Layouts: activations stay <T, H> (full 128-lane tiles at H>=128); heads are
sliced in-register.  Weights are passed pre-transposed to (in, out).

Gradients: custom_vjp — forward runs the kernel, backward differentiates the
identical XLA math (recompute; per-layer rematerialization comes free).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _ln32(x, w, b, eps):
    """LayerNorm with fp32 statistics (mirrors models.common.layer_norm)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (normed * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(dtype)


def _xla_attention_block(
    resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo, ln_w, ln_b,
    *, n_heads: int, mode: str, ln_position: str, ln_eps: float,
):
    """Reference math, weights in (in, out) layout.  ln_position in
    {"prologue", "epilogue", "none"} (ln_w/ln_b ignored for "none")."""
    if ln_position == "prologue":
        x_attn = _ln32(resid, ln_w, ln_b, ln_eps)
    else:
        x_attn = resid
    t, h = x_attn.shape[-2], x_attn.shape[-1]
    d = h // n_heads
    scale = 1.0 / math.sqrt(d)

    def proj(w, b):
        y = jnp.einsum("bti,io->bto", x_attn, w.astype(x_attn.dtype),
                       preferred_element_type=jnp.float32)
        return (y + b.astype(jnp.float32)).astype(x_attn.dtype)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    b_sz = x_attn.shape[0]
    q = q.reshape(b_sz, t, n_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b_sz, t, n_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b_sz, t, n_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mode == "add":
        scores = scores + mask_row[:, None, None, :].astype(scores.dtype)
    else:
        scores = scores * mask_row[:, None, None, :].astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b_sz, t, h)
    out = jnp.einsum("bti,io->bto", ctx, wo.astype(ctx.dtype),
                     preferred_element_type=jnp.float32)
    out = resid + (out + bo.astype(jnp.float32)).astype(resid.dtype)
    if ln_position == "epilogue":
        out = _ln32(out, ln_w, ln_b, ln_eps)
    return out


def _phase_group() -> int:
    """AUTOGNOTHI_ATTN_PHASE_GROUP (trace-time, default 1): heads per
    scheduling group in the in-kernel attention loop.  1 reproduces the
    classic score->softmax->PV per head; g>1 computes g heads' softmaxed
    probs first, then their g PV dots — exposing VPU(softmax)/MXU(dot)
    overlap to Mosaic's scheduler at the cost of holding g probs <T,T>
    in VMEM.  MEASURED (r2, BERT@512 fw_final): g=3/6 within run-to-run
    drift of g=1 (292/286/285 vs 282 expl/s) — Mosaic already schedules
    the overlap; the knob stays for future hardware, default 1."""
    import os

    return max(1, int(os.environ.get("AUTOGNOTHI_ATTN_PHASE_GROUP", "1")))


def _heads_attention(q, k, v, mask_row, *, n_heads: int, mode: str):
    """Per-head masked attention over packed <T, H> q/k/v -> <T, H> ctx."""
    t, h = q.shape
    d = h // n_heads
    scale = 1.0 / math.sqrt(d)
    group = _phase_group()

    def probs_for(head):
        sl = slice(head * d, (head + 1) * d)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # <T, T>
        if mode == "add":
            scores = scores + mask_row[None, :]
        else:
            scores = scores * mask_row[None, :]
        return jax.nn.softmax(scores, axis=-1).astype(v.dtype)

    def pv(head, probs):
        sl = slice(head * d, (head + 1) * d)
        return jax.lax.dot_general(
            probs, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    ctx_parts = []
    for g0 in range(0, n_heads, group):
        heads = range(g0, min(g0 + group, n_heads))
        probs = [probs_for(i) for i in heads]
        ctx_parts.extend(pv(i, p) for i, p in zip(heads, probs))
    return jnp.concatenate(ctx_parts, axis=-1)  # <T, H>


def _kernel(mask_ref, r_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, lnw_ref, lnb_ref, o_ref,
            *, n_heads: int, mode: str, ln_position: str, ln_eps: float):
    # g images per grid step: a static per-image loop (a flat
    # (g*t, h) reshape is an unsupported Mosaic shape cast when t is not
    # sublane-aligned, e.g. T=197) — per-grid-step DMA/launch overhead
    # amortizes over the group, which is what dominates narrow layers
    g = r_ref.shape[0]
    for i in range(g):
        resid = r_ref[i]  # <T, H>
        if ln_position == "prologue":
            x = _ln32(resid, lnw_ref[0], lnb_ref[0], ln_eps)
        else:
            x = resid

        def proj(w_ref, b_ref, x=x):
            y = jax.lax.dot_general(
                x, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[0].astype(jnp.float32)
            return y.astype(x.dtype)

        q = proj(wq_ref, bq_ref)  # <T, H>
        k = proj(wk_ref, bk_ref)
        v = proj(wv_ref, bv_ref)
        ctx = _heads_attention(q, k, v, mask_ref[i, 0],
                               n_heads=n_heads, mode=mode)

        out = jax.lax.dot_general(
            ctx, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[0].astype(jnp.float32)
        out = resid + out.astype(resid.dtype)
        if ln_position == "epilogue":
            out = _ln32(out, lnw_ref[0], lnb_ref[0], ln_eps)
        o_ref[i] = out.astype(o_ref.dtype)


def _kernel_q(mask_ref, r_ref, wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
              wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref,
              lnw_ref, lnb_ref, o_ref,
              *, n_heads: int, mode: str, ln_position: str, ln_eps: float):
    """W8A8 variant: the four projections run int8 x int8 -> int32 on the
    MXU (per-out-channel weight scales + dynamic per-token activation
    scales); the T x T score/context matmuls stay bf16 (ViT: <4% of block
    FLOPs; quantizing them buys little and costs accuracy)."""
    from .mlp_block import _quant_rows

    g = r_ref.shape[0]
    for i in range(g):  # see _kernel: per-image loop, Mosaic-safe for any T
        resid = r_ref[i]  # <T, H>
        if ln_position == "prologue":
            x = _ln32(resid, lnw_ref[0], lnb_ref[0], ln_eps)
        else:
            x = resid

        xq, xs = _quant_rows(x.astype(jnp.float32))

        def proj_q(w_ref, s_ref, b_ref, xq=xq, xs=xs, dtype=x.dtype):
            acc = jax.lax.dot_general(
                xq, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * xs * s_ref[0] \
                + b_ref[0].astype(jnp.float32)
            return y.astype(dtype)

        q = proj_q(wq_ref, sq_ref, bq_ref)  # <T, H>
        k = proj_q(wk_ref, sk_ref, bk_ref)
        v = proj_q(wv_ref, sv_ref, bv_ref)
        ctx = _heads_attention(q, k, v, mask_ref[i, 0],
                               n_heads=n_heads, mode=mode)

        cq, cs = _quant_rows(ctx.astype(jnp.float32))
        acc = jax.lax.dot_general(
            cq, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * cs * so_ref[0] \
            + bo_ref[0].astype(jnp.float32)
        out = resid + out.astype(resid.dtype)
        if ln_position == "epilogue":
            out = _ln32(out, lnw_ref[0], lnb_ref[0], ln_eps)
        o_ref[i] = out.astype(o_ref.dtype)


def _pallas_attention_block_q(
    resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo, ln_w, ln_b,
    *, n_heads: int, mode: str, ln_position: str, ln_eps: float,
    interpret: bool = False, group: int = 1,
):
    from .mlp_block import quant_cols

    b, t, h = resid.shape
    mask3 = mask_row.astype(jnp.float32)[:, None, :]
    wq_q, sq = quant_cols(wq)
    wk_q, sk = quant_cols(wk)
    wv_q, sv = quant_cols(wv)
    wo_q, so = quant_cols(wo)

    act_spec = pl.BlockSpec((group, t, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel_q, n_heads=n_heads, mode=mode, ln_position=ln_position,
        ln_eps=ln_eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            act_spec,
            w_spec, b_spec, b_spec,
            w_spec, b_spec, b_spec,
            w_spec, b_spec, b_spec,
            w_spec, b_spec, b_spec,
            b_spec, b_spec,
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), resid.dtype),
        interpret=interpret,
    )(mask3, resid, wq_q, sq, bq[None], wk_q, sk, bk[None],
      wv_q, sv, bv[None], wo_q, so, bo[None], ln_w[None], ln_b[None])


def _pallas_attention_block(
    resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo, ln_w, ln_b,
    *, n_heads: int, mode: str, ln_position: str, ln_eps: float,
    interpret: bool = False, group: int = 1,
):
    b, t, h = resid.shape
    mask3 = mask_row.astype(jnp.float32)[:, None, :]

    act_spec = pl.BlockSpec((group, t, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    # constant index maps -> the weight blocks stay resident in VMEM
    w_spec = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, n_heads=n_heads, mode=mode, ln_position=ln_position,
        ln_eps=ln_eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            act_spec,
            w_spec, b_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
            b_spec, b_spec,
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), resid.dtype),
        interpret=interpret,
    )(mask3, resid, wq, bq[None], wk, bk[None], wv, bv[None],
      wo, bo[None], ln_w[None], ln_b[None])


@functools.lru_cache(maxsize=None)
def _make_block_fn(n_heads: int, mode: str, ln_position: str, ln_eps: float,
                   interpret: bool, quant: str = "none", group: int = 1):
    xla = functools.partial(_xla_attention_block, n_heads=n_heads, mode=mode,
                            ln_position=ln_position, ln_eps=ln_eps)
    pallas = (_pallas_attention_block_q if quant == "int8"
              else _pallas_attention_block)

    @jax.custom_vjp
    def block(resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo, ln_w, ln_b):
        return pallas(
            resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo, ln_w, ln_b,
            n_heads=n_heads, mode=mode, ln_position=ln_position,
            ln_eps=ln_eps, interpret=interpret, group=group,
        )

    def fwd(*args):
        return block(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(xla, *args)
        return vjp(g)

    block.defvjp(fwd, bwd)
    return block


# single source for every fused-op VMEM gate (mlp/head/ladder import it)
_VMEM_BUDGET_BYTES = 15 * 1024 * 1024


def interpret_default() -> bool:
    """AUTOGNOTHI_PALLAS_INTERPRET=1: run the kernels through the Pallas
    interpreter (works on any backend) — CI coverage of the kernel dispatch
    path and kernel x GSPMD composition on the virtual CPU mesh.
    Single source of truth: models.common.pallas_interpret."""
    from ..models.common import pallas_interpret

    return pallas_interpret()


def _fits_vmem(resid, quant: str = "none", group: int = 1) -> bool:
    t, h = resid.shape[-2], resid.shape[-1]
    itemsize = jnp.dtype(resid.dtype).itemsize
    w_item = 1 if quant == "int8" else itemsize  # int8 weights quarter VMEM
    weights = 4 * h * h * w_item
    # only the in/out blocks hold the whole g-image group; q/k/v/ctx and
    # the <T, T> scores are per-image temporaries of the group loop, so
    # they do NOT scale with `group` (counting them g-fold disabled the
    # grouping knob for shapes that actually fit)
    acts = (2 * group * t * h * itemsize   # r_ref + o_ref blocks
            + 4 * t * h * itemsize         # q/k/v/ctx for one image
            + t * t * 4)                   # one per-head score tile
    if quant == "int8":
        # the quant variant additionally holds the f32 x/ctx copies, their
        # int8 quantized buffers and an int32 projection accumulator
        acts += 2 * t * h * 4 + 2 * t * h + t * h * 4
    return weights + acts < _VMEM_BUDGET_BYTES


def attention_block(
    resid: jax.Array,  # <B, T, H> residual branch (= attention input unless
    # a prologue LN is fused)
    mask_row: jax.Array,  # <B, T> additive bias values or 0/1 multiplicative
    weights: Tuple[jax.Array, ...],  # (wq,bq,wk,bk,wv,bv,wo,bo), torch layout
    n_heads: int,
    mode: str,
    use_pallas: bool,
    ln: Optional[Tuple[jax.Array, jax.Array, float]] = None,
    ln_position: str = "none",  # "prologue" (pre-norm) | "epilogue" (post)
    interpret: bool = False,
    quant: str = "none",
    group: int = 1,
) -> jax.Array:
    """-> residual-attended block output with optional fused LayerNorm.

    prologue: resid + OutProj(Attn(LN(resid)));
    epilogue: LN(resid + OutProj(Attn(resid)));
    none:     resid + OutProj(Attn(resid)).
    Weights in torch (out, in) layout are transposed at trace time.
    quant="int8": W8A8 projections in the fused kernel (serving path).
    group: images per grid step — amortizes per-step overhead on NARROW
    layers (the 96-dim LTT ladders); the projections batch across the
    group's rows, attention stays per-image.  Ignored unless it divides
    B."""
    wq, bq, wk, bk, wv, bv, wo, bo = weights
    interpret = interpret or interpret_default()
    if group > 1 and resid.shape[0] % group != 0:
        group = 1
    if ln is None:
        ln_w = jnp.ones((resid.shape[-1],), resid.dtype)
        ln_b = jnp.zeros((resid.shape[-1],), resid.dtype)
        ln_eps = 1e-12
        ln_position = "none"
    else:
        ln_w, ln_b, ln_eps = ln
    args = (resid, mask_row,
            wq.T.astype(resid.dtype), bq, wk.T.astype(resid.dtype), bk,
            wv.T.astype(resid.dtype), bv, wo.T.astype(resid.dtype), bo,
            ln_w, ln_b)
    if use_pallas and _fits_vmem(resid, quant, group):
        return _make_block_fn(n_heads, mode, ln_position, float(ln_eps),
                              interpret, quant, group)(*args)
    return _xla_attention_block(*args, n_heads=n_heads, mode=mode,
                                ln_position=ln_position, ln_eps=float(ln_eps))
