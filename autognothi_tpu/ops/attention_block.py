"""Pallas TPU kernel: the full attention block fused — QKV projections,
per-head masked attention, output projection and the residual add in ONE
kernel, with the weights resident in VMEM across the batch grid.

Why: on this chip the model is HBM-bandwidth-bound and XLA materializes the
<B, h, T, T> scores (measured: 634MB temp pool for ViT-B fwd at B=128, vs
~39MB per activation).  The earlier attention-only kernel
(ops/flash_attention.py) lost because pallas_call is a fusion barrier: XLA
had to materialize q/k/v in split-head layout first.  This kernel takes the
<B, T, H> hidden states directly, so per layer the only HBM traffic is
read x (+residual) + write out + the one-time weight blocks.

Layouts: activations stay <T, H> (full 128-lane tiles at H>=128); heads are
sliced in-register.  Weights are passed pre-transposed to (in, out) so the
projections are plain row-major matmuls.

Gradients: custom_vjp — forward runs the kernel, backward differentiates the
identical XLA math (recompute; per-layer rematerialization comes free).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _xla_attention_block(
    x_attn, resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo,
    *, n_heads: int, mode: str,
):
    """Reference math (identical to models.common.self_attention + output
    dense + residual), weights in (in, out) layout."""
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
    out = out + bo.astype(jnp.float32)
    return resid + out.astype(resid.dtype)


def _kernel(mask_ref, x_ref, r_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, o_ref,
            *, n_heads: int, mode: str):
    x = x_ref[0]  # <T, H>
    t, h = x.shape
    d = h // n_heads
    scale = 1.0 / math.sqrt(d)
    mask_row = mask_ref[0, 0]  # <T>

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0].astype(jnp.float32)
        return y.astype(x.dtype)

    q = proj(wq_ref, bq_ref)  # <T, H>
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    ctx_parts = []
    for head in range(n_heads):
        sl = slice(head * d, (head + 1) * d)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # <T, T>
        if mode == "add":
            scores = scores + mask_row[None, :]
        else:
            scores = scores * mask_row[None, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        ctx_parts.append(jax.lax.dot_general(
            probs, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
    ctx = jnp.concatenate(ctx_parts, axis=-1)  # <T, H>

    out = jax.lax.dot_general(
        ctx, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = r_ref[0] + out.astype(o_ref.dtype)


def _pallas_attention_block(
    x_attn, resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo,
    *, n_heads: int, mode: str, interpret: bool = False,
):
    b, t, h = x_attn.shape
    mask3 = mask_row.astype(jnp.float32)[:, None, :]

    act_spec = pl.BlockSpec((1, t, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    # constant index maps -> the weight blocks stay resident in VMEM
    w_spec = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, n_heads=n_heads, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            act_spec, act_spec,
            w_spec, b_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), resid.dtype),
        interpret=interpret,
    )(mask3, x_attn, resid, wq, bq[None], wk, bk[None], wv, bv[None],
      wo, bo[None])


@functools.lru_cache(maxsize=None)
def _make_block_fn(n_heads: int, mode: str, interpret: bool):
    xla = functools.partial(_xla_attention_block, n_heads=n_heads, mode=mode)

    @jax.custom_vjp
    def block(x_attn, resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo):
        return _pallas_attention_block(
            x_attn, resid, mask_row, wq, bq, wk, bk, wv, bv, wo, bo,
            n_heads=n_heads, mode=mode, interpret=interpret,
        )

    def fwd(*args):
        return block(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(xla, *args)
        return vjp(g)

    block.defvjp(fwd, bwd)
    return block


def attention_block(
    x_attn: jax.Array,  # <B, T, H> attention input (pre-normed for ViT)
    resid: jax.Array,  # <B, T, H> residual branch
    mask_row: jax.Array,  # <B, T> additive bias values or 0/1 multiplicative
    weights: Tuple[jax.Array, ...],  # (wq,bq,wk,bk,wv,bv,wo,bo), torch layout
    n_heads: int,
    mode: str,
    use_pallas: bool,
    interpret: bool = False,
) -> jax.Array:
    """-> resid + OutProj(MaskedAttention(x_attn)).  Weights in torch
    (out, in) layout are transposed at trace time (free under jit)."""
    wq, bq, wk, bk, wv, bv, wo, bo = weights
    args = (x_attn, resid, mask_row,
            wq.T.astype(x_attn.dtype), bq, wk.T.astype(x_attn.dtype), bk,
            wv.T.astype(x_attn.dtype), bv, wo.T.astype(x_attn.dtype), bo)
    if use_pallas:
        return _make_block_fn(n_heads, mode, interpret)(*args)
    return _xla_attention_block(*args, n_heads=n_heads, mode=mode)
