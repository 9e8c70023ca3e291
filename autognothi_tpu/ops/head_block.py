"""Pallas TPU kernel: the explainer MLP head fused — LayerNorm, the two
3072-wide denses with GELUs, and the class projection in ONE kernel with
int8 weights VMEM-resident.

Why: the head (LN -> d1[Hin->3072] -> gelu -> d2[3072->3072] -> gelu ->
d3[3072->C]) is the one hot fw_final chunk outside the fused encoder
kernels.  MEASURED (r3 breakdown, LTT ViT-B @B256, 1x v5e): 136-146 us/img
for ~4 GF — ~28 TF/s, dominated by the <B*T, 3072> intermediates' HBM round
trips and (int8 mode) XLA's materialized quantization passes, not by the
dots.  In-kernel the only HBM traffic is read x + write out.

W8A8 only: the int8 weights (Hin*3072 + 3072*3072 + pad) fit the ~15MB VMEM
budget where bf16 (19MB+) cannot; the bf16 path keeps the XLA fallback.
Tokens are tiled (grid = B x ceil(T/tile)) so the f32 intermediates stay
small; out-of-range token rows compute garbage locally and are masked on
the store (all ops are row-local).

Gradients: custom_vjp — backward differentiates the full-precision XLA
math (the fused-kernel convention; see ops/attention_block.py).

Reference semantics matched: models/vanilla_vit.py:102-130 explainer head
(torch nn.LayerNorm default eps 1e-5 + Linear/GELU stack)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_block import (_VMEM_BUDGET_BYTES, _ln32,
                              interpret_default)
from .mlp_block import _gelu_exact, _quant_rows, quant_cols



def _xla_head(x, w1t, b1, w2t, b2, w3t, b3, ln_w, ln_b, *, ln_eps: float,
              has_ln: bool = True):
    """Reference math, weights pre-transposed to (in, out)."""
    if has_ln:
        x = _ln32(x, ln_w, ln_b, ln_eps)

    def dense_t(h, w, b):
        y = jnp.einsum("bti,io->bto", h, w.astype(h.dtype),
                       preferred_element_type=jnp.float32)
        return (y + b.astype(jnp.float32)).astype(h.dtype)

    h = jax.nn.gelu(dense_t(x, w1t, b1).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    h = jax.nn.gelu(dense_t(h, w2t, b2).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    return dense_t(h, w3t, b3)


def _n_chunks(inter: int) -> int:
    """In-kernel column split of d2/d3: caps the live f32 <tile, chunk>
    intermediate so the token tile can stay at 128 (full MXU rows).  Lane
    slices must stay 128-aligned, so narrow test dims use one chunk."""
    return 4 if inter % (4 * 128) == 0 else 1


def _kernel_q(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
              w3_ref, b3_ref, lnw_ref, lnb_ref, o_ref, *, ln_eps: float,
              has_ln: bool):
    x = (_ln32(x_ref[0], lnw_ref[0], lnb_ref[0], ln_eps) if has_ln
         else x_ref[0])
    xq, xs = _quant_rows(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = _gelu_exact(acc.astype(jnp.float32) * xs * s1_ref[0]
                    + b1_ref[0].astype(jnp.float32))
    hq, hs = _quant_rows(h)
    inter = w2_ref.shape[1]
    chunks = _n_chunks(inter)
    chunk = inter // chunks
    out = b3_ref[0].astype(jnp.float32)
    for k in range(chunks):
        sl = slice(k * chunk, (k + 1) * chunk)
        acc2 = jax.lax.dot_general(
            hq, w2_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h2 = _gelu_exact(acc2.astype(jnp.float32) * hs * s2_ref[0, sl]
                         + b2_ref[0, sl].astype(jnp.float32))
        out = out + jax.lax.dot_general(
            h2.astype(x.dtype), w3_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_tile(t: int, h_in: int, inter: int, c: int) -> Optional[int]:
    """Largest token tile whose weights+activations fit the VMEM budget."""
    # int8 w1/w2 + the ACTUAL <inter, C> bf16 w3 (a 1000-class head keeps
    # ~6 MB of w3 resident — padding C up to a lane of 128 for the tile)
    c_pad = max(c, 128)
    weights = h_in * inter + inter * inter + inter * c_pad * 2
    chunk = inter // _n_chunks(inter)
    for tile in (256, 128, 64, 32):
        acts = (
            tile * h_in * (4 + 2)        # f32 LN copy + bf16 in
            + tile * inter * (4 + 1)     # f32 h + its int8 row-quant copy
            + tile * chunk * (4 + 4 + 2)  # int32 acc2 + f32 h2 + bf16 h2
            + tile * c_pad * (4 + 4)     # f32 out accumulator + out tile
        )
        if weights + acts < _VMEM_BUDGET_BYTES and tile <= max(t, 32):
            return tile
    return None


def _pallas_head_q(x, w1t, b1, w2t, b2, w3t, b3, ln_w, ln_b,
                   *, ln_eps: float, has_ln: bool, interpret: bool):
    b, t, h_in = x.shape
    inter = w1t.shape[1]
    c = w3t.shape[1]
    tile = _pick_tile(t, h_in, inter, c)
    assert tile is not None  # guarded by head_fits_vmem
    n_tiles = (t + tile - 1) // tile

    w1_q, s1 = quant_cols(w1t)
    w2_q, s2 = quant_cols(w2t)

    x_spec = pl.BlockSpec((1, tile, h_in), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_q, ln_eps=ln_eps, has_ln=has_ln)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            x_spec,
            const((h_in, inter)), const((1, inter)), const((1, inter)),
            const((inter, inter)), const((1, inter)), const((1, inter)),
            const((inter, c)), const((1, c)),
            const((1, h_in)), const((1, h_in)),
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, w1_q, s1, b1[None], w2_q, s2, b2[None],
      w3t.astype(x.dtype), b3[None], ln_w[None], ln_b[None])


@functools.lru_cache(maxsize=None)
def _make_head_fn(ln_eps: float, has_ln: bool, interpret: bool):
    xla = functools.partial(_xla_head, ln_eps=ln_eps, has_ln=has_ln)

    @jax.custom_vjp
    def head(x, w1t, b1, w2t, b2, w3t, b3, ln_w, ln_b):
        return _pallas_head_q(x, w1t, b1, w2t, b2, w3t, b3, ln_w, ln_b,
                              ln_eps=ln_eps, has_ln=has_ln,
                              interpret=interpret)

    def fwd(*args):
        return head(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(xla, *args)
        return vjp(g)

    head.defvjp(fwd, bwd)
    return head


def head_fits_vmem(h_in: int, inter: int, t: int, c: int = 128) -> bool:
    return _pick_tile(t, h_in, inter, c) is not None


def explainer_head_block(
    x: jax.Array,       # <B, T, Hin>
    w1: jax.Array,      # torch layout <inter, Hin>
    b1: jax.Array,
    w2: jax.Array,      # <inter, inter>
    b2: jax.Array,
    w3: jax.Array,      # <C, inter>
    b3: jax.Array,
    ln_w: Optional[jax.Array],   # None -> no leading LayerNorm (BERT head)
    ln_b: Optional[jax.Array],
    ln_eps: float,
    use_pallas: bool,
    quant: str = "none",
    interpret: bool = False,
) -> jax.Array:
    """-> <B, T, C>: d3(gelu(d2(gelu(d1(LN?(x)))))) fused when the W8A8
    serving path is active and the int8 weights fit VMEM; XLA otherwise."""
    interpret = interpret or interpret_default()
    has_ln = ln_w is not None
    if not has_ln:
        ln_w = jnp.ones((x.shape[-1],), x.dtype)
        ln_b = jnp.zeros((x.shape[-1],), x.dtype)
    args = (x, w1.T, b1, w2.T, b2, w3.T, b3, ln_w, ln_b)
    if (use_pallas and quant == "int8" and x.ndim == 3
            and head_fits_vmem(x.shape[-1], w1.shape[0], x.shape[-2],
                               w3.shape[0])):
        return _make_head_fn(float(ln_eps), has_ln, interpret)(*args)
    return _xla_head(*args, ln_eps=float(ln_eps), has_ln=has_ln)
