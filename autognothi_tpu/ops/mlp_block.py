"""Pallas TPU kernel: the transformer MLP block fused — optional LayerNorm
(prologue or epilogue), up-projection, GELU, down-projection and the
residual add in one kernel, weights VMEM-resident.

Rationale mirrors ops/attention_block.py: on a bandwidth-bound chip the
<B, T, 4H> intermediate costs a write+read round trip per layer (~310MB per
ViT-B layer at B=128); fused LNs remove two more activation round trips.

VMEM budget: w1+w2 at bf16 for H=768 is 9.4MB (+ <T, 4H> intermediate) —
fits a v5e core; larger models (H>=1024) exceed VMEM and fall back to XLA
automatically.

Gradients: custom_vjp over the identical XLA math (recompute backward)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_block import (_VMEM_BUDGET_BYTES, _ln32,
                              interpret_default)

# VMEM cap for weights+activations (v5e has ~16MB/core).  ViT-B computes to
# ~14MB and compiles; ViT-L (16.8MB weights alone) must fall back.


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs error
    1.5e-7 — far below bf16 resolution).  Pallas TPU implements neither erf
    nor erfc, so the kernel carries its own."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """0.5 x (1 + erf(x/sqrt(2))) with the in-kernel erf approximation."""
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def quant_cols(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of an (in, out) weight
    -> (int8 <in, out>, f32 <1, out> scale).  Runs in-graph before the
    pallas_call: ~2ms for all of ViT-B per fw_final invocation, <1% at the
    batch sizes the serving path uses."""
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0 + 1e-12
    return jnp.round(w32 / scale).astype(jnp.int8), scale


def _quant_rows(x32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row (per-token) int8 activation quantization
    over the LAST axis (any leading shape).  One reciprocal per row,
    broadcast multiply per element (an elementwise divide over <T, 4H>
    costs real VPU time in the kernel).  Shared by the fused kernels and
    models.common.dense_serving — the single definition of the activation
    quantization recipe."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) + 1e-12
    inv = 127.0 / amax
    return jnp.round(x32 * inv).astype(jnp.int8), amax * (1.0 / 127.0)


def _xla_mlp_block(resid, w1, b1, w2, b2, ln_w, ln_b,
                   *, ln_position: str, ln_eps: float):
    """LN? -> W1 -> gelu -> W2 -> +resid -> LN? (weights (in, out) layout)."""
    x = _ln32(resid, ln_w, ln_b, ln_eps) if ln_position == "prologue" else resid
    inter = jnp.einsum("bti,io->bto", x, w1.astype(x.dtype),
                       preferred_element_type=jnp.float32)
    inter = jax.nn.gelu(inter + b1.astype(jnp.float32), approximate=False)
    inter = inter.astype(x.dtype)
    out = jnp.einsum("bti,io->bto", inter, w2.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    out = resid + (out + b2.astype(jnp.float32)).astype(resid.dtype)
    if ln_position == "epilogue":
        out = _ln32(out, ln_w, ln_b, ln_eps)
    return out


def _kernel(r_ref, w1_ref, b1_ref, w2_ref, b2_ref, lnw_ref, lnb_ref, o_ref,
            *, ln_position: str, ln_eps: float):
    # per-image loop: a flat (g*t, h) reshape is an unsupported Mosaic
    # shape cast when t is not sublane-aligned (e.g. T=197)
    g = r_ref.shape[0]
    for i in range(g):
        resid = r_ref[i]  # <T, H>
        if ln_position == "prologue":
            x = _ln32(resid, lnw_ref[0], lnb_ref[0], ln_eps)
        else:
            x = resid
        inter = jax.lax.dot_general(
            x, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        inter = _gelu_exact(inter).astype(x.dtype)
        out = jax.lax.dot_general(
            inter, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0].astype(jnp.float32)
        out = resid + out.astype(resid.dtype)
        if ln_position == "epilogue":
            out = _ln32(out, lnw_ref[0], lnb_ref[0], ln_eps)
        o_ref[i] = out.astype(o_ref.dtype)


def _kernel_q(r_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
              lnw_ref, lnb_ref, o_ref, *, ln_position: str, ln_eps: float):
    """W8A8 variant: int8 weights (per-out-channel scales) + dynamic
    per-token activation quantization; both dots run on the int8 MXU path
    (~1.8x bf16 on this chip, playground/bench_int8.py)."""
    g = r_ref.shape[0]
    for i in range(g):  # per-image loop (Mosaic-safe for any T)
        resid = r_ref[i]  # <T, H>
        if ln_position == "prologue":
            x = _ln32(resid, lnw_ref[0], lnb_ref[0], ln_eps)
        else:
            x = resid
        xq, xs = _quant_rows(x.astype(jnp.float32))
        acc = jax.lax.dot_general(
            xq, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        inter = acc.astype(jnp.float32) * xs * s1_ref[0] \
            + b1_ref[0].astype(jnp.float32)
        inter = _gelu_exact(inter)
        iq, is_ = _quant_rows(inter)
        acc2 = jax.lax.dot_general(
            iq, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc2.astype(jnp.float32) * is_ * s2_ref[0] \
            + b2_ref[0].astype(jnp.float32)
        out = resid + out.astype(resid.dtype)
        if ln_position == "epilogue":
            out = _ln32(out, lnw_ref[0], lnb_ref[0], ln_eps)
        o_ref[i] = out.astype(o_ref.dtype)


def _pallas_mlp_block_q(resid, w1, b1, w2, b2, ln_w, ln_b,
                        *, ln_position: str, ln_eps: float,
                        interpret: bool = False, group: int = 1):
    b, t, h = resid.shape
    inter_dim = w1.shape[1]
    w1_q, s1 = quant_cols(w1)
    w2_q, s2 = quant_cols(w2)
    act_spec = pl.BlockSpec((group, t, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    h_vec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    i_vec = pl.BlockSpec((1, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_q, ln_position=ln_position,
                               ln_eps=ln_eps)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            act_spec,
            pl.BlockSpec((h, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            i_vec, i_vec,
            pl.BlockSpec((inter_dim, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            h_vec, h_vec, h_vec, h_vec,
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), resid.dtype),
        interpret=interpret,
    )(resid, w1_q, s1, b1[None], w2_q, s2, b2[None], ln_w[None], ln_b[None])


def _pallas_mlp_block(resid, w1, b1, w2, b2, ln_w, ln_b,
                      *, ln_position: str, ln_eps: float,
                      interpret: bool = False, group: int = 1):
    b, t, h = resid.shape
    inter_dim = w1.shape[1]
    act_spec = pl.BlockSpec((group, t, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    h_vec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, ln_position=ln_position,
                               ln_eps=ln_eps)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            act_spec,
            pl.BlockSpec((h, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inter_dim, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            h_vec, h_vec, h_vec,
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), resid.dtype),
        interpret=interpret,
    )(resid, w1, b1[None], w2, b2[None], ln_w[None], ln_b[None])


@functools.lru_cache(maxsize=None)
def _make_block_fn(ln_position: str, ln_eps: float, interpret: bool,
                   quant: str = "none", group: int = 1):
    xla = functools.partial(_xla_mlp_block, ln_position=ln_position,
                            ln_eps=ln_eps)
    pallas = _pallas_mlp_block_q if quant == "int8" else _pallas_mlp_block

    @jax.custom_vjp
    def block(resid, w1, b1, w2, b2, ln_w, ln_b):
        return pallas(resid, w1, b1, w2, b2, ln_w, ln_b,
                      ln_position=ln_position, ln_eps=ln_eps,
                      interpret=interpret, group=group)

    def fwd(*args):
        return block(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(xla, *args)
        return vjp(g)

    block.defvjp(fwd, bwd)
    return block


# ------------------------- separate-input variant (for inter-dim splits)


def _xla_mlp_sepx(x, resid, w1, b1, w2, b2):
    inter = jnp.einsum("bti,io->bto", x, w1.astype(x.dtype),
                       preferred_element_type=jnp.float32)
    inter = jax.nn.gelu(inter + b1.astype(jnp.float32), approximate=False)
    inter = inter.astype(x.dtype)
    out = jnp.einsum("bti,io->bto", inter, w2.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return resid + (out + b2.astype(jnp.float32)).astype(resid.dtype)


def _kernel_sepx(x_ref, r_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]
    inter = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    inter = _gelu_exact(inter).astype(x.dtype)
    out = jax.lax.dot_general(
        inter, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = r_ref[0] + out.astype(o_ref.dtype)


def _kernel_sepx_q(x_ref, r_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                   b2_ref, o_ref):
    """W8A8 tile of the inter-dim-split MLP (shapes too big for the fused
    int8 kernel, e.g. BERT@512: the f32 <T, 4H> intermediate alone is
    9.4MB)."""
    x = x_ref[0]
    xq, xs = _quant_rows(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    inter = acc.astype(jnp.float32) * xs * s1_ref[0] \
        + b1_ref[0].astype(jnp.float32)
    inter = _gelu_exact(inter)
    iq, is_ = _quant_rows(inter)
    acc2 = jax.lax.dot_general(
        iq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc2.astype(jnp.float32) * is_ * s2_ref[0] \
        + b2_ref[0].astype(jnp.float32)
    o_ref[0] = r_ref[0] + out.astype(o_ref.dtype)


def _pallas_mlp_sepx_q(x, resid, w1, b1, w2, b2, *, interpret=False):
    b, t, h = resid.shape
    inter_dim = w1.shape[1]
    w1_q, s1 = quant_cols(w1)
    w2_q, s2 = quant_cols(w2)
    act_spec = pl.BlockSpec((1, t, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    i_vec = pl.BlockSpec((1, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_sepx_q,
        grid=(b,),
        in_specs=[
            act_spec, act_spec,
            pl.BlockSpec((h, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            i_vec, i_vec,
            pl.BlockSpec((inter_dim, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), resid.dtype),
        interpret=interpret,
    )(x, resid, w1_q, s1, b1[None], w2_q, s2, b2[None])


def _pallas_mlp_sepx(x, resid, w1, b1, w2, b2, *, interpret=False):
    b, t, h = resid.shape
    inter_dim = w1.shape[1]
    act_spec = pl.BlockSpec((1, t, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_sepx,
        grid=(b,),
        in_specs=[
            act_spec, act_spec,
            pl.BlockSpec((h, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inter_dim, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), resid.dtype),
        interpret=interpret,
    )(x, resid, w1, b1[None], w2, b2[None])


@functools.lru_cache(maxsize=None)
def _make_sepx_fn(interpret: bool, quant: str = "none"):
    pallas = _pallas_mlp_sepx_q if quant == "int8" else _pallas_mlp_sepx

    @jax.custom_vjp
    def block(x, resid, w1, b1, w2, b2):
        return pallas(x, resid, w1, b1, w2, b2, interpret=interpret)

    def fwd(*args):
        return block(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(_xla_mlp_sepx, *args)
        return vjp(g)

    block.defvjp(fwd, bwd)
    return block


def _tiled_mlp(resid, w1_t, b1, w2_t, b2, ln_w, ln_b, ln_position, ln_eps,
               n_tiles, interpret, quant="none"):
    """Inter-dim split: MLP(x) = sum_k W2_k . gelu(W1_k . x + b1_k) + b2,
    chained through separate-input kernels so the (possibly LN'd) input stays
    fixed while the residual accumulates.  Weights arrive pre-transposed
    (in, out)."""
    x = _ln32(resid, ln_w, ln_b, ln_eps) if ln_position == "prologue" else resid
    inter = w1_t.shape[1]
    tile = inter // n_tiles
    out = resid
    fn = _make_sepx_fn(interpret, quant)
    for k in range(n_tiles):
        sl = slice(k * tile, (k + 1) * tile)
        b2_k = b2 if k == n_tiles - 1 else jnp.zeros_like(b2)
        out = fn(x, out, w1_t[:, sl], b1[sl], w2_t[sl, :], b2_k)
    if ln_position == "epilogue":
        out = _ln32(out, ln_w, ln_b, ln_eps)
    return out


def _fits_vmem(resid, w1, quant: str = "none", group: int = 1) -> bool:
    t, h = resid.shape[-2], resid.shape[-1]
    inter = w1.shape[0]
    itemsize = jnp.dtype(resid.dtype).itemsize
    w_item = 1 if quant == "int8" else itemsize  # int8 weights halve VMEM
    weights = 2 * h * inter * w_item
    # only the r_ref/o_ref blocks hold the whole g-image group; the <T,
    # inter> intermediate and the quant buffers are per-image temporaries
    # of the kernels' group loop — counting them g-fold rejected shapes
    # that actually fit (same over-count attention_block.py:347-352 fixed)
    acts = (2 * group * t * h * itemsize  # r_ref + o_ref blocks
            + t * inter * (4 + itemsize)  # f32 inter + cast copy, one image
            + t * h * itemsize)           # x / LN copy for one image
    if quant == "int8":
        acts += t * inter  # the re-quantized int8 intermediate
    return weights + acts < _VMEM_BUDGET_BYTES


def mlp_block(
    resid: jax.Array,  # <B, T, H> residual branch (= MLP input unless a
    # prologue LN is fused)
    w1: jax.Array,  # torch layout <inter, H>
    b1: jax.Array,
    w2: jax.Array,  # torch layout <H, inter>
    b2: jax.Array,
    use_pallas: bool,
    ln: Optional[Tuple[jax.Array, jax.Array, float]] = None,
    ln_position: str = "none",
    interpret: bool = False,
    quant: str = "none",
    group: int = 1,
) -> jax.Array:
    """prologue: resid + MLP(LN(resid)); epilogue: LN(resid + MLP(resid));
    none: resid + MLP(resid).  When the weights exceed the VMEM budget, the
    intermediate dimension is split across chained separate-input kernels
    (valid because GELU is elementwise per intermediate unit); pathological
    shapes fall back to XLA.  quant="int8" switches the fused kernel to the
    W8A8 serving path (forward only; the custom_vjp backward stays bf16).
    group: images per grid step — amortizes per-step overhead on NARROW
    layers (e.g. the 96-dim LTT ladders) where per-image compute is tiny;
    identical math (rows are independent).  Ignored unless it divides B."""
    if group > 1 and resid.shape[0] % group != 0:
        group = 1
    interpret = interpret or interpret_default()
    if ln is None:
        ln_w = jnp.ones((resid.shape[-1],), resid.dtype)
        ln_b = jnp.zeros((resid.shape[-1],), resid.dtype)
        ln_eps = 1e-12
        ln_position = "none"
    else:
        ln_w, ln_b, ln_eps = ln
    args = (resid, w1.T.astype(resid.dtype), b1, w2.T.astype(resid.dtype),
            b2, ln_w, ln_b)
    if use_pallas:
        if _fits_vmem(resid, w1, quant, group):
            return _make_block_fn(ln_position, float(ln_eps), interpret,
                                  quant, group)(*args)
        for n_tiles in (2, 4, 8):
            if w1.shape[0] % n_tiles == 0 and _fits_vmem(
                resid, w1[: w1.shape[0] // n_tiles], quant
            ):
                return _tiled_mlp(*args, ln_position, float(ln_eps),
                                  n_tiles, interpret, quant)
    return _xla_mlp_block(*args, ln_position=ln_position,
                          ln_eps=float(ln_eps))
