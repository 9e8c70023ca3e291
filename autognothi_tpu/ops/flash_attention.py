"""Pallas TPU kernel: coalition-masked self attention, fused in VMEM.

The hot path of this framework runs attention over the *coalition* batch
(B x n_mask_samples masked copies), where XLA's default lowering
materializes the <N, heads, T, T> score and probability tensors in HBM
between the two matmuls.  At the workload's sequence lengths (ViT: 197,
BERT: <=512) a whole (T, T) score tile fits VMEM, so this kernel computes
QK^T, applies the coalition mask (additive bias for BERT semantics,
multiplicative score scaling for the ViT quirk — see models/common.py),
does a fp32 row softmax and the PV matmul without ever leaving VMEM.

Grid: one program per (batch row, head).  T is padded to the 128 lane
quantum by the wrapper; padded key columns are forced to -inf BEFORE the
softmax so results are bit-equivalent to the unpadded XLA path; padded query
rows are sliced off afterwards.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _attn_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, mode: str,
                 t_real: int, scale: float, n_heads: int):
    """One program per batch row; heads unrolled in-kernel so the mask row
    loads once and the scheduler sees a few large fused bodies instead of
    N*heads tiny ones."""
    mask_row = mask_ref[0, 0]  # <T_pad> float

    for head in range(n_heads):
        q = q_ref[0, head]  # <T_pad, D>
        k = k_ref[0, head]
        v = v_ref[0, head]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # <T_pad, T_pad>

        if mode == "add":
            scores = scores + mask_row[None, :]
        elif mode == "mul":
            scores = scores * mask_row[None, :]
        else:
            raise ValueError(mode)

        # padded key columns must not receive probability mass
        t_pad = scores.shape[-1]
        if t_pad != t_real:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < t_real, scores, NEG_INF)

        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, head] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _xla_masked_attention(q, k, v, mask_row, *, mode: str):
    """Unpadded XLA reference math — the custom_vjp backward target."""
    d = q.shape[-1]
    scores = jnp.einsum(
        "nhtd,nhsd->nhts", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(d)
    m = mask_row.astype(scores.dtype)[:, None, None, :]
    scores = scores + m if mode == "add" else scores * m
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("nhts,nhsd->nhtd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _make_masked_attention(mode: str, interpret: bool):
    @jax.custom_vjp
    def attn(q, k, v, mask_row):
        return _masked_attention_impl(q, k, v, mask_row, mode=mode,
                                      interpret=interpret)

    def fwd(*args):
        return attn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(
            lambda *a: _xla_masked_attention(*a, mode=mode), *args)
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn


def masked_attention(
    q: jax.Array,  # <N, h, T, D>
    k: jax.Array,
    v: jax.Array,
    mask_row: jax.Array,  # <N, T> float; bias values (add) or 0/1 (mul)
    mode: str = "add",
    interpret: bool = False,
) -> jax.Array:
    """Kernel forward + full-precision XLA custom_vjp backward (the fused
    kernels' convention — differentiating a raw pallas_call has no autodiff
    rule)."""
    from .attention_block import interpret_default

    interpret = interpret or interpret_default()
    return _make_masked_attention(mode, interpret)(q, k, v, mask_row)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def _masked_attention_impl(
    q: jax.Array,  # <N, h, T, D>
    k: jax.Array,
    v: jax.Array,
    mask_row: jax.Array,  # <N, T> float; bias values (add) or 0/1 (mul)
    mode: str = "add",
    interpret: bool = False,
) -> jax.Array:
    """-> <N, h, T, D> attention output with the mask fused in-kernel.

    Measured variants on 1x v5e (ViT-B/224 fw_final, XLA path = 795 expl/s):
    v1 per-(row,head) grid, T padded to 128-quantum: 606; v2 per-row grid
    with heads unrolled, padded: 668; v3 unpadded full-size blocks: 552
    (unaligned [197, d] tiles cost more than the HBM padding copies).  This
    is v2.  XLA still wins because it fuses the QKV projections and head
    transpose into its attention while pallas_call forms a fusion barrier —
    a winning kernel must swallow the projections too (future work)."""
    n, h, t, d = q.shape
    t_pad = max(_round_up(t, 128), 128)
    pad = t_pad - t
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask_row = jnp.pad(mask_row, ((0, 0), (0, pad)))
    # <N, 1, T_pad>: TPU block shapes need two trailing dims
    mask_row = mask_row.astype(jnp.float32)[:, None, :]

    kernel = functools.partial(
        _attn_kernel, mode=mode, t_real=t, scale=1.0 / math.sqrt(d),
        n_heads=h,
    )
    qkv_spec = pl.BlockSpec(
        (1, h, t_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec, qkv_spec, qkv_spec,
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, t_pad, d), q.dtype),
        interpret=interpret,
    )(mask_row, q, k, v)
    return out[:, :, :t, :]


def pallas_available() -> bool:
    """True when the *effective default device* is a TPU — honors
    `jax.default_device(cpu)` contexts (weight surgery runs on host where
    compiled Pallas is unsupported)."""
    try:
        default = jax.config.jax_default_device
        if default is not None:
            return getattr(default, "platform", "") in ("tpu", "axon")
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
