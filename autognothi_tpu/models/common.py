"""Shared functional building blocks for the transformer families.

Parameters are *flat* dicts mapping torch-style dotted names to arrays —
linear weights keep the torch ``(out, in)`` layout so HF checkpoint import
and the reference's conversion rules carry over unchanged (the apply fns
contract against the trailing axis with ``dot_general``, which XLA maps onto
the MXU identically either way).

Per-layer encoder weights are *stored* flat (surgery-friendly) and *stacked*
at trace time into leading-axis arrays consumed by ``lax.scan`` — one
compiled layer body regardless of depth, which keeps compile times flat for
BERT-large and lets the coalition-vmapped forward share code.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

__all__ = [
    "Params",
    "dense",
    "layer_norm",
    "gelu",
    "dropout",
    "split_heads",
    "merge_heads",
    "additive_mask_bias",
    "self_attention",
    "init_linear",
    "init_layer_norm",
    "init_embedding",
    "subdict",
    "add_prefix",
    "stack_layer_params",
    "cast_tree",
    "dense_serving",
]


def dense(x: jax.Array, w: jax.Array, b: Optional[jax.Array]) -> jax.Array:
    """x @ w.T + b with w in torch (out, in) layout.  bf16 inputs accumulate
    in fp32 on the MXU and cast back down."""
    y = jax.lax.dot_general(
        x, w.astype(x.dtype), (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _dense_int8_raw(x: jax.Array, w: jax.Array, b: Optional[jax.Array]) -> jax.Array:
    # the kernels' single quantization recipe (ops.mlp_block) applied to a
    # torch-(out, in)-layout dense: per-out-channel weights, per-row acts
    from ..ops.mlp_block import _quant_rows, quant_cols

    q, s = _quant_rows(x.astype(jnp.float32))
    wq, ws = quant_cols(w.T)  # (in, out) int8 + <1, out> scale
    acc = jax.lax.dot_general(
        q, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s * ws.reshape(-1)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


@jax.custom_vjp
def _dense_int8(x, w, b):
    return _dense_int8_raw(x, w, b)


def _dense_int8_fwd(x, w, b):
    return _dense_int8(x, w, b), (x, w, b)


def _dense_int8_bwd(res, g):
    # same convention as the fused block kernels: forward runs quantized,
    # backward differentiates the full-precision dense (round() would
    # otherwise zero the gradients)
    _, vjp = jax.vjp(dense, *res)
    return vjp(g)


_dense_int8.defvjp(_dense_int8_fwd, _dense_int8_bwd)


def dense_serving(x: jax.Array, w: jax.Array, b: Optional[jax.Array]) -> jax.Array:
    """`dense`, but rides the W8A8 int8 MXU path when the serving quant mode
    is active (quant_mode()=="int8").  Used by the explainer MLP heads —
    the hot chunk of fw_final that runs outside the fused block kernels
    (measured ~50 us/img of the 700 us ViT-B explanation at B=256).  NOT
    used by the ViT patch projection: quantizing it measured -2.2% (see
    vit_patch_embed).

    Per-out-channel int8 weights + dynamic per-token int8 activations; the
    int32 accumulator is dequantized and bias-added in f32, and XLA fuses
    the dequant into the consumer (no int32 HBM materialization).  If
    differentiated (training with AUTOGNOTHI_INT8=1), the custom_vjp
    backward differentiates the full-precision dense, mirroring the fused
    kernels' convention."""
    if quant_mode() != "int8":
        return dense(x, w, b)
    return _dense_int8(x, w, b)


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with fp32 statistics — under bf16 activations the mean/var
    math runs in float32 and the result is cast back (free when fp32)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = normed * w.astype(jnp.float32) + b.astype(jnp.float32)
    return out.astype(dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def dropout(
    key: Optional[jax.Array], x: jax.Array, rate: float, deterministic: bool
) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    assert key is not None, "dropout in train mode needs an rng key"
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """<..., T, H> -> <..., n_heads, T, head_dim>."""
    *lead, t, h = x.shape
    x = x.reshape(*lead, t, n_heads, h // n_heads)
    return jnp.swapaxes(x, -3, -2)


def merge_heads(x: jax.Array) -> jax.Array:
    """<..., n_heads, T, head_dim> -> <..., T, H>."""
    x = jnp.swapaxes(x, -3, -2)
    *lead, t, n, d = x.shape
    return x.reshape(*lead, t, n * d)


def additive_mask_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """HF-style extended attention mask: <B, T> 0/1 -> <B, 1, 1, T> bias of
    0 (keep) / finfo.min (drop), added to raw attention scores."""
    bias = (1.0 - mask.astype(dtype)) * jnp.finfo(dtype).min
    return bias[:, None, None, :]


_PALLAS_OVERRIDE: list = []


class pallas_override:
    """Trace-time scope forcing pallas_mode() — same mechanics as
    quant_override.  Used to pin a traced region to the XLA path ("0")
    when its operands are GSPMD-sharded: a pallas_call under plain jit
    with sharded operands is REPLICATED behind all-gathers (custom calls
    have no partitioning rule; measured in tests/test_pallas_gspmd.py),
    so multi-device regions must either run XLA (GSPMD partitions it
    properly) or be wrapped in shard_map (parallel.mesh.sharded_serving_fn,
    where the kernels stay on and run per-shard)."""

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        _PALLAS_OVERRIDE.append(self.mode)
        return self

    def __exit__(self, *exc):
        _PALLAS_OVERRIDE.pop()


def pallas_mode() -> str:
    """Pallas dispatch mode (AUTOGNOTHI_PALLAS, read per call at trace time):
    "auto" (default): the fused attention-block kernel on TPU platforms,
        pure XLA elsewhere;
    "0" pure XLA — the numerical reference;
    "1" attention-only kernel (ops/flash_attention.py; measured slower than
        XLA at ViT-B shapes — kept for comparison);
    "2" fused attention-block kernel (ops/attention_block.py: QKV + masked
        attention + output projection + residual in one kernel; measured
        889.3 vs XLA 795.7 expl/s on ViT-B/224 fw_final, 1x v5e).

    Off-TPU, an explicit "1"/"2" still engages when
    AUTOGNOTHI_PALLAS_INTERPRET=1 (the ops run their kernels in Pallas
    interpret mode) — this is how CI exercises the kernel dispatch path and
    the kernel x GSPMD composition on the virtual CPU mesh."""
    if _PALLAS_OVERRIDE:
        flag = _PALLAS_OVERRIDE[-1]
    else:
        flag = os.environ.get("AUTOGNOTHI_PALLAS", "auto")
    if flag == "0":
        return "0"
    from ..ops.flash_attention import pallas_available

    if not pallas_available():
        if flag in ("1", "2") and pallas_interpret():
            return flag
        return "0"
    if flag in ("1", "2"):
        return flag
    return "2"  # auto


def narrow_group(hidden: int, batch) -> int:
    """Images per kernel grid step for narrow (<128-wide) layers — the LTT
    96-dim ladders.  Their per-image compute is tiny, so the per-grid-step
    overhead dominates; batching G images per step amortizes it (identical
    math: projections batch over rows, attention stays per-image).
    AUTOGNOTHI_NARROW_GROUP (trace-time, default 1 = off).  MEASURED (r3,
    LTT breakdown): group=8 made the first ladder +107 us/img vs +90
    ungrouped — the per-image grid pipelines better than a per-image loop
    inside a bigger block; knob kept for other shapes.  Wide layers always
    run one image per step (r2: the K=768 dot rate is M-independent)."""
    if hidden >= 128 or not isinstance(batch, int):
        return 1
    g = max(1, int(os.environ.get("AUTOGNOTHI_NARROW_GROUP", "1")))
    while g > 1 and batch % g != 0:
        g //= 2
    return g


def pallas_interpret() -> bool:
    """AUTOGNOTHI_PALLAS_INTERPRET=1 makes the fused-block ops default to
    Pallas interpret mode (runs anywhere, numerically identical modulo the
    in-kernel erf approximation) — CI coverage for the kernel path."""
    return os.environ.get("AUTOGNOTHI_PALLAS_INTERPRET") == "1"


def _pallas_attention_enabled() -> bool:
    return pallas_mode() == "1"


def fused_dims_ok(hidden: int) -> bool:
    """Width floor for the fused block kernels (trace-time).

    AUTOGNOTHI_FUSED_MIN_HIDDEN (default 0: kernels at every width).
    MEASURED (r3, LTT ViT-B fw_final @B256, 1x v5e): routing the 96-dim
    side ladders to XLA (floor 128) yields 1274 expl/s vs 2197 with the
    fused kernels — XLA materializes the ladders' <B, 12, T, T> scores to
    HBM on this bandwidth-bound chip, which costs far more than the
    kernels' sub-128-lane padding waste.  The floor stays as an escape
    hatch for shapes where Mosaic mis-handles narrow layers."""
    floor = int(os.environ.get("AUTOGNOTHI_FUSED_MIN_HIDDEN", "0"))
    return hidden >= floor


_QUANT_OVERRIDE: list = []


def quant_mode() -> str:
    """AUTOGNOTHI_INT8=1 switches the fused block kernels to the W8A8
    serving path: per-out-channel int8 weights + dynamic per-token int8
    activations on the projections/MLP matmuls (int8 MXU is ~1.8x bf16 on
    this chip — playground/bench_int8.py).  Forward-only: backward (rarely
    taken through the kernels in serving) recomputes in bf16.  Off by
    default; faithfulness drift is measured in BASELINE.md before use.
    The env var is read per call (like the sibling knobs), so setting it
    after import works — but an already-traced jit will not retrace."""
    if _QUANT_OVERRIDE:
        mode = _QUANT_OVERRIDE[-1]
        return mode if mode != "int8" or pallas_mode() == "2" else "none"
    return ("int8" if os.environ.get("AUTOGNOTHI_INT8", "0") == "1"
            and pallas_mode() == "2" else "none")


class quant_override:
    """Trace-time scope forcing the fused kernels' quant mode.  quant_mode()
    is consulted while Python traces the model, so wrapping a sub-graph
    (e.g. the frozen no-grad teacher sweep inside the explainer train step)
    quantizes exactly that region — the differentiated explainer forward
    outside the scope stays bf16, keeping its custom_vjp gradients exact.

    CAVEAT: the override only takes effect when the enclosing jit TRACES.
    Calling an already-traced jitted function under a different override
    does not retrace (jax caches by shapes/dtypes, not this flag) — build a
    fresh jit per quant configuration, as make_explainer_train_step does."""

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        _QUANT_OVERRIDE.append(self.mode)
        return self

    def __exit__(self, *exc):
        _QUANT_OVERRIDE.pop()


def self_attention(
    h: jax.Array,
    wq: jax.Array,
    bq: jax.Array,
    wk: jax.Array,
    bk: jax.Array,
    wv: jax.Array,
    bv: jax.Array,
    n_heads: int,
    mask: Optional[jax.Array],
    mask_mode: str,
    attn_dropout: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Multi-head self attention over <B, T, H>.

    mask_mode "additive": `mask` is a <B, 1, 1, T> bias added to scores
    (BERT semantics, /root/reference/models/vanilla_bert.py:521-523).
    mask_mode "multiplicative": `mask` is <B, T> 0/1 *multiplied* into the
    raw scores before softmax (the ViT quirk to reproduce bit-for-bit,
    /root/reference/models/vanilla_vit.py:448-451).

    On TPU the masked attention runs as a fused Pallas kernel (scores +
    mask + softmax + PV entirely in VMEM) whenever attention dropout is
    inactive; the XLA path below is the fallback and the numerical
    reference.
    """
    head_dim = h.shape[-1] // n_heads
    q = split_heads(dense(h, wq, bq), n_heads)
    k = split_heads(dense(h, wk, bk), n_heads)
    v = split_heads(dense(h, wv, bv), n_heads)

    no_dropout = deterministic or attn_dropout == 0.0
    if (
        mask is not None and no_dropout and h.ndim == 3
        and _pallas_attention_enabled()
    ):
        from ..ops.flash_attention import masked_attention

        if mask_mode == "additive":
            row = mask[:, 0, 0, :]
            ctx = masked_attention(q, k, v, row, mode="add")
        else:
            ctx = masked_attention(q, k, v, mask, mode="mul")
        return merge_heads(ctx)

    # scores accumulate in fp32 (MXU-native); softmax in fp32 for stability
    scores = jnp.einsum(
        "...htd,...hsd->...hts", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(head_dim)
    if mask is not None:
        if mask_mode == "additive":
            scores = scores + mask.astype(scores.dtype)
        elif mask_mode == "multiplicative":
            scores = scores * mask[..., None, None, :].astype(scores.dtype)
        else:
            raise ValueError(f"unknown mask_mode {mask_mode!r}")
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    probs = dropout(dropout_key, probs, attn_dropout, deterministic)
    ctx = jnp.einsum("...hts,...hsd->...htd", probs, v)
    return merge_heads(ctx)


# ---------------------------------------------------------------- init


def init_linear(key: jax.Array, d_out: int, d_in: int) -> Tuple[jax.Array, jax.Array]:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(d_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (d_out, d_in), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return w, b


def init_layer_norm(d: int) -> Tuple[jax.Array, jax.Array]:
    return jnp.ones((d,)), jnp.zeros((d,))


def init_embedding(key: jax.Array, n: int, d: int) -> jax.Array:
    """torch nn.Embedding default init: N(0, 1)."""
    return jax.random.normal(key, (n, d))


# ---------------------------------------------------------- dict helpers


def subdict(params: Params, prefix: str) -> Params:
    """All entries under `prefix`, with the prefix stripped."""
    return {k[len(prefix) :]: v for k, v in params.items() if k.startswith(prefix)}


def add_prefix(params: Params, prefix: str) -> Params:
    return {prefix + k: v for k, v in params.items()}


def stack_layer_params(
    params: Params, prefix: str, n_layers: int, dtype=None
) -> Params:
    """Gather ``{prefix}.{i}.{suffix}`` entries for i in [0, n_layers) and
    stack each suffix along a new leading axis — the `xs` of a lax.scan."""
    out: Params = {}
    suffixes: List[str] = []
    head = f"{prefix}.0."
    for k in params:
        if k.startswith(head):
            suffixes.append(k[len(head) :])
    for suffix in suffixes:
        leaves = [params[f"{prefix}.{i}.{suffix}"] for i in range(n_layers)]
        stacked = jnp.stack(leaves, axis=0)
        if dtype is not None:
            stacked = stacked.astype(dtype)
        out[suffix] = stacked
    return out


def maybe_remat(body):
    """Wrap a scan body in jax.checkpoint when AUTOGNOTHI_REMAT=1 —
    trades recompute for activation memory on deep/large models
    (per-layer rematerialization, the standard transformer policy)."""
    if os.environ.get("AUTOGNOTHI_REMAT") == "1":
        return jax.checkpoint(body)
    return body


def cast_tree(params: Params, dtype) -> Params:
    return {k: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v
            for k, v in params.items()}
