"""Decompose the BERT@512 fused attention block: where does the time go
between the per-head d=64 score/PV dots and the f32 softmax, and what do
layout/precision variants buy?

MEASURED CONCLUSION (r2, 1x v5e via tunnel) — negative result, recorded so
it isn't re-attempted: at <B=8, T=512, H=768, 12 heads> the standalone
kernel runs ~36 us/seq/layer-equivalent and NO ablation moves it beyond
the tunnel's run-to-run noise (~10-14%): removing the score dots -7%,
removing softmax -3.5%, removing PV ~0, bf16 softmax +4%, int8 PV +12%
(quant passes cost more than the d=64 dot saves), a single full-width
d=768 attention with identical FLOPs and zero slicing +2%, and the
(12,T,64) head-major relayout does not compile (Mosaic: "unsupported
shape cast" on <512x12x64> reshape).  The probe itself is ~40% DMA-bound
(q,k,v,ctx per call); compute is spread thin across softmax/dots with no
dominant term.  BERT@512 attention-core gains below ~15% are not
measurable on this setup; the remaining credible lever is structural
(e.g. fusing attention+MLP per layer to halve residual DMA), not
score-path math.

Run on TPU:  python playground/bench_bert_attn.py
"""

from __future__ import annotations

import functools
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, NH = 8, 512, 768, 12
D = H // NH
ITERS = 10


def _heads_body(q, k, v, variant: str):
    """q,k,v <T,H> bf16 -> ctx <T,H>; per-head loop with `variant` ablation."""
    scale = 1.0 / math.sqrt(D)
    if variant == "onehead":
        # same total FLOPs as 12 heads of d=64, but ONE full-width d=768
        # attention: no 64-lane slicing, no concat.  Math differs (it's a
        # layout-cost probe, not a drop-in).
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q.dtype)
    if variant == "heads3d":
        # one relayout per tensor (T,12,64)->(12,T,64); per-head access is
        # then a free leading-dim index instead of a 64-lane column slice
        q3 = jnp.swapaxes(q.reshape(T, NH, D), 0, 1)
        k3 = jnp.swapaxes(k.reshape(T, NH, D), 0, 1)
        v3 = jnp.swapaxes(v.reshape(T, NH, D), 0, 1)
        parts = []
        for h in range(NH):
            s = jax.lax.dot_general(
                q3[h], k3[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            parts.append(jax.lax.dot_general(
                probs, v3[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(q.dtype))
        ctx3 = jnp.stack(parts, axis=0)  # <12, T, 64>
        return jnp.swapaxes(ctx3, 0, 1).reshape(T, H)
    parts = []
    for h in range(NH):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        if variant == "noscores":
            probs = jnp.full((T, T), 1.0 / T, q.dtype)
            parts.append(jax.lax.dot_general(
                probs, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(q.dtype))
            continue
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if variant == "nosoftmax":
            probs = (s * (1.0 / T)).astype(vh.dtype)
        elif variant == "softmax_bf16":
            s16 = s.astype(jnp.bfloat16)
            m = jnp.max(s16, axis=-1, keepdims=True)
            e = jnp.exp((s16 - m).astype(jnp.bfloat16))
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vh.dtype)
        else:
            probs = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        if variant == "nopv":
            parts.append(probs[:, :D])
        elif variant == "pv_int8":
            # probs in [0,1]: fixed scale 1/127; vh per-col dynamic int8
            p8 = jnp.round(probs.astype(jnp.float32) * 127.0).astype(jnp.int8)
            vmax = jnp.max(jnp.abs(vh.astype(jnp.float32)), axis=0,
                           keepdims=True) + 1e-8
            v8 = jnp.round(vh.astype(jnp.float32) * (127.0 / vmax)
                           ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            parts.append((acc.astype(jnp.float32)
                          * (vmax / (127.0 * 127.0))).astype(q.dtype))
        else:
            parts.append(jax.lax.dot_general(
                probs, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(q.dtype))
    return jnp.concatenate(parts, axis=-1)


CHAIN = 12  # applications chained inside ONE jit: tunnel dispatch overhead
# (~2-3 ms/call) would otherwise swamp the ~0.1 ms/call of real work


def make_kernel(variant: str):
    def kern(q_ref, k_ref, v_ref, o_ref):
        o_ref[0] = _heads_body(q_ref[0], k_ref[0], v_ref[0], variant)

    spec = pl.BlockSpec((1, T, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def call(q, k, v):
        return pl.pallas_call(
            kern, grid=(B,), in_specs=[spec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, T, H), jnp.bfloat16),
        )(q, k, v)

    @jax.jit
    def run(q, k, v):
        for _ in range(CHAIN):
            q = call(q, k, v)  # feed ctx back as q: dependent chain
        return q

    return run


def main() -> None:
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(B, T, H).astype(np.float32) * 0.3,
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    def fence(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    base = None
    for variant in ("full", "onehead", "heads3d"):
        try:
            run = make_kernel(variant)
            out = run(q, k, v)
            fence(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = run(q, k, v)
            fence(out)
            dt = (time.perf_counter() - t0) / ITERS / CHAIN
            if variant == "full":
                base = dt
            rel = f"  ({dt/base*100:5.1f}% of full)" if base else ""
            print(f"{variant:14s} {dt*1e3:8.3f} ms/layer-eqv{rel}",
                  flush=True)
        except Exception as e:  # pragma: no cover
            print(f"{variant:14s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
