"""Microbench: unrolled per-head loop vs head-batched dot_general inside a
Pallas TPU kernel, at ViT-B fused-attention shapes.  Decides whether the
fused attention block (ops/attention_block.py) should switch its inner
attention to a single batched contraction.

Run on the real chip:  python playground/bench_attn_variants.py

Result (2026-08-16, 1x v5e): the head-batched dot_general FAILS TO LOWER in
Mosaic (batch dims unsupported: remote_compile HTTP 500); the unrolled loop
runs at 2.057 ms for B=64/T=256/H=768/12 heads.  Conclusion: keep the
unrolled per-head loop in ops/attention_block.py.
"""

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

T, H, HEADS = 256, 768, 12
D = H // HEADS
BATCH = 64


def _loop_kernel(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    scale = 1.0 / math.sqrt(D)
    parts = []
    for head in range(HEADS):
        sl = slice(head * D, (head + 1) * D)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        parts.append(jax.lax.dot_general(
            probs, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q.dtype))
    o_ref[0] = jnp.concatenate(parts, axis=-1)


def _batched_kernel(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    scale = 1.0 / math.sqrt(D)
    q3 = q.reshape(T, HEADS, D).transpose(1, 0, 2)  # <heads, T, D>
    k3 = k.reshape(T, HEADS, D).transpose(1, 0, 2)
    v3 = v.reshape(T, HEADS, D).transpose(1, 0, 2)
    scores = jax.lax.dot_general(
        q3, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # <heads, T, T>
    probs = jax.nn.softmax(scores, axis=-1).astype(v3.dtype)
    ctx = jax.lax.dot_general(
        probs, v3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # <heads, T, D>
    o_ref[0] = ctx.transpose(1, 0, 2).reshape(T, H).astype(q.dtype)


def build(kernel):
    spec = pl.BlockSpec((1, T, H), lambda i: (i, 0, 0))
    return jax.jit(functools.partial(
        pl.pallas_call(
            kernel,
            grid=(BATCH,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((BATCH, T, H), jnp.bfloat16),
        ),
    ))


def fence(x):
    np.asarray(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=30):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(BATCH, T, H) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.randn(BATCH, T, H) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rng.randn(BATCH, T, H) * 0.05, jnp.bfloat16)

    loop = build(_loop_kernel)
    out_loop = loop(q, k, v)
    try:
        batched = build(_batched_kernel)
        out_b = batched(q, k, v)
    except Exception as err:
        print(f"batched variant failed to lower: {type(err).__name__}: "
              f"{str(err).splitlines()[0]}")
        print(f"loop: {timeit(loop, q, k, v):.3f} ms")
        sys.exit(0)
    diff = float(jnp.max(jnp.abs(
        out_loop.astype(jnp.float32) - out_b.astype(jnp.float32))))
    print(f"max abs diff: {diff:.2e}")
    print(f"loop:    {timeit(loop, q, k, v):.3f} ms")
    print(f"batched: {timeit(batched, q, k, v):.3f} ms")


if __name__ == "__main__":
    main()
