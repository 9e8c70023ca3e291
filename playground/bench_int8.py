"""Int8 MXU probe on the real chip: is an int8 x int8 -> int32 matmul
actually ~2x bf16 throughput here (v5e nominal: 394 TOPS int8 vs 197 TFLOP/s
bf16), both via XLA and inside a Pallas kernel with in-kernel dynamic
activation quantization?  Decides whether the serving path grows an int8
mode (VERDICT r1 next-step #4).

Run on TPU:  python playground/bench_int8.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 25216, 768, 3072  # the ViT-B up-projection at B=128 coalitions
ITERS = 20


def fence(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timed(fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    return dt, 2.0 * M * K * N / dt / 1e12


def main():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(K, N).astype(np.float32), jnp.bfloat16)
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)

    dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.float32)), a, b)
    print(f"XLA bf16->f32   : {dt*1e3:7.2f} ms  {tf:6.1f} TFLOP/s")

    dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.int32)), a8, b8)
    print(f"XLA int8->i32   : {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")

    # int8 matmul + dequant to f32 (the realistic serving op)
    sa = jnp.ones((M, 1), jnp.float32) * 0.01
    sb = jnp.ones((1, N), jnp.float32) * 0.02

    def deq(x, y, sx, sy):
        acc = jnp.dot(x, y, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * sy

    dt, tf = timed(jax.jit(deq), a8, b8, sa, sb)
    print(f"XLA int8+dequant: {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")

    # Pallas: per-row dynamic quant of bf16 activations + int8 weights
    TM = 512

    def qkernel(a_ref, b8_ref, sb_ref, o_ref):
        x = a_ref[...].astype(jnp.float32)  # <TM, K>
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True) + 1e-8
        q = jnp.round(x * (127.0 / amax)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, b8_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[...] = (acc.astype(jnp.float32)
                      * (amax / 127.0) * sb_ref[...]).astype(o_ref.dtype)

    def pallas_q(a, b8, sb):
        return pl.pallas_call(
            qkernel,
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        )(a, b8, sb)

    try:
        dt, tf = timed(jax.jit(pallas_q), a, b8, sb)
        print(f"Pallas dynq int8: {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")
    except Exception as e:
        print(f"Pallas dynq int8 FAILED: {type(e).__name__}: {e}")

    # Pallas bf16 reference with the same blocking
    def bkernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def pallas_b(a, b):
        return pl.pallas_call(
            bkernel,
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        )(a, b)

    try:
        dt, tf = timed(jax.jit(pallas_b), a, b)
        print(f"Pallas bf16     : {dt*1e3:7.2f} ms  {tf:6.1f} TFLOP/s")
    except Exception as e:
        print(f"Pallas bf16 FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
