"""Int4 MXU probe on the real chip: does an int4 matmul beat the measured
~166 T/s int8 rate cap at model shapes (K=768 contractions)?  If yes, a
W4A8/W4A4 serving mode is a direct lever on the trunk time (218 us/img at
B=256) that bounds every final's throughput (BASELINE.md r2/r3 ceiling
analyses).  If no, the int8 path stands as this chip's practical limit.

Also probes the dot rate vs K (768 / 1536 / 3072) to confirm the cap is a
per-K-step pipeline effect rather than a bandwidth artifact, and a Pallas
variant that keeps int4 weights VMEM-resident and widens in-kernel.

Run on TPU:  python playground/bench_int4.py
"""

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


def timed(fn, *args, m=M, k=K, n=N):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    return dt, 2.0 * m * k * n / dt / 1e12


def main():
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)

    dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.int32)), a8, b8)
    print(f"XLA int8xint8   K=768 : {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")

    # --- int4 via XLA (if the dtype lowers at all on this backend) ---
    try:
        a4 = jnp.clip(a8, -8, 7).astype(jnp.int4)
        b4 = jnp.clip(b8, -8, 7).astype(jnp.int4)
        dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.int32)), a4, b4)
        print(f"XLA int4xint4   K=768 : {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")
    except Exception as e:
        print(f"XLA int4xint4 FAILED: {type(e).__name__}: {str(e)[:200]}")

    try:
        a4 = jnp.clip(a8, -8, 7).astype(jnp.int4)
        dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.int32)), a4, b8)
        print(f"XLA int4xint8   K=768 : {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")
    except Exception as e:
        print(f"XLA int4xint8 FAILED: {type(e).__name__}: {str(e)[:200]}")

    # --- big-square int4 (does the chip have a 2x int4 MXU mode at all?) ---
    S = 8192
    sa8 = jnp.asarray(rng.randint(-127, 128, (S, S)), jnp.int8)
    sb8 = jnp.asarray(rng.randint(-127, 128, (S, S)), jnp.int8)
    dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.int32)), sa8, sb8, m=S, k=S, n=S)
    print(f"XLA int8 8192^3       : {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")
    try:
        sa4 = jnp.clip(sa8, -8, 7).astype(jnp.int4)
        sb4 = jnp.clip(sb8, -8, 7).astype(jnp.int4)
        dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.int32)), sa4, sb4, m=S, k=S, n=S)
        print(f"XLA int4 8192^3       : {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")
    except Exception as e:
        print(f"XLA int4 8192^3 FAILED: {type(e).__name__}: {str(e)[:200]}")

    # --- dot rate vs K at int8 (is the K=768 cap a K-pipeline effect?) ---
    for k in (768, 1536, 3072):
        ak = jnp.asarray(rng.randint(-127, 128, (M, k)), jnp.int8)
        bk = jnp.asarray(rng.randint(-127, 128, (k, N)), jnp.int8)
        dt, tf = timed(jax.jit(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.int32)), ak, bk, k=k)
        print(f"XLA int8 K={k:<5}      : {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")

    # --- Pallas: int4 weights VMEM-resident, widened to int8 in-kernel ---
    TM = 512

    def k44(a_ref, b_ref, o_ref):
        acc = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = acc

    def pallas_dot(a, b):
        return pl.pallas_call(
            k44,
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a, b)

    try:
        a4 = jnp.clip(a8, -8, 7).astype(jnp.int4)
        b4 = jnp.clip(b8, -8, 7).astype(jnp.int4)
        dt, tf = timed(jax.jit(pallas_dot), a4, b4)
        print(f"Pallas int4xint4 K=768: {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")
    except Exception as e:
        print(f"Pallas int4xint4 FAILED: {type(e).__name__}: {str(e)[:200]}")

    def k_widen(a_ref, b_ref, o_ref):
        w = b_ref[...].astype(jnp.int8)  # widen int4 -> int8 in VMEM
        acc = jax.lax.dot_general(
            a_ref[...], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = acc

    def pallas_widen(a, b):
        return pl.pallas_call(
            k_widen,
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a, b)

    try:
        b4 = jnp.clip(b8, -8, 7).astype(jnp.int4)
        dt, tf = timed(jax.jit(pallas_widen), a8, b4)
        print(f"Pallas i8 x widened-i4: {dt*1e3:7.2f} ms  {tf:6.1f} TOP/s")
    except Exception as e:
        print(f"Pallas widen FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
