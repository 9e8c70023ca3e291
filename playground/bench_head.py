"""TPU micro-probe: explainer-head and ladder-layer variants in isolation.

    python playground/bench_head.py --probe head   # head MLP paths
    python playground/bench_head.py --probe ladder # one ladder layer paths
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

B, T, HIN, INTER, C = 256, 197, 96, 3072, 10
ITERS = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=["head", "ladder"], default="head")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)

    def fence(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timed(name, fn, *a):
        out = fn(*a)
        fence(out)
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*a)
        fence(out)
        us = (time.perf_counter() - t0) / ITERS / B * 1e6
        print(json.dumps({"probe": name, "us_per_img": round(us, 2)}),
              flush=True)

    if args.probe == "head":
        from autognothi_tpu.ops.head_block import explainer_head_block

        x = jnp.asarray(rng.randn(B, T, HIN), jnp.bfloat16) * 0.5
        w1 = jnp.asarray(rng.randn(INTER, HIN), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((INTER,), jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(INTER, INTER), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((INTER,), jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(C, INTER), jnp.bfloat16) * 0.02
        b3 = jnp.zeros((C,), jnp.bfloat16)
        ln = jnp.ones((HIN,), jnp.bfloat16), jnp.zeros((HIN,), jnp.bfloat16)

        def mk(use_pallas, quant):
            return jax.jit(lambda xx: explainer_head_block(
                xx, w1, b1, w2, b2, w3, b3, ln[0], ln[1], 1e-5,
                use_pallas=use_pallas, quant=quant))

        timed("head_kernel_int8", mk(True, "int8"), x)
        timed("head_xla_bf16", mk(False, "none"), x)
    else:
        from autognothi_tpu.ops.attention_block import attention_block
        from autognothi_tpu.ops.mlp_block import mlp_block

        side = jnp.asarray(rng.randn(B, T, HIN), jnp.bfloat16) * 0.5
        mask = jnp.ones((B, T), jnp.float32)
        ws = [jnp.asarray(rng.randn(HIN, HIN), jnp.bfloat16) * 0.05
              for _ in range(4)]
        bs = [jnp.zeros((HIN,), jnp.bfloat16) for _ in range(4)]
        w1 = jnp.asarray(rng.randn(4 * HIN, HIN), jnp.bfloat16) * 0.05
        b1 = jnp.zeros((4 * HIN,), jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(HIN, 4 * HIN), jnp.bfloat16) * 0.05
        b2 = jnp.zeros((HIN,), jnp.bfloat16)
        ln = jnp.ones((HIN,), jnp.bfloat16), jnp.zeros((HIN,), jnp.bfloat16)

        def layer(use_pallas, quant, group=1):
            def f(s):
                h = attention_block(
                    s, mask, (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                              ws[3], bs[3]),
                    12, "mul", use_pallas=use_pallas,
                    ln=(ln[0], ln[1], 1e-12), ln_position="prologue",
                    quant=quant, group=group)
                return mlp_block(h, w1, b1, w2, b2, use_pallas=use_pallas,
                                 ln=(ln[0], ln[1], 1e-12),
                                 ln_position="prologue", quant=quant,
                                 group=group)
            return jax.jit(f)

        timed("ladder_kernel_int8_g1", layer(True, "int8"), side)
        for g in (4, 8, 16):
            timed(f"ladder_kernel_int8_g{g}", layer(True, "int8", g), side)
        timed("ladder_xla_bf16", layer(False, "none"), side)


if __name__ == "__main__":
    main()
