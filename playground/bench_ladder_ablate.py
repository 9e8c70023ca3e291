"""TPU probe: WHERE the LTT ladder's ~65 us/img/branch goes.

Runs a standalone 12-layer, 2-branch ladder stack at flagship dims
(T=197, trunk 768, s_hidden 96, 12 heads, B=256) and ablates one stage of
the in-kernel attention at a time via AUTOGNOTHI_LADDER_ABLATE (read at
trace time inside ops/ladder_block._ctx_stacked):

    full   — the production stacked math
    noqk   — scores dot replaced by a VPU broadcast
    nosm   — softmax replaced by a scale
    nopv   — PV dot replaced by a lane slice
    noqk,nosm,nopv — only map/QKV/proj/MLP denses + LN remain

Each executable chains all 12 layers so per-call compute (~35 ms) dwarfs
the ~3 ms tunnel dispatch.  Differences vs `full` price each stage.

    python playground/bench_ladder_ablate.py [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

WARMUP = 3
ITERS = 10
VARIANTS = ["full", "noqk", "nosm", "nopv", "noqk,nosm,nopv",
            "nomap", "noqkv", "noproj", "nomlp", "noln"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--variants", type=str, default=",".join(VARIANTS),
                    help="comma list; repeats allowed (A/B pairing)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    t, hidden, s_hidden, heads = 197, 768, 96, 12
    b = args.batch
    rng = np.random.RandomState(0)

    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05,
                           jnp.bfloat16)

    def branch():
        return dict(
            map_w=mk(s_hidden, hidden), map_b=mk(s_hidden),
            ln1_w=mk(s_hidden) + 1, ln1_b=mk(s_hidden),
            wq=mk(s_hidden, s_hidden), bq=mk(s_hidden),
            wk=mk(s_hidden, s_hidden), bk=mk(s_hidden),
            wv=mk(s_hidden, s_hidden), bv=mk(s_hidden),
            wo=mk(s_hidden, s_hidden), bo=mk(s_hidden),
            ln2_w=mk(s_hidden) + 1, ln2_b=mk(s_hidden),
            w1=mk(4 * s_hidden, s_hidden), b1=mk(4 * s_hidden),
            w2=mk(s_hidden, 4 * s_hidden), b2=mk(s_hidden),
        )

    layers = [[branch(), branch()] for _ in range(args.layers)]
    h = mk(b, t, hidden)
    sides = (mk(b, t, s_hidden), mk(b, t, s_hidden))
    mask = jnp.ones((b, t), jnp.bfloat16)

    def fence(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def hybrid_run(hh, ss):
        """XLA fat denses + attention-core kernel (ladder_attention)."""
        from autognothi_tpu.ops import ladder_block as lb

        def ln(x, w, bias):
            x32 = x.astype(jnp.float32)
            mu = x32.mean(-1, keepdims=True)
            var = x32.var(-1, keepdims=True)
            return ((x32 - mu) * jax.lax.rsqrt(var + 1e-6) * w + bias
                    ).astype(x.dtype)

        ss = list(ss)
        for brs in layers:
            qkvs, xs = [], []
            for br, side in zip(brs, ss):
                mapped = hh @ br["map_w"].T + br["map_b"]
                x = side + jax.nn.gelu(mapped.astype(jnp.float32),
                                       approximate=False).astype(side.dtype)
                a = ln(x, br["ln1_w"], br["ln1_b"])
                qkvs.append((a @ br["wq"].T + br["bq"],
                             a @ br["wk"].T + br["bk"],
                             a @ br["wv"].T + br["bv"]))
                xs.append(x)
            ctxs = lb.ladder_attention(qkvs, mask, heads, "mul",
                                       use_pallas=True)
            nxt = []
            for br, x, ctx in zip(brs, xs, ctxs):
                x = x + (ctx @ br["wo"].T + br["bo"])
                y = ln(x, br["ln2_w"], br["ln2_b"])
                inter = jax.nn.gelu(
                    (y @ br["w1"].T + br["b1"]).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
                nxt.append(x + (inter @ br["w2"].T + br["b2"]))
            ss = nxt
        return ss[0] + ss[1]

    results = {}
    for variant in args.variants.split(","):
        os.environ["AUTOGNOTHI_LADDER_ABLATE"] = \
            "" if variant in ("full", "hybrid") else variant

        from autognothi_tpu.ops import ladder_block as lb

        def run(hh, ss):
            for brs in layers:
                ss = lb.ladder_block(hh, list(ss), mask, brs, heads, "mul",
                                     True, 1e-6, use_pallas=True)
            return ss[0] + ss[1]

        fn = jax.jit(hybrid_run if variant == "hybrid" else run)
        out = fn(h, sides)
        fence(out)
        for _ in range(WARMUP):
            fence(fn(h, sides))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            fence(fn(h, sides))
        dt = (time.perf_counter() - t0) / ITERS
        us = dt / b * 1e6
        results.setdefault(variant, []).append(us)
        print(json.dumps({"variant": variant,
                          "us_per_img_12l_2br": round(us, 1)}))

    if "full" in results:
        full = min(results["full"])
        print(json.dumps(
            {f"{v}_delta_us": round(full - min(r), 1)
             for v, r in results.items() if v != "full"}
            | {"full_us": round(full, 1)}))


if __name__ == "__main__":
    main()
