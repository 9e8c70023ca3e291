"""Flagship-scale probe of the AOT export path (pipeline/export.py).

Exports the flagship LTT ViT-B final — the bench.py headline program, fused
Pallas kernels + int8 — through jax.export at serving dims, reloads the
serialized artifact and times it against the live jit path in the same
process.  Validates that Mosaic custom-call serialization holds at the
headline scale and that the deployment artifact sustains the measured
serving rate (it should: both run the same executable math).

    python playground/bench_export.py [--batch 384] [--xla]

Fences with a device->host transfer (tunnel block_until_ready quirk —
BASELINE.md).  Artifact weights ride as runtime arguments (the int8
weight-quant chain must not constant-fold; BASELINE.md r3).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

WARMUP = 3
ITERS = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--xla", action="store_true",
                    help="export the portable XLA path instead of the "
                         "fused kernels")
    args = ap.parse_args()
    os.environ.setdefault("AUTOGNOTHI_INT8", "0" if args.xla else "1")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from __graft_entry__ import _flagship_ltt_cfg
    from autognothi_tpu.models.common import (
        cast_tree, pallas_override, quant_override)
    from autognothi_tpu.models.ltt_vit import init_ltt_vit_final
    from autognothi_tpu.recipes.ltt_vit import fw_final

    cfg = _flagship_ltt_cfg()
    params = cast_tree(init_ltt_vit_final(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    modes = ("0", "none") if args.xla else ("2", "int8")

    def fw(p, xs):
        with pallas_override(modes[0]), quant_override(modes[1]):
            probs, attr = fw_final(cfg, p, xs.astype(jnp.bfloat16))
        return probs.astype(jnp.float32), attr.astype(jnp.float32)

    pspecs = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params)
    spec = jax.ShapeDtypeStruct((args.batch, 3, 224, 224), jnp.float32)

    t0 = time.perf_counter()
    exported = jexport.export(jax.jit(fw), platforms=["tpu"])(pspecs, spec)
    blob = exported.serialize()
    t1 = time.perf_counter()
    art = pathlib.Path(tempfile.gettempdir()) / "flagship_ltt.jaxexp"
    art.write_bytes(blob)
    rt = jexport.deserialize(bytearray(art.read_bytes()))
    t2 = time.perf_counter()
    print(f"export+serialize {t1-t0:.1f}s, blob {len(blob)/1e6:.1f} MB, "
          f"deserialize {t2-t1:.1f}s", flush=True)

    xs = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), spec.shape, spec.dtype))
    dev_params = jax.device_put(params)

    def bench(run, label):
        out = None
        for _ in range(WARMUP):
            out = run(dev_params, xs)
        float(np.asarray(jnp.sum(out[0])))  # fence
        t = time.perf_counter()
        for _ in range(ITERS):
            out = run(dev_params, xs)
        float(np.asarray(jnp.sum(out[0])))
        dt = time.perf_counter() - t
        rate = args.batch * ITERS / dt
        print(f"{label}: {rate:.1f} expl/s", flush=True)
        return rate, [np.asarray(o) for o in out]

    live_rate, live_out = bench(jax.jit(fw), "live jit")
    art_rate, art_out = bench(rt.call, "exported artifact")
    d = max(np.abs(a - b).max() for a, b in zip(live_out, art_out))
    print(json.dumps({
        "metric": "ltt_export_artifact_expl_per_sec",
        "value": round(art_rate, 1),
        "live_expl_per_sec": round(live_rate, 1),
        "max_abs_diff_vs_live": float(d),
        "blob_mb": round(len(blob) / 1e6, 1),
        "batch": args.batch,
        "mode": "xla" if args.xla else "kernels+int8",
    }))


if __name__ == "__main__":
    main()
