"""Headline benchmark: ViT-Base/16 @224 explanations/sec on one TPU chip.

One "explanation" = one fw_final pass (classifier probs + surrogate grand +
normalized per-patch Shapley attributions for all classes) — the deployment
path the reference measures in measure_performance.py:106-251.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is an engineering estimate of the torch reference's fw_final
throughput on A100 (eager fp16, batch-optimal): ~450 explanations/sec
(3 ViT-B forwards/explanation at ~1350 img/s).  Replace with a measured
number when an A100 run exists.  A MEASURED anchor does exist on this host:
the torch reference's own measure_performance protocol yields 0.932 expl/s
on 1 CPU core (playground/perf_anchor.py, BASELINE.md round-2 table); the
extra `vs_ref_cpu_measured` field reports against that.
"""

import json
import os
import time

# serving configuration: fused Pallas kernels + the W8A8 int8 path
# (AUC drift vs fp32 <= 2.1e-4 on the faithfulness gate, top-20 attribution
# rank overlap 98.3% — BASELINE.md round-2 entries).  Opt out by exporting
# AUTOGNOTHI_INT8=0 before running.
os.environ.setdefault("AUTOGNOTHI_INT8", "1")

A100_TORCH_EST_EXPL_PER_SEC = 450.0
TORCH_CPU_MEASURED_EXPL_PER_SEC = 0.932  # perf_anchor.py, same-host CPU

# B=256 measured on the chip: 1263 expl/s vs 1170 at B=64 (weights amortize
# on the bandwidth-bound v5e; past 256 the curve is flat: 1272@512, 1281@1024)
BATCH = int(os.environ.get("AUTOGNOTHI_BENCH_BATCH", "256"))
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.models.vit import init_vit_final
    from autognothi_tpu.recipes.vanilla_vit import fw_final
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    params = init_vit_final(jax.random.PRNGKey(0), cfg)
    # bf16 weights & activations on the MXU; layernorm/softmax math runs fp32
    params = cast_tree(params, jnp.bfloat16)

    @jax.jit
    def run(p, xs):
        probs, attr = fw_final(cfg, p, xs.astype(jnp.bfloat16))
        return probs.astype(jnp.float32), attr.astype(jnp.float32)

    xs = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 3, 224, 224))

    import numpy as np

    def fence(x):
        # the experimental remote platform does not honor block_until_ready;
        # a device->host transfer is the only reliable execution fence
        return float(np.asarray(jnp.sum(x)))

    for _ in range(WARMUP):
        probs, attr = run(params, xs)
    fence(probs)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        probs, attr = run(params, xs)
    fence(probs)
    dt = time.perf_counter() - t0

    expl_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "vit_base_224_explanations_per_sec_per_chip",
        "value": round(expl_per_sec, 2),
        "unit": "explanations/s",
        "vs_baseline": round(expl_per_sec / A100_TORCH_EST_EXPL_PER_SEC, 3),
        "vs_ref_cpu_measured": round(
            expl_per_sec / TORCH_CPU_MEASURED_EXPL_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
