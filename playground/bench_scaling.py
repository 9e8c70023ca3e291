"""Multi-chip scaling bench for the sharded serving path.

The single-chip serving numbers are at this chip's measured int8 dot-rate
ceiling (BASELINE.md r3) — the remaining throughput dimension is CHIPS.
This harness measures it: for each mesh size m in a doubling sweep up to
the visible device count, it runs the deployment-layout sharded `fw_final`
(params replicated, request batch split along "data" via shard_map — the
same `parallel.mesh.sharded_serving_fn` that `pipeline/serve.py` and
`bench.py` use, so the fused Pallas kernels run per-shard instead of
replicating behind all-gathers) with a FIXED per-chip batch (weak scaling),
and reports expl/s plus parallel efficiency vs the 1-chip run.

On a real v5e pod this produces the scaling table BASELINE.md's "scaling
is the remaining dimension" claim needs.  Without one it still validates
the whole path end-to-end: `--mini` runs tiny dims on the virtual CPU mesh
(set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
where timings are meaningless but sharding, kernels-per-shard and the
efficiency accounting are real.

    # functional check (any machine):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python playground/bench_scaling.py --mini
    # real pod:
    python playground/bench_scaling.py --model ltt --batch-per-chip 384

Timing fences with a device->host transfer (the tunnel does not honor
block_until_ready — BASELINE.md); ascending mesh sizes reuse one process
(a pod is not the tunnel; its per-process model-degradation quirk does not
apply — re-run single sizes in fresh processes to double-check any outlier).
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


def build_model(model: str, mini: bool):
    import jax
    import jax.numpy as jnp

    from autognothi_tpu.models.common import cast_tree

    if model == "ltt":
        from autognothi_tpu.models.ltt_vit import (
            LttViTConfig,
            init_ltt_vit_final,
        )
        from autognothi_tpu.recipes.ltt_vit import fw_final

        if mini:
            cfg = LttViTConfig(
                attention_probs_dropout_prob=0.0,
                explainer_s_attn_num_layers=1,
                explainer_s_head_hidden_size=16,
                explainer_normalize=True,
                hidden_dropout_prob=0.0,
                hidden_size=32,
                intermediate_size=64,
                layer_norm_eps=1e-12,
                num_attention_heads=4,
                num_hidden_layers=2,
                num_labels=3,
                s_attn_hidden_size=16,
                s_attn_intermediate_size=32,
                img_channels=3,
                img_px_size=16,
                img_patch_size=8,
            )
        else:
            from __graft_entry__ import _flagship_ltt_cfg

            cfg = _flagship_ltt_cfg()
        params = init_ltt_vit_final(jax.random.PRNGKey(0), cfg)
    elif model == "froyo":
        from autognothi_tpu.models.froyo_vit import (
            FroyoViTConfig,
            init_froyo_vit_final,
        )
        from autognothi_tpu.recipes.froyo_vit import fw_final
        from __graft_entry__ import _flagship_cfg

        assert not mini, "--mini supports ltt/vanilla"
        cfg = FroyoViTConfig(**_flagship_cfg().model_dump())
        params = init_froyo_vit_final(jax.random.PRNGKey(0), cfg)
    else:
        from autognothi_tpu.models.vit import (
            VanillaViTConfig,
            init_vit_final,
        )
        from autognothi_tpu.recipes.vanilla_vit import fw_final

        if mini:
            cfg = VanillaViTConfig(
                attention_probs_dropout_prob=0.0,
                explainer_attn_num_layers=1,
                explainer_head_hidden_size=16,
                explainer_normalize=True,
                hidden_dropout_prob=0.0,
                hidden_size=32,
                intermediate_size=64,
                layer_norm_eps=1e-12,
                num_attention_heads=4,
                num_hidden_layers=2,
                num_labels=3,
                img_channels=3,
                img_px_size=16,
                img_patch_size=8,
            )
        else:
            from __graft_entry__ import _flagship_cfg

            cfg = _flagship_cfg()
        params = init_vit_final(jax.random.PRNGKey(0), cfg)

    params = cast_tree(params, jnp.bfloat16)

    def fw(p, xs):
        probs, attr = fw_final(cfg, p, xs.astype(jnp.bfloat16))
        return probs.astype(jnp.float32), attr.astype(jnp.float32)

    return cfg, params, fw


def bench_mesh_size(m: int, per_chip: int, px: int, params, fw) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.parallel.mesh import (
        make_mesh,
        replicate_params,
        sharded_serving_fn,
    )

    batch = per_chip * m
    mesh = make_mesh(m, model_parallel=1)
    placed = replicate_params(params, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (batch, 3, px, px)),
        NamedSharding(mesh, P("data", None, None, None)),
    )
    run = sharded_serving_fn(fw, mesh)

    def fence(x):
        return float(np.asarray(jnp.sum(x)))

    with mesh:
        for _ in range(WARMUP):
            probs, _ = run(placed, xs)
        fence(probs)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            probs, _ = run(placed, xs)
        fence(probs)
        dt = time.perf_counter() - t0
    return {
        "mesh": m,
        "batch": batch,
        "expl_per_sec": batch * ITERS / dt,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["ltt", "vanilla", "froyo"],
                    default="ltt")
    ap.add_argument("--batch-per-chip", type=int, default=None,
                    help="fixed per-chip batch (weak scaling); defaults to "
                         "the measured single-chip knee (384 ltt, 256 else)")
    ap.add_argument("--mesh-sizes", default=None,
                    help="comma list, default: doubling up to all devices")
    ap.add_argument("--mini", action="store_true",
                    help="tiny dims (functional check on the CPU mesh)")
    args = ap.parse_args()

    os.environ.setdefault("AUTOGNOTHI_INT8", "1")

    import jax

    n = len(jax.devices())
    if args.mesh_sizes:
        sizes = [int(s) for s in args.mesh_sizes.split(",")]
    else:
        sizes, m = [], 1
        while m <= n:
            sizes.append(m)
            m *= 2
    per_chip = args.batch_per_chip or (
        8 if args.mini else (384 if args.model == "ltt" else 256))

    cfg, params, fw = build_model(args.model, args.mini)
    px = cfg.img_px_size

    rows = []
    for m in sizes:
        row = bench_mesh_size(m, per_chip, px, params, fw)
        base = rows[0]["expl_per_sec"] if rows else row["expl_per_sec"]
        row["efficiency"] = round(row["expl_per_sec"] / (base * m), 4)
        rows.append(row)
        print(json.dumps({**row,
                          "expl_per_sec": round(row["expl_per_sec"], 2)}),
              flush=True)

    print(json.dumps({
        "metric": f"{args.model}_serving_weak_scaling",
        "devices": n,
        "per_chip_batch": per_chip,
        "rows": [{**r, "expl_per_sec": round(r["expl_per_sec"], 2)}
                 for r in rows],
    }))


if __name__ == "__main__":
    main()
