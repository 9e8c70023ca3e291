"""BERT@512 statistical budget probe (VERDICT r2 item 6).

The tunnel's 10-14% run-to-run noise swamped every r2 single-shot ablation.
This protocol resolves small effects:

- a DEPTH SWEEP: the classifier tower is timed at N = 0..12 encoder layers
  (sliced layer stacks, one jitted executable per N);
- executables are timed ROUND-ROBIN (interleaved) so slow drift of the
  tunnel hits all N equally; per-round ordinary-least-squares slope =
  per-layer cost with common-mode noise cancelled;
- ≥30 rounds, median-of-rounds + percentile bootstrap CI on the slope,
  the intercept (embed + dispatch), and each N's median.

Per-layer dot-rate ceiling for comparison: one BERT-base layer @T=512
= QKV+proj (4*T*768^2*2) + scores/PV (2*2*T^2*768) + MLP (2*T*768*3072*2)
~ 8.05 GF/seq; the script prints the implied TFLOP/s of the measured slope.

    python playground/bench_bert_stats.py [--rounds 30] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", default="4,8,16,32")
    ap.add_argument("--model", choices=["vanilla", "ltt", "froyo"],
                    default="vanilla")
    ap.add_argument("--sweep-batch", action="store_true",
                    help="interleaved BATCH sweep at full depth instead of "
                    "the depth sweep: settles whether the fixed per-call "
                    "cost (~8.4 ms at B=8) amortizes or per-seq compute "
                    "degrades with batch")
    args = ap.parse_args()
    os.environ.setdefault("AUTOGNOTHI_INT8", "1")
    if args.sweep_batch:
        return batch_sweep(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.bert import (
        VanillaBertConfig,
        bert_embeddings,
        bert_encoder,
        init_bert_classifier,
    )
    from autognothi_tpu.models.common import (
        additive_mask_bias,
        cast_tree,
        subdict,
    )

    cfg = VanillaBertConfig(
        attention_probs_dropout_prob=0.0, explainer_attn_num_layers=1,
        explainer_head_hidden_size=3072, explainer_normalize=True,
        hidden_dropout_prob=0.0, hidden_size=768, intermediate_size=3072,
        layer_norm_eps=1e-12, max_position_embeddings=512,
        num_attention_heads=12, num_hidden_layers=12, num_labels=2,
        pad_token_id=0, type_vocab_size=2, vocab_size=30522,
    )
    params = cast_tree(init_bert_classifier(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    bp = subdict(params, "bert.")
    b, t = args.batch, 512
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 1, cfg.vocab_size)
    mask = jnp.ones((b, t), jnp.int32)

    depths = [0, 2, 4, 6, 8, 12]

    def make_fwd(n: int):
        sub = cfg.model_copy(update={"num_hidden_layers": n})

        @jax.jit
        def fwd(p, ids, mask):
            ttype = jnp.zeros_like(ids)
            h = bert_embeddings(p, cfg, ids, ttype, deterministic=True,
                                dtype=jnp.bfloat16)
            if n:
                bias = additive_mask_bias(mask, h.dtype)
                h = bert_encoder(p, sub, h, bias, deterministic=True)
            return jnp.sum(h.astype(jnp.float32))

        return fwd

    fwds = {n: make_fwd(n) for n in depths}

    def fence(x):
        return float(np.asarray(x))

    # warm every executable past the tunnel's ~5-8 execution ramp
    for _ in range(8):
        for n in depths:
            out = fwds[n](bp, ids, mask)
    fence(out)

    times = {n: [] for n in depths}
    slopes = []
    for _ in range(args.rounds):
        row = {}
        for n in depths:  # interleaved: drift hits all N equally
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fwds[n](bp, ids, mask)
            fence(out)
            dt = (time.perf_counter() - t0) / args.iters / b * 1e6
            times[n].append(dt)
            row[n] = dt
        xs = np.asarray(depths, np.float64)
        ys = np.asarray([row[n] for n in depths])
        slope, intercept = np.polyfit(xs, ys, 1)
        slopes.append((slope, intercept))

    rng = np.random.RandomState(0)
    sl = np.asarray([s for s, _ in slopes])
    ic = np.asarray([i for _, i in slopes])

    def ci(v):
        boots = [np.median(rng.choice(v, size=len(v))) for _ in range(2000)]
        return (round(float(np.percentile(boots, 2.5)), 2),
                round(float(np.percentile(boots, 97.5)), 2))

    per_layer_gf = (4 * t * 768 * 768 * 2 + 2 * 2 * t * t * 768
                    + 2 * t * 768 * 3072 * 2) / 1e9
    med_slope = float(np.median(sl))
    print(json.dumps({
        "per_layer_us_median": round(med_slope, 2),
        "per_layer_us_ci95": ci(sl),
        "intercept_us_median": round(float(np.median(ic)), 2),
        "intercept_us_ci95": ci(ic),
        "per_depth_us_median": {n: round(float(np.median(times[n])), 1)
                                for n in depths},
        "per_layer_gflops": round(per_layer_gf, 2),
        "implied_tflops": round(per_layer_gf / med_slope * 1e6 / 1e3, 1),
        "rounds": args.rounds,
        "int8": os.environ.get("AUTOGNOTHI_INT8"),
    }), flush=True)


def batch_sweep(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.bert import VanillaBertConfig, init_bert_final
    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.recipes.vanilla_bert import fw_final

    common = dict(
        attention_probs_dropout_prob=0.0, explainer_normalize=True,
        hidden_dropout_prob=0.0, hidden_size=768, intermediate_size=3072,
        layer_norm_eps=1e-12, max_position_embeddings=512,
        num_attention_heads=12, num_hidden_layers=12, num_labels=2,
        pad_token_id=0, type_vocab_size=2, vocab_size=30522,
    )
    if args.model == "ltt":
        from autognothi_tpu.models.ltt_bert import (
            LttBertConfig, init_ltt_bert_final)
        from autognothi_tpu.recipes.ltt_bert import fw_final as fw

        cfg = LttBertConfig(explainer_s_attn_num_layers=1,
                            explainer_s_head_hidden_size=3072,
                            s_attn_hidden_size=96,
                            s_attn_intermediate_size=384, **common)
        params = init_ltt_bert_final(jax.random.PRNGKey(0), cfg)
    elif args.model == "froyo":
        from autognothi_tpu.models.froyo_bert import (
            FroyoBertConfig, init_froyo_bert_final)
        from autognothi_tpu.recipes.froyo_bert import fw_final as fw

        cfg = FroyoBertConfig(explainer_attn_num_layers=1,
                              explainer_head_hidden_size=3072, **common)
        params = init_froyo_bert_final(jax.random.PRNGKey(0), cfg)
    else:
        cfg = VanillaBertConfig(explainer_attn_num_layers=1,
                                explainer_head_hidden_size=3072, **common)
        params = init_bert_final(jax.random.PRNGKey(0), cfg)
        fw = fw_final
    params = cast_tree(params, jnp.bfloat16)
    batches = [int(b) for b in args.batches.split(",")]
    run = jax.jit(lambda p, x: fw(cfg, p, x)[0])
    inputs = {
        b: jax.random.randint(jax.random.PRNGKey(1), (b, 512), 1,
                              cfg.vocab_size)
        for b in batches
    }

    def fence(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    for _ in range(8):  # warm each executable past the tunnel ramp
        for b in batches:
            out = run(params, inputs[b])
    fence(out)

    times = {b: [] for b in batches}
    for _ in range(args.rounds):
        for b in batches:  # interleaved
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = run(params, inputs[b])
            fence(out)
            times[b].append((time.perf_counter() - t0) / args.iters)

    rng = np.random.RandomState(0)
    out = {}
    for b in batches:
        v = np.asarray(times[b])
        med = float(np.median(v))
        boots = [np.median(rng.choice(v, size=len(v))) for _ in range(2000)]
        lo, hi = np.percentile(boots, [97.5, 2.5])  # time hi -> rate lo
        out[b] = {
            "expl_per_sec_median": round(b / med, 1),
            "expl_per_sec_ci95": [round(b / float(lo), 1),
                                  round(b / float(hi), 1)],
            "us_per_seq_median": round(med / b * 1e6, 1),
        }
    print(json.dumps({"model": args.model, "batch_sweep": out,
                      "rounds": args.rounds,
                      "int8": os.environ.get("AUTOGNOTHI_INT8")}),
          flush=True)


if __name__ == "__main__":
    main()
