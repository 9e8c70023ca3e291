"""TPU bench: LTT (ladder side-tuning) finals — the reference's flagship
architecture (/root/reference/models/ltt_vit.py:407-440): ONE backbone
traversal + 96-dim side ladders computes logits AND attributions, ~37 GF
per explanation vs the vanilla 3-tower final's ~107 GF.

One process benches ONE configuration (the tunnel degrades the second large
model in a process — BASELINE.md r1 note).  Drive sweeps with a shell loop:

    for b in 128 256 512; do
        AUTOGNOTHI_BENCH_BATCH=$b python playground/bench_ltt.py --model vit
    done
    AUTOGNOTHI_FUSED_MIN_HIDDEN=0 python playground/bench_ltt.py --model vit
    python playground/bench_ltt.py --model bert          # LTT-BERT @T=512
    python playground/bench_ltt.py --model froyo_bert    # froyo @T=512

Knobs (all read at trace time): AUTOGNOTHI_INT8 (default 1 here),
AUTOGNOTHI_FUSED_MIN_HIDDEN (default 128: 96-dim ladders ride XLA, trunk
rides the fused kernels), AUTOGNOTHI_BENCH_BATCH.
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


def _bert_cfg(kind: str):
    common = dict(
        attention_probs_dropout_prob=0.0,
        explainer_normalize=True,
        hidden_dropout_prob=0.0,
        hidden_size=768,
        intermediate_size=3072,
        layer_norm_eps=1e-12,
        max_position_embeddings=512,
        num_attention_heads=12,
        num_hidden_layers=12,
        num_labels=2,
        pad_token_id=0,
        type_vocab_size=2,
        vocab_size=30522,
    )
    if kind == "ltt":
        from autognothi_tpu.models.ltt_bert import LttBertConfig

        return LttBertConfig(
            explainer_s_attn_num_layers=1,
            explainer_s_head_hidden_size=3072,
            s_attn_hidden_size=96,
            s_attn_intermediate_size=384,
            **common,
        )
    from autognothi_tpu.models.froyo_bert import FroyoBertConfig

    return FroyoBertConfig(
        explainer_attn_num_layers=1,
        explainer_head_hidden_size=3072,
        **common,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["vit", "bert", "froyo_bert",
                                        "froyo_vit"], default="vit")
    ap.add_argument("--check", action="store_true",
                    help="also compare vs the pure-XLA bf16 forward")
    args = ap.parse_args()

    os.environ.setdefault("AUTOGNOTHI_INT8", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.common import cast_tree

    if args.model == "vit":
        from autognothi_tpu.models.ltt_vit import init_ltt_vit_final
        from autognothi_tpu.recipes.ltt_vit import fw_final
        from __graft_entry__ import _flagship_ltt_cfg

        cfg = _flagship_ltt_cfg()
        params = init_ltt_vit_final(jax.random.PRNGKey(0), cfg)
        default_batch = 256
        mk_input = lambda b: jax.random.normal(  # noqa: E731
            jax.random.PRNGKey(1), (b, 3, 224, 224))
    elif args.model == "froyo_vit":
        from autognothi_tpu.models.froyo_vit import (
            FroyoViTConfig,
            init_froyo_vit_final,
        )
        from autognothi_tpu.recipes.froyo_vit import fw_final
        from __graft_entry__ import _flagship_cfg

        cfg = FroyoViTConfig(**_flagship_cfg().model_dump())
        params = init_froyo_vit_final(jax.random.PRNGKey(0), cfg)
        default_batch = 256
        mk_input = lambda b: jax.random.normal(  # noqa: E731
            jax.random.PRNGKey(1), (b, 3, 224, 224))
    else:
        kind = "ltt" if args.model == "bert" else "froyo"
        cfg = _bert_cfg(kind)
        if kind == "ltt":
            from autognothi_tpu.models.ltt_bert import init_ltt_bert_final
            from autognothi_tpu.recipes.ltt_bert import fw_final

            params = init_ltt_bert_final(jax.random.PRNGKey(0), cfg)
        else:
            from autognothi_tpu.models.froyo_bert import init_froyo_bert_final
            from autognothi_tpu.recipes.froyo_bert import fw_final

            params = init_froyo_bert_final(jax.random.PRNGKey(0), cfg)
        default_batch = 8
        mk_input = lambda b: jax.random.randint(  # noqa: E731
            jax.random.PRNGKey(1), (b, 512), 1, cfg.vocab_size)

    batch = int(os.environ.get("AUTOGNOTHI_BENCH_BATCH", str(default_batch)))
    params = cast_tree(params, jnp.bfloat16)
    xs = mk_input(batch)
    if jnp.issubdtype(xs.dtype, jnp.floating):
        xs = xs.astype(jnp.bfloat16)

    @jax.jit
    def run(p, x):
        probs, attr = fw_final(cfg, p, x)
        return probs.astype(jnp.float32), attr.astype(jnp.float32)

    def fence(x):
        return float(np.asarray(jnp.sum(x)))

    t_compile = time.perf_counter()
    for _ in range(WARMUP):
        probs, attr = run(params, xs)
    fence(probs)
    t_warm = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(ITERS):
        probs, attr = run(params, xs)
    fence(probs)
    dt = time.perf_counter() - t0

    out = {
        "model": f"ltt_{args.model}" if args.model in ("vit", "bert")
        else args.model,
        "batch": batch,
        "int8": os.environ.get("AUTOGNOTHI_INT8"),
        "fused_min_hidden": os.environ.get("AUTOGNOTHI_FUSED_MIN_HIDDEN",
                                           "0 (default)"),
        "expl_per_sec": round(batch * ITERS / dt, 2),
        "warm_s": round(t_warm, 1),
    }

    if args.check:
        # numerics: kernel+int8 path vs pure-XLA bf16 on a small batch.
        # Order matters: the kernel-path forward must retrace BEFORE the env
        # flips (pallas/quant modes are consulted at trace time).
        xs_s = xs[:8]
        k_probs, k_attr = run(params, xs_s)
        fence(k_probs)
        os.environ["AUTOGNOTHI_PALLAS"] = "0"
        os.environ["AUTOGNOTHI_INT8"] = "0"
        ref_probs, ref_attr = jax.jit(
            lambda p, x: fw_final(cfg, p, x))(params, xs_s)
        ref_probs = np.asarray(ref_probs, np.float32)
        k_probs = np.asarray(k_probs, np.float32)[: ref_probs.shape[0]]
        ref_attr = np.asarray(ref_attr, np.float32)
        k_attr = np.asarray(k_attr, np.float32)[: ref_attr.shape[0]]
        top = 20
        overlap = np.mean([
            len(set(np.argsort(-ref_attr[i, c])[:top])
                & set(np.argsort(-k_attr[i, c])[:top])) / top
            for i in range(ref_attr.shape[0])
            for c in range(ref_attr.shape[1])
        ])
        out["probs_max_abs_diff"] = float(np.max(np.abs(ref_probs - k_probs)))
        out["attr_top20_overlap"] = round(float(overlap), 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
