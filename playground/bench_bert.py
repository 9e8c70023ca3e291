"""Text-track bench: BERT-base @ T=512 fw_final explanations/sec on one
chip, plus a ViT-Large dispatch sanity (attention kernel engages, MLP falls
back to XLA under the VMEM gate).

Run on TPU: python playground/bench_bert.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

# serving configuration, matching bench.py (AUTOGNOTHI_INT8=0 opts out)
os.environ.setdefault("AUTOGNOTHI_INT8", "1")

BATCH = int(os.environ.get("AUTOGNOTHI_BENCH_BATCH", "8"))
ITERS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.bert import VanillaBertConfig, init_bert_final
    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.recipes.vanilla_bert import fw_final

    cfg = VanillaBertConfig(
        attention_probs_dropout_prob=0.0,
        explainer_attn_num_layers=1,
        explainer_head_hidden_size=3072,
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
    params = cast_tree(init_bert_final(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (BATCH, 512), 1, 30522)

    run = jax.jit(lambda p, x: fw_final(cfg, p, x))

    def fence(x):
        return float(np.asarray(jnp.sum(x[0].astype(jnp.float32))))

    out = run(params, ids)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = run(params, ids)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({
        "metric": "bert_base_512_explanations_per_sec_per_chip",
        "value": round(BATCH / dt, 2),
        "unit": "explanations/s",
        "vs_baseline": 0.0,
    }), flush=True)

    # ViT-Large dispatch sanity: mixed kernel/XLA path compiles and runs
    from autognothi_tpu.models.vit import VanillaViTConfig, init_vit_classifier
    from autognothi_tpu.recipes.vanilla_vit import fw_classifier

    vcfg = VanillaViTConfig(
        attention_probs_dropout_prob=0.0,
        explainer_attn_num_layers=1,
        explainer_head_hidden_size=4096,
        explainer_normalize=True,
        hidden_dropout_prob=0.0,
        hidden_size=1024,
        intermediate_size=4096,
        layer_norm_eps=1e-12,
        num_attention_heads=16,
        num_hidden_layers=24,
        num_labels=10,
        img_channels=3,
        img_px_size=224,
        img_patch_size=16,
    )
    vparams = cast_tree(init_vit_classifier(jax.random.PRNGKey(2), vcfg),
                        jnp.bfloat16)
    xs = jax.random.normal(jax.random.PRNGKey(3), (8, 3, 224, 224),
                           jnp.bfloat16)
    mask = jnp.ones((8, 196), jnp.int32)
    fv = jax.jit(lambda p, x, m: fw_classifier(vcfg, p, x, m)[0])
    out = fv(vparams, xs, mask)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fv(vparams, xs, mask)
    print("vit_large sum:", float(np.asarray(jnp.sum(out.astype(jnp.float32)))),
          f"({8 * ITERS / (time.perf_counter() - t0):.1f} img/s)")


if __name__ == "__main__":
    main()
