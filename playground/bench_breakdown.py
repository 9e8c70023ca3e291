"""Where does the 0.7 ms/explanation go?  Component-level timing of the
flagship ViT-B/224 fw_final serving path on the real chip.

fw_final = 3 full backbones (classifier + surrogate-grand + explainer) +
explainer head (models/vit.py:415-444).  Ideal int8 compute at the chip's
measured K=768 dot rate (~166 T/s) is ~0.34 ms/expl; this bench times each
component in isolation to locate the rest.

Run on TPU:  python playground/bench_breakdown.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

os.environ.setdefault("AUTOGNOTHI_INT8", "1")

BATCH = int(os.environ.get("AUTOGNOTHI_BENCH_BATCH", "256"))
ITERS = 10
CHAIN = 4  # kernel ops chained inside one jit to amortize dispatch


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.common import cast_tree, quant_mode
    from autognothi_tpu.models.vit import (
        init_vit_final,
        vit_classifier_fwd,
        vit_embeddings,
        vit_explainer_fwd,
    )
    from autognothi_tpu.models.common import subdict
    from autognothi_tpu.ops.attention_block import attention_block
    from autognothi_tpu.ops.mlp_block import mlp_block
    from autognothi_tpu.recipes.vanilla_vit import fw_final
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    params = cast_tree(init_vit_final(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    xs = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 3, 224, 224),
                           jnp.bfloat16)
    t_seq = cfg.n_patches + 1
    h_dim = cfg.hidden_size
    print(f"quant_mode={quant_mode()}  B={BATCH} T={t_seq} H={h_dim}",
          flush=True)

    def fence(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timed(label, fn, *args, per=1.0):
        out = fn(*args)
        fence(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        fence(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / ITERS / per
        print(f"{label:38s} {dt*1e3:8.3f} ms  "
              f"({dt/BATCH*1e6:7.2f} us/img)", flush=True)
        return dt

    results = {}

    # ---- end-to-end.  Return BOTH outputs: returning only attr lets XLA
    # dead-code-eliminate the entire classifier tower (found the hard way —
    # it made fw_final read as 2 towers, 500 us/img instead of 700)
    @jax.jit
    def full(p, x):
        probs, attr = fw_final(cfg, p, x)
        return probs.astype(jnp.float32).sum() + attr.astype(jnp.float32).sum()

    results["fw_final"] = timed("fw_final (3 towers + head)", full, params, xs)

    @jax.jit
    def cls_fwd(p, x):
        mask = jnp.ones((x.shape[0], 1 + cfg.n_patches), jnp.int32)
        probs, _ = vit_classifier_fwd(subdict(p, "classifier."), cfg, x, mask)
        return probs

    results["classifier"] = timed("classifier fwd (1 tower)", cls_fwd,
                                  params, xs)

    @jax.jit
    def exp_fwd(p, x):
        mask = jnp.ones((x.shape[0], 1 + cfg.n_patches), jnp.int32)
        grand = jnp.zeros((x.shape[0], cfg.num_labels), x.dtype)
        attr, _ = vit_explainer_fwd(subdict(p, "explainer."), cfg, x, mask,
                                    grand, p["surrogate_null"])
        return attr

    results["explainer"] = timed("explainer fwd (tower + head)", exp_fwd,
                                 params, xs)

    @jax.jit
    def emb(p, x):
        return vit_embeddings(subdict(p, "classifier.vit."), cfg, x)

    results["embeddings"] = timed("patch embeddings", emb, params, xs)

    # ---- single fused layer kernels at serving shape
    layer = subdict(params, "classifier.vit.encoder.layers.0.")
    h0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, t_seq, h_dim),
                           jnp.bfloat16) * 0.5
    mask_row = jnp.ones((BATCH, t_seq), jnp.bfloat16)
    attn_w = (layer["attention.self.query.weight"],
              layer["attention.self.query.bias"],
              layer["attention.self.key.weight"],
              layer["attention.self.key.bias"],
              layer["attention.self.value.weight"],
              layer["attention.self.value.bias"],
              layer["attention.output.dense.weight"],
              layer["attention.output.dense.bias"])
    ln1 = (layer["layernorm_before.weight"], layer["layernorm_before.bias"],
           cfg.layer_norm_eps)
    ln2 = (layer["layernorm_after.weight"], layer["layernorm_after.bias"],
           cfg.layer_norm_eps)

    for quant in ("int8", "none"):
        @jax.jit
        def attn_chain(h):
            for _ in range(CHAIN):
                h = attention_block(h, mask_row, attn_w,
                                    cfg.num_attention_heads, "mul",
                                    use_pallas=True, ln=ln1,
                                    ln_position="prologue", quant=quant)
            return h

        results[f"attn_block_{quant}"] = timed(
            f"attention_block x1 ({quant})", attn_chain, h0, per=CHAIN)

        @jax.jit
        def mlp_chain(h):
            for _ in range(CHAIN):
                h = mlp_block(h, layer["intermediate.dense.weight"],
                              layer["intermediate.dense.bias"],
                              layer["output.dense.weight"],
                              layer["output.dense.bias"],
                              use_pallas=True, ln=ln2,
                              ln_position="prologue", quant=quant)
            return h

        results[f"mlp_block_{quant}"] = timed(
            f"mlp_block x1 ({quant})", mlp_chain, h0, per=CHAIN)

    # ---- pure-dot MXU caps at the exact serving shapes (XLA, whole batch)
    bt = BATCH * t_seq
    rng = np.random.RandomState(0)
    for (m, k, n, tag) in ((bt, h_dim, h_dim, "proj 768x768"),
                           (bt, h_dim, 4 * h_dim, "mlp up 768x3072"),
                           (bt, 4 * h_dim, h_dim, "mlp down 3072x768")):
        a8 = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)

        f = jax.jit(lambda x, y: jnp.dot(x, y,
                                         preferred_element_type=jnp.int32))
        dt = timed(f"int8 dot {tag}", f, a8, b8)
        print(f"    -> {2.0*m*k*n/dt/1e12:6.1f} T/s", flush=True)
        results[f"dot_{tag}"] = dt

    # ---- summary
    twelve = 12 * (results["attn_block_int8"] + results["mlp_block_int8"])
    print("\nper-tower reconstruction: 12 x (attn+mlp) ="
          f" {twelve*1e3:.3f} ms; measured classifier tower"
          f" = {results['classifier']*1e3:.3f} ms;"
          f" 3 towers + head vs fw_final:"
          f" {3*results['classifier']*1e3:.3f} + head vs"
          f" {results['fw_final']*1e3:.3f} ms")
    print(json.dumps({k: round(v * 1e3, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
