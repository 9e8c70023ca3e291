"""TPU probe: where the froyo-ViT final's time goes (verdict r4 #4).

froyo = frozen backbone, ONE trunk traversal, then the post-trunk tail:
two CLS-head denses (classifier + srg grand), one explainer-attn layer,
and the explainer MLP head (normalize + CLS drop).  Times, in one process
(smallest executable first, per-phase fences):
  1. trunk-only backbone,
  2. + the two CLS softmax heads,
  3. + the explainer-attn layer (attention_block + mlp_block kernels),
  4. + the fused int8 head kernel (= everything but normalize/transpose),
  5. full fw_final,
then a batch sweep of the full path (the r3 knee was measured at 256 only).
Differences isolate the tail stage costs against the dot-time floor:
expl-attn layer ~3.0 GF/img, head ~4.7 GF/img -> ~46 us/img at the chip's
measured ~166 T/s int8 cap; if stages sit at that floor, the residual is
compute, not launches, and further fusion cannot reach 4,100 expl/s.

    python playground/bench_froyo_breakdown.py [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

ITERS = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--sweep", type=str, default="256,384,512")
    args = ap.parse_args()
    os.environ.setdefault("AUTOGNOTHI_INT8", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.models.froyo_vit import (
        FroyoViTConfig,
        init_froyo_vit_final,
    )
    from autognothi_tpu.models.vit import (
        explainer_mlp_head,
        vit_backbone,
        vit_explainer_head,
        _vit_layer_body,
    )
    from autognothi_tpu.models.common import dense, subdict
    from autognothi_tpu.recipes.froyo_vit import fw_final
    from __graft_entry__ import _flagship_cfg

    cfg = FroyoViTConfig(**_flagship_cfg().model_dump())
    params = cast_tree(init_froyo_vit_final(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    b = args.batch
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    mask_b = jnp.ones((b, 1 + n_players), jnp.int32)

    def fence(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timed(name, fn, *a, batch=None):
        nb = batch or b
        out = fn(*a)
        lead = out[0] if isinstance(out, tuple) else out
        fence(lead)  # compile + warm
        out = fn(*a)
        fence(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*a)
        fence(out[0] if isinstance(out, tuple) else out)
        dt = (time.perf_counter() - t0) / ITERS
        us_img = dt / nb * 1e6
        print(json.dumps({"probe": name, "us_per_img": round(us_img, 1),
                          "expl_per_sec": round(nb / dt, 1)}), flush=True)
        return us_img

    def cls_heads(p, h):
        probs = jax.nn.softmax(
            dense(h[:, 0, :], p["classifier.weight"].astype(h.dtype),
                  p["classifier.bias"].astype(h.dtype)), axis=-1)
        grand = jax.nn.softmax(
            dense(h[:, 0, :], p["srg_classifier.weight"].astype(h.dtype),
                  p["srg_classifier.bias"].astype(h.dtype)), axis=-1)
        return probs, grand

    trunk = jax.jit(lambda p, x: vit_backbone(p, cfg, x, mask_b))

    def t_heads(p, x):
        h = vit_backbone(p, cfg, x, mask_b)
        probs, grand = cls_heads(p, h)
        return probs + grand

    # NB every intermediate product feeds the return value — an unused
    # `grand` would be DCE'd and distort the stage deltas (r3 ladder lesson)
    def t_attn(p, x):
        h = vit_backbone(p, cfg, x, mask_b)
        probs, grand = cls_heads(p, h)
        h = _vit_layer_body(subdict(p, "explainer_attn.0."), h, mask_b, cfg,
                            has_ln1=False, deterministic=True, rng=None)
        return (jnp.sum(h.astype(jnp.float32), axis=(1, 2))[:, None]
                + probs + grand)

    def t_headmlp(p, x):
        h = vit_backbone(p, cfg, x, mask_b)
        probs, grand = cls_heads(p, h)
        h = _vit_layer_body(subdict(p, "explainer_attn.0."), h, mask_b, cfg,
                            has_ln1=False, deterministic=True, rng=None)
        out = explainer_mlp_head(p, h)
        return (jnp.sum(out.astype(jnp.float32)) + jnp.sum(probs)
                + jnp.sum(grand))

    full = jax.jit(lambda p, x: fw_final(cfg, p, x)[1])

    xs = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 224, 224),
                           jnp.bfloat16)
    t1 = timed("trunk_only", trunk, params, xs)
    t2 = timed("plus_cls_heads", jax.jit(t_heads), params, xs)
    t3 = timed("plus_expl_attn_layer", jax.jit(t_attn), params, xs)
    t4 = timed("plus_head_mlp", jax.jit(t_headmlp), params, xs)
    t5 = timed("full_fw_final", full, params, xs)
    print(json.dumps({
        "budget_us_per_img": {
            "trunk": round(t1, 1),
            "cls_heads": round(t2 - t1, 1),
            "expl_attn_layer": round(t3 - t2, 1),
            "head_mlp": round(t4 - t3, 1),
            "normalize_rest": round(t5 - t4, 1),
        }}), flush=True)

    for nb in [int(s) for s in args.sweep.split(",") if s]:
        if nb == b:
            continue
        xs_n = jax.random.normal(jax.random.PRNGKey(1), (nb, 3, 224, 224),
                                 jnp.bfloat16)
        fn = jax.jit(lambda p, x: fw_final(cfg, p, x)[1])
        timed(f"full_fw_final@B{nb}", fn, params, xs_n, batch=nb)


if __name__ == "__main__":
    main()
