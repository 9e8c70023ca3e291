"""TPU probe: where the LTT final's time goes.

Times, in one process (smallest executable first, per-phase fences):
  1. trunk-only backbone (branches=()),
  2. trunk + 1 ladder (branches=(0,)),
  3. trunk + 2 ladders (branches=(0,1)) — the fw_final backbone,
  4. full fw_final (backbone + heads + explainer MLP).
Differences isolate the per-ladder cost and the head cost.

    python playground/bench_ltt_breakdown.py [--batch 256]
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
    args = ap.parse_args()
    os.environ.setdefault("AUTOGNOTHI_INT8", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.models.ltt_vit import (
        init_ltt_vit_final,
        ltt_vit_backbone,
    )
    from autognothi_tpu.recipes.ltt_vit import fw_final
    from __graft_entry__ import _flagship_ltt_cfg

    cfg = _flagship_ltt_cfg()
    params = cast_tree(init_ltt_vit_final(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    b = args.batch
    xs = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 224, 224),
                           jnp.bfloat16)
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    mask = jnp.ones((b, 1 + n_players), jnp.int32)

    def fence(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timed(name, fn, *a):
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
        us_img = dt / b * 1e6
        print(json.dumps({"probe": name, "us_per_img": round(us_img, 1),
                          "expl_per_sec": round(b / dt, 1)}), flush=True)
        return us_img

    from autognothi_tpu.models.ltt_vit import (
        _cls_head,
        ltt_vit_explainer_head,
    )
    from autognothi_tpu.models.vit import explainer_mlp_head

    trunk = jax.jit(lambda p, x: ltt_vit_backbone(p, cfg, x, mask, ())[0])
    one = jax.jit(lambda p, x: ltt_vit_backbone(p, cfg, x, mask, (0,))[1][0])
    two = jax.jit(lambda p, x: ltt_vit_backbone(p, cfg, x, mask, (0, 1))[1][1])

    def bb_heads(p, x):
        h, (srg_side, exp_side) = ltt_vit_backbone(p, cfg, x, mask, (0, 1))
        return (_cls_head(p, h)
                + _cls_head(p, srg_side, "s_attn_classifier")
                + jnp.sum(exp_side.astype(jnp.float32), axis=(1, 2))[:, None])

    def bb_headmlp(p, x):
        h, (srg_side, exp_side) = ltt_vit_backbone(p, cfg, x, mask, (0, 1))
        out = explainer_mlp_head(p, exp_side, prefix="s_explainer_mlp")
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(
            _cls_head(p, h)) + jnp.sum(_cls_head(p, srg_side,
                                                 "s_attn_classifier"))

    def bb_explhead(p, x):
        h, (srg_side, exp_side) = ltt_vit_backbone(p, cfg, x, mask, (0, 1))
        grand = _cls_head(p, srg_side, "s_attn_classifier")
        attr = ltt_vit_explainer_head(
            p, cfg, exp_side, mask, grand, p["surrogate_null"])
        return jnp.sum(attr.astype(jnp.float32)) + jnp.sum(_cls_head(p, h))

    full = jax.jit(lambda p, x: fw_final(cfg, p, x)[1])

    t1 = timed("trunk_only", trunk, params, xs)
    t2 = timed("trunk_plus_1_ladder", one, params, xs)
    t3 = timed("trunk_plus_2_ladders", two, params, xs)
    t3b = timed("plus_cls_heads", jax.jit(bb_heads), params, xs)
    t3c = timed("plus_head_mlp_only", jax.jit(bb_headmlp), params, xs)
    t3d = timed("plus_full_expl_head", jax.jit(bb_explhead), params, xs)
    t4 = timed("full_fw_final", full, params, xs)
    print(json.dumps({
        "ladder_us_per_img": round(t2 - t1, 1),
        "second_ladder_us_per_img": round(t3 - t2, 1),
        "cls_heads_us": round(t3b - t3, 1),
        "head_mlp_us": round(t3c - t3b, 1),
        "expl_attn_plus_norm_us": round(t3d - t3c, 1),
        "fwfinal_vs_explhead_us": round(t4 - t3d, 1),
        "head_us_per_img": round(t4 - t3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
