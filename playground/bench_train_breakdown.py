"""TPU probe: WHERE the fused explainer train step's time goes.

Phases timed as separate warmed, fenced executables (flagship ViT-B dims,
B=8, M=32 — the production `train_explainer` shapes):

  1. teacher      — the no-grad B*M masked surrogate sweep + grand fwd
                    (rides the fused kernels; int8 when
                    AUTOGNOTHI_INT8_TEACHER=1)
  2. expl_fwd     — one explainer forward (the differentiated tower, bf16)
  3. expl_grad    — value_and_grad of the Shapley loss with the teacher's
                    outputs precomputed (fwd + custom_vjp XLA backward)
  4. full_step    — the production step (sampling + teacher + grad + AdamW)

full_step - teacher - expl_grad ≈ sampling + optimizer + overheads.
Decides whether bespoke backward kernels are worth building (ROADMAP).

    python playground/bench_train_breakdown.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

BATCH = 8
N_MASK_SAMPLES = 32
WARMUP = 8
ITERS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.models.vit import (
        init_vit_classifier,
        init_vit_explainer,
    )
    from autognothi_tpu.ops.shapley import loss_shapley, mask_shapley
    from autognothi_tpu.parallel.train_step import (
        _make_teacher,
        make_explainer_train_step,
    )
    from autognothi_tpu.pipeline.training import make_optimizer, ones_mask
    from autognothi_tpu.recipes.vanilla_vit import vanilla_vit_recipe
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    recipe = vanilla_vit_recipe()
    n_players = recipe.n_players(cfg)

    key = jax.random.PRNGKey(0)
    exp_params = cast_tree(init_vit_explainer(key, cfg), jnp.bfloat16)
    srg_params = cast_tree(
        init_vit_classifier(jax.random.fold_in(key, 1), cfg), jnp.bfloat16
    )
    tx, opt_state = make_optimizer(exp_params, lambda name: True)

    nil_xs = jnp.zeros((1, 3, 224, 224), jnp.bfloat16)
    nil_mask = jnp.ones((1, n_players), jnp.int32)
    v_0, _ = recipe.fw_surrogate(cfg, srg_params, nil_xs, nil_mask)
    xs = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 3, 224, 224),
                           jnp.bfloat16)
    masks = mask_shapley(jax.random.PRNGKey(3), BATCH * N_MASK_SAMPLES,
                         n_players).reshape(BATCH, N_MASK_SAMPLES, n_players)
    mask_1 = jnp.ones((BATCH, n_players), jnp.int32)

    def fence(tree):
        return float(np.asarray(jnp.sum(jax.tree.leaves(tree)[0]
                                        .astype(jnp.float32))))

    teacher = jax.jit(_make_teacher(recipe, cfg, n_players))
    v_s, v_1 = teacher(srg_params, xs, masks)

    expl_fwd = jax.jit(
        lambda p: recipe.fw_explainer(cfg, p, xs, mask_1, v_1, v_0,
                                      deterministic=True)[0])

    def loss_fn(p, rng):
        phi, _ = recipe.fw_explainer(cfg, p, xs, mask_1, v_1, v_0,
                                     deterministic=False, rng=rng)
        return loss_shapley(masks, v_0, v_s, v_1, phi, None)

    expl_grad = jax.jit(lambda p, rng: jax.value_and_grad(loss_fn)(p, rng))

    step = make_explainer_train_step(recipe, cfg, n_players, N_MASK_SAMPLES,
                                     tx)
    umask = ones_mask(exp_params)
    depth = jnp.asarray(cfg.num_hidden_layers, jnp.int32)

    def run_teacher(i):
        return teacher(srg_params, xs, masks)

    def run_fwd(i):
        return expl_fwd(exp_params)

    def run_grad(i):
        return expl_grad(exp_params, jax.random.fold_in(
            jax.random.PRNGKey(7), i))[0]

    state = {"p": exp_params, "s": opt_state}

    def run_step(i):
        state["p"], state["s"], loss = step(
            state["p"], state["s"], srg_params, v_0, xs,
            jax.random.fold_in(jax.random.PRNGKey(8), i),
            jnp.asarray(1e-4), umask, depth)
        return loss

    out = {}
    for name, fn in (("teacher", run_teacher), ("expl_fwd", run_fwd),
                     ("expl_grad", run_grad), ("full_step", run_step)):
        for i in range(WARMUP):
            fence(fn(i))
        t0 = time.perf_counter()
        for i in range(ITERS):
            fence(fn(WARMUP + i))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        out[name] = ms
        print(json.dumps({"phase": name, "ms": round(ms, 2)}), flush=True)

    resid = out["full_step"] - out["teacher"] - out["expl_grad"]
    print(json.dumps({
        "teacher_ms": round(out["teacher"], 1),
        "expl_fwd_ms": round(out["expl_fwd"], 1),
        "expl_bwd_ms_est": round(out["expl_grad"] - out["expl_fwd"], 1),
        "sampling_opt_overhead_ms": round(resid, 1),
        "full_step_ms": round(out["full_step"], 1),
        "masked_fwds_per_sec": round(BATCH * N_MASK_SAMPLES
                                     / out["full_step"] * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
