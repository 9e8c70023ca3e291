"""Explainer training stage: Shapley-regression against masked surrogate
values (parity: /root/reference/scripts/train_explainer.py).

This is THE hot loop.  TPU-first redesign of the reference's per-batch flow
(train_explainer.py:148-206):
- coalition masks are sampled on-device (no host rng / transfer);
- the B*M masked surrogate forwards go through the recipe's coalition fast
  path (embeddings computed once per input, hidden states batched across the
  coalition axis) instead of replicating inputs in a Python loop;
- surrogate teacher passes + explainer update compile into one XLA program.
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp

from ..ops.shapley import loss_shapley, mask_shapley
from ..recipes.types import surrogate_coalition_values
from ..utils.seeding import iterative_key, set_iterative_seed
from .env import ExpEnv
from .resources import get_recipe, load_cfg_dataset, load_epoch_model, save_epoch_ckpt
from .training import (
    cast_input,
    maybe_enable_debug_nans,
    cosine_lr,
    filter_mask,
    make_optimizer,
    make_train_step,
    ones_mask,
)


def train_explainer(env: ExpEnv) -> None:
    env.log("[[[ train explainer ]]]")
    maybe_enable_debug_nans()
    config = env.config
    recipe, m_config = get_recipe(config)
    if not recipe.training.support_explainer:
        env.log("[[[ skip: explainer cannot be trained ]]]")
        return
    if recipe.training.exp_variant_duo:
        from .train_duo_explainer import train_duo_explainer

        return train_duo_explainer(env)
    if recipe.training.exp_variant_kernel_shap:
        from .train_kernel_shap_explainer import train_kernel_shap_explainer

        return train_kernel_shap_explainer(env)

    d_loader = load_cfg_dataset(config.dataset, env.model_path)
    m_misc = recipe.load_misc(env.model_path, m_config)
    n_players = recipe.n_players(m_config)
    n_mask_samples = config.train_explainer.n_mask_samples
    gen_input = recipe.gen_input(m_config, m_misc)

    _, srg_params = load_epoch_model(env, recipe, "surrogate")
    epoch_start, params = load_epoch_model(env, recipe, "explainer")
    if epoch_start >= config.train_explainer.epochs:
        env.log("[[[ explainer already trained ]]]")
        return

    # multi-device: replicate params, shard the batch/coalition axis
    from ..parallel.mesh import setup_data_parallel

    mesh, place_params, place_batch = setup_data_parallel()
    if mesh is not None:
        env.log(f"[[[ data-parallel over {mesh.devices.size} devices ]]]")
        params = place_params(params)
        srg_params = place_params(srg_params)

    tx, opt_state = make_optimizer(params, recipe.trainable(m_config, "explainer"))

    # surrogate_null: surrogate on the all-on null input, computed once
    nil_xs = jnp.asarray(recipe.gen_null(m_config, m_misc))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = jax.jit(
        lambda p, xs, mask: recipe.fw_surrogate(m_config, p, xs, mask)
    )(srg_params, nil_xs, nil_mask)

    def surrogate_values_fn(srg_p, xs, masks_bmp):
        """<B, M, P> coalition masks -> (<B*M, C> masked values, <B, C> grand)."""
        b = masks_bmp.shape[0]
        mask_1 = jnp.ones((b, n_players), dtype=jnp.int32)
        v_s = surrogate_coalition_values(recipe, m_config, srg_p, xs, masks_bmp)
        v_1, _ = recipe.fw_surrogate(m_config, srg_p, xs, mask_1)
        return v_s, v_1

    is_ltt = recipe.progressive_trainable is not None
    full_depth = getattr(m_config, "num_hidden_layers", 0)

    def _ltt_kw(ltt_active):
        return {"ltt_active_layers": ltt_active} if is_ltt else {}

    def loss_fn(p, xs, masks_bmp, v_0, v_s, v_1, rng, ltt_active):
        b = masks_bmp.shape[0]
        mask_1 = jnp.ones((b, n_players), dtype=jnp.int32)
        phi, _ = recipe.fw_explainer(
            m_config, p, xs, mask_1, v_1, v_0, deterministic=False, rng=rng,
            **_ltt_kw(ltt_active),
        )
        loss = loss_shapley(masks_bmp, v_0, v_s, v_1, phi)
        return loss, phi

    step = make_train_step(tx, loss_fn)
    teacher = jax.jit(surrogate_values_fn)

    @jax.jit
    def eval_loss(p, xs, masks_bmp, v_0, v_s, v_1, ltt_active):
        b = masks_bmp.shape[0]
        mask_1 = jnp.ones((b, n_players), dtype=jnp.int32)
        phi, _ = recipe.fw_explainer(
            m_config, p, xs, mask_1, v_1, v_0, **_ltt_kw(ltt_active)
        )
        return loss_shapley(masks_bmp, v_0, v_s, v_1, phi)

    mask_sampler = jax.jit(
        lambda key, b: mask_shapley(key, b * n_mask_samples, n_players).reshape(
            b, n_mask_samples, n_players
        ),
        static_argnums=1,
    )

    def run_epoch(epoch: int, rng, lr, update_mask, ltt_active, train: bool):
        nonlocal params, opt_state
        reg_loss, total = 0.0, 0
        items = (
            d_loader.train(config.train_explainer.batch_size) if train
            else d_loader.test(config.train_explainer.batch_size)
        )
        tag = "train" if train else "test"
        for batch_idx, (_inputs, _targets) in enumerate(items):
            xs, _zs = gen_input(_inputs, _targets)
            batch = xs.shape[0]
            xs = place_batch(cast_input(jnp.asarray(xs)))
            mask_key = jax.random.fold_in(rng, 2 * batch_idx)
            step_rng = jax.random.fold_in(rng, 2 * batch_idx + 1)
            masks = mask_sampler(mask_key, batch)
            v_s, v_1 = teacher(srg_params, xs, masks)
            if train:
                params, opt_state, loss, _phi = step(
                    params, opt_state, lr, update_mask,
                    xs, masks, surrogate_null, v_s, v_1, step_rng, ltt_active,
                )
            else:
                loss = eval_loss(params, xs, masks, surrogate_null, v_s, v_1,
                                 ltt_active)
            loss_val = float(loss)
            reg_loss += loss_val
            total += batch
            env.log(
                f"  > epoch {epoch} :{batch_idx}:{tag} // "
                f"loss: shap {loss_val / batch:.6f}, fin {total}"
            )
        return reg_loss / max(total, 1)

    for epoch in range(epoch_start + 1, config.train_explainer.epochs + 1):
        set_iterative_seed(config.seed, f"train_explainer[epoch={epoch}]")
        rng = iterative_key(config.seed, f"train_explainer[epoch={epoch}]")
        env.log(f"### epoch {epoch}")

        update_mask = ones_mask(params)
        ltt_active = jnp.asarray(full_depth, jnp.int32)
        if config.train_explainer.EXPERIMENTAL_progressive_training and \
                recipe.progressive_trainable is not None:
            unfrozen = min(math.ceil(epoch / 2), m_config.num_hidden_layers)
            env.log(f"  > freeze side branches exc. first {unfrozen} layers")
            update_mask = filter_mask(
                params, recipe.progressive_trainable(m_config, "explainer", unfrozen)
            )
            ltt_active = jnp.asarray(unfrozen, jnp.int32)

        lr = cosine_lr(config.train_explainer.lr, epoch,
                       config.train_explainer.epochs)
        ts_begin = time.time()
        train_loss = run_epoch(
            epoch, jax.random.fold_in(rng, 0), lr, update_mask, ltt_active,
            train=True,
        )
        test_loss = run_epoch(
            epoch, jax.random.fold_in(rng, 1), lr, update_mask, ltt_active,
            train=False,
        )
        ts_delta = time.time() - ts_begin

        env.metrics({
            "epoch": epoch,
            "train_reg_loss": train_loss,
            "test_reg_loss": test_loss,
            "test_plots": [],
        })
        env.log(
            f"  > epoch {epoch} done in {ts_delta:.2f}s // "
            f"train_loss: shap {train_loss:.6f} // "
            f"test_loss: shap {test_loss:.6f}"
        )
        if save_epoch_ckpt(env.model_path, "explainer",
                           config.train_explainer, epoch, params):
            env.flush_cfg()
