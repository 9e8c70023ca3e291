"""Duo explainer trainer: joint classification + Shapley objective
(parity: /root/reference/scripts/train_duo_explainer.py, loss = cls + shap
at :195).  Shares the TPU-first structure of train_explainer: on-device
masks, coalition fast path, one fused step."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.shapley import loss_shapley, mask_shapley
from ..recipes.types import surrogate_coalition_values
from ..utils.seeding import iterative_key, set_iterative_seed
from .env import ExpEnv
from .resources import get_recipe, load_cfg_dataset, load_epoch_model, save_epoch_ckpt
from .training import (
    cast_input,
    maybe_enable_debug_nans,
    cosine_lr,
    cross_entropy_on_probs,
    make_optimizer,
    make_train_step,
    ones_mask,
)


def train_duo_explainer(env: ExpEnv) -> None:
    env.log("[[[ train duo explainer ]]]")
    maybe_enable_debug_nans()
    config = env.config
    recipe, m_config = get_recipe(config)

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

    tx, opt_state = make_optimizer(params, recipe.trainable(m_config, "explainer"))

    nil_xs = jnp.asarray(recipe.gen_null(m_config, m_misc))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = jax.jit(
        lambda p, xs, mask: recipe.fw_surrogate(m_config, p, xs, mask)
    )(srg_params, nil_xs, nil_mask)

    @jax.jit
    def teacher(p, xs, masks_bmp):
        b = masks_bmp.shape[0]
        mask_1 = jnp.ones((b, n_players), jnp.int32)
        v_s = surrogate_coalition_values(recipe, m_config, p, xs, masks_bmp)
        v_1, _ = recipe.fw_surrogate(m_config, p, xs, mask_1)
        return v_s, v_1

    def joint_loss(p, xs, zs, masks_bmp, v_0, v_s, v_1, rng):
        b = masks_bmp.shape[0]
        mask_1 = jnp.ones((b, n_players), jnp.int32)
        phi, base_ys = recipe.fw_explainer(
            m_config, p, xs, mask_1, v_1, v_0,
            deterministic=rng is None, rng=rng,
        )
        loss_cls = cross_entropy_on_probs(base_ys, zs)
        loss_shap = loss_shapley(masks_bmp, v_0, v_s, v_1, phi)
        return loss_cls + loss_shap, (loss_cls, loss_shap, base_ys)

    step = make_train_step(tx, joint_loss)
    eval_loss = jax.jit(
        lambda p, xs, zs, masks, v_0, v_s, v_1: joint_loss(
            p, xs, zs, masks, v_0, v_s, v_1, None
        )
    )

    def run_epoch(epoch: int, rng, lr, train: bool):
        nonlocal params, opt_state
        cls_sum, reg_sum, tot_sum, correct, total = 0.0, 0.0, 0.0, 0, 0
        items = (
            d_loader.train(config.train_explainer.batch_size) if train
            else d_loader.test(config.train_explainer.batch_size)
        )
        tag = "train" if train else "test"
        update_mask = ones_mask(params)
        for batch_idx, (_inputs, _targets) in enumerate(items):
            xs, zs = gen_input(_inputs, _targets)
            batch = xs.shape[0]
            xs, zs = cast_input(jnp.asarray(xs)), jnp.asarray(zs)
            mask_key = jax.random.fold_in(rng, 2 * batch_idx)
            step_rng = jax.random.fold_in(rng, 2 * batch_idx + 1)
            masks = mask_shapley(mask_key, batch * n_mask_samples, n_players)
            masks = masks.reshape(batch, n_mask_samples, n_players)
            v_s, v_1 = teacher(srg_params, xs, masks)
            if train:
                params, opt_state, loss, aux = step(
                    params, opt_state, lr, update_mask,
                    xs, zs, masks, surrogate_null, v_s, v_1, step_rng,
                )
            else:
                loss, aux = eval_loss(params, xs, zs, masks, surrogate_null,
                                      v_s, v_1)
            loss_cls, loss_shap, base_ys = aux
            cls_v, reg_v, tot_v = float(loss_cls), float(loss_shap), float(loss)
            cls_sum += cls_v
            reg_sum += reg_v
            tot_sum += tot_v
            correct += int(np.sum(np.argmax(np.asarray(base_ys), axis=1)
                                  == np.asarray(zs)))
            total += batch
            env.log(
                f"  > epoch {epoch} :{batch_idx}:{tag} // "
                f"loss: cls {cls_v / batch:.6f} shap {reg_v / batch:.6f} "
                f"tot {tot_v / batch:.6f} // "
                f"acc: {100.0 * correct / total:.3f}%, {correct}/{total}"
            )
        total = max(total, 1)
        return cls_sum / total, reg_sum / total, tot_sum / total, correct / total

    for epoch in range(epoch_start + 1, config.train_explainer.epochs + 1):
        set_iterative_seed(config.seed, f"train_explainer[epoch={epoch}]")
        rng = iterative_key(config.seed, f"train_explainer[epoch={epoch}]")
        env.log(f"### epoch {epoch}")
        lr = cosine_lr(config.train_explainer.lr, epoch,
                       config.train_explainer.epochs)
        ts_begin = time.time()
        tr_cls, tr_reg, tr_tot, tr_acc = run_epoch(
            epoch, jax.random.fold_in(rng, 0), lr, train=True
        )
        te_cls, te_reg, te_tot, te_acc = run_epoch(
            epoch, jax.random.fold_in(rng, 1), lr, train=False
        )
        ts_delta = time.time() - ts_begin

        env.metrics({
            "epoch": epoch,
            "train_cls_loss": tr_cls,
            "train_reg_loss": tr_reg,
            "train_loss": tr_tot,
            "train_cls_acc": tr_acc,
            "test_cls_loss": te_cls,
            "test_reg_loss": te_reg,
            "test_loss": te_tot,
            "test_cls_acc": te_acc,
            "test_plots": [],
        })
        env.log(
            f"  > epoch {epoch} done in {ts_delta:.2f}s // "
            f"train_loss: shap {tr_reg:.6f} // test_loss: shap {te_reg:.6f}"
        )
        if save_epoch_ckpt(env.model_path, "explainer",
                           config.train_explainer, epoch, params):
            env.flush_cfg()
