"""KernelSHAP "trainer": compress the training set with k-means and store it
as the explainer's background matrix (parity: /root/reference/scripts/
train_kernel_shap_explainer.py)."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..ops.kernel_shap import kmeans_compress
from .env import ExpEnv
from .resources import get_recipe, load_cfg_dataset, load_epoch_model, save_epoch_ckpt


def train_kernel_shap_explainer(env: ExpEnv) -> None:
    config = env.config
    recipe, m_config = get_recipe(config)
    if (
        not recipe.training.support_explainer
        and not recipe.training.exp_variant_kernel_shap
    ):
        env.log("[[[ skip: explainer cannot be trained ]]]")
        return

    d_loader = load_cfg_dataset(config.dataset, env.model_path)
    m_misc = recipe.load_misc(env.model_path, m_config)
    gen_input = recipe.gen_input(m_config, m_misc)

    epoch_exp, exp_params = load_epoch_model(env, recipe, "explainer")
    if epoch_exp >= config.train_explainer.epochs:
        env.log("[[[ explainer already trained ]]]")
        return

    env.log("> loading data...")
    all_xs: List[np.ndarray] = []
    for _inputs, _targets in d_loader.train(config.train_explainer.batch_size):
        xs, _zs = gen_input(_inputs, _targets)
        all_xs.append(np.asarray(xs))
    data = np.concatenate(all_xs, axis=0)
    env.log(f"> received bulk data: {data.shape}")

    if config.net.kind != "kernel_shap_bert":
        raise ValueError(f"unsupported model: {config.net.kind}")
    data_size = m_config.kernel_shap_data_size
    centers, _weights = kmeans_compress(data, data_size, seed=config.seed)
    env.log(f"> compressed data: {centers.shape}")

    exp_params = dict(exp_params)
    exp_params["Xs_train"] = jnp.asarray(centers.astype(np.int64))
    env.log("> loaded precomputed parameters")

    if save_epoch_ckpt(
        env.model_path, "explainer", config.train_explainer,
        config.train_explainer.epochs, exp_params,
    ):
        env.flush_cfg()
