"""The fused, shardable explainer training step — the framework's hot path.

One XLA program per step: on-device paired-complement coalition sampling,
the B*M masked surrogate teacher forwards (embeddings amortized via the
recipe's coalition fast path), the explainer forward/backward, and the AdamW
update.  Under a Mesh, the batch/coalition axes shard along "data" and the
Megatron param specs (parallel.mesh.param_pspec) shard attention/MLP blocks
along "model"; GSPMD inserts the psum/all-reduce collectives.

Replaces the reference's five-kernel-launch + host-rng + input-replication
loop (/root/reference/scripts/train_explainer.py:148-206).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.shapley import loss_shapley, mask_shapley
from ..recipes.types import ModelRecipe, Params, surrogate_coalition_values


def make_explainer_train_step(
    recipe: ModelRecipe,
    m_config: Any,
    n_players: int,
    n_mask_samples: int,
    tx: optax.GradientTransformation,
) -> Callable:
    """-> step(params, opt_state, srg_params, surrogate_null, xs, key, lr)
            -> (params, opt_state, loss)"""

    def teacher(srg_params: Params, xs, masks_bmp):
        b = masks_bmp.shape[0]
        mask_1 = jnp.ones((b, n_players), dtype=jnp.int32)
        v_s = surrogate_coalition_values(recipe, m_config, srg_params, xs, masks_bmp)
        v_1, _ = recipe.fw_surrogate(m_config, srg_params, xs, mask_1)
        return v_s, v_1

    def loss_fn(params, xs, masks_bmp, v_0, v_s, v_1, rng):
        b = masks_bmp.shape[0]
        mask_1 = jnp.ones((b, n_players), dtype=jnp.int32)
        phi, _ = recipe.fw_explainer(
            m_config, params, xs, mask_1, v_1, v_0,
            deterministic=rng is None, rng=rng,
        )
        return loss_shapley(masks_bmp, v_0, v_s, v_1, phi)

    @jax.jit
    def step(params, opt_state, srg_params, surrogate_null, xs, key, lr):
        b = xs.shape[0]
        mask_key, drop_key = jax.random.split(key)
        masks = mask_shapley(mask_key, b * n_mask_samples, n_players)
        masks = masks.reshape(b, n_mask_samples, n_players)
        v_s, v_1 = teacher(srg_params, xs, masks)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, xs, masks, surrogate_null, v_s, v_1, drop_key
        )
        opt_state = optax.tree_utils.tree_set(opt_state, learning_rate=lr)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
