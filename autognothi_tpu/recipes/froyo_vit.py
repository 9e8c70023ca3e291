"""Recipe: froyo ViT (parity: /root/reference/recipes/froyo_vit.py)."""

from __future__ import annotations

import dataclasses
import pathlib

import jax
import jax.numpy as jnp

from .. import RECIPE_VERSION
from ..models.froyo_vit import (
    FroyoViTConfig,
    froyo_vit_final_fwd,
    froyo_vit_trainable,
    init_froyo_vit_final,
)
from ..models.vit import init_vit_classifier, init_vit_explainer
from ..utils.surgery import merge_param_dicts
from . import vanilla_vit as vv
from .types import ModelRecipe, ModelRecipe_Measurements, ModelRecipe_Training


@dataclasses.dataclass
class FroyoViTMisc:
    pass


def _load_misc(m_path: pathlib.Path, cfg: FroyoViTConfig) -> FroyoViTMisc:
    return FroyoViTMisc()


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    nil_xs = jnp.asarray(vv._np_null(cfg))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = vv.fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    dst = init_froyo_vit_final(key, cfg)
    return merge_param_dicts(
        ({"vit.{_}": ..., "classifier.{_}": ...}, classifier),
        ({"vit.{_}": None, "classifier.{_}": "srg_classifier.{_}"}, surrogate),
        ({"vit.{_}": None, "explainer_attn.{_}": ...,
          "explainer_mlp.{_}": ...}, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def fw_final(cfg, params, xs, **kw):
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    mask = jnp.ones((xs.shape[0], 1 + n_players), dtype=jnp.int32)
    probs, attr, _ = froyo_vit_final_fwd(params, cfg, xs, mask, **kw)
    return probs, attr


def froyo_vit_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="froyo_vit",
        version=RECIPE_VERSION,
        t_config=FroyoViTConfig,
        init_classifier=init_vit_classifier,
        init_surrogate=init_vit_classifier,
        init_explainer=init_vit_explainer,
        init_final=init_froyo_vit_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=vv.conv_pretrained_classifier,
        conv_classifier_surrogate=vv.conv_classifier_surrogate,
        conv_surrogate_explainer=vv.conv_surrogate_explainer,
        conv_explainer_final=conv_explainer_final,
        n_players=lambda cfg: (cfg.img_px_size // cfg.img_patch_size) ** 2,
        gen_input=vv._gen_input,
        gen_null=lambda cfg, misc: vv._np_null(cfg),
        training=ModelRecipe_Training(
            support_classifier=True,
            support_surrogate=True,
            support_explainer=True,
            exp_variant_duo=False,
            exp_variant_kernel_shap=False,
        ),
        fw_classifier=vv.fw_classifier,
        fw_surrogate=vv.fw_surrogate,
        fw_explainer=vv.fw_explainer,
        fw_final=fw_final,
        fw_surrogate_coalitions=vv.fw_surrogate_coalitions,
        measurements=ModelRecipe_Measurements(
            verify_final_coherency=True,
            allow_accuracy=True,
            allow_faithfulness=True,
            allow_cls_acc=True,
            allow_performance_cls=True,
            allow_performance_srg_exp=True,
            allow_performance_fin=True,
            allow_train_resources=True,
            allow_dual_task_similarity=False,
            allow_branches_cka=True,
        ),
        trainable=froyo_vit_trainable,
        fw_classifier_repr=vv.fw_classifier_repr,
        fw_explainer_repr=vv.fw_explainer_repr,
    )
