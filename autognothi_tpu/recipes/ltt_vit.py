"""Recipe: LTT ViT (parity: /root/reference/recipes/ltt_vit.py)."""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any

import jax
import jax.numpy as jnp

from .. import RECIPE_VERSION
from ..models.ltt_vit import (
    LttViTConfig,
    init_ltt_vit_explainer,
    init_ltt_vit_final,
    init_ltt_vit_surrogate,
    ltt_vit_explainer_fwd,
    ltt_vit_final_fwd,
    ltt_vit_progressive,
    ltt_vit_surrogate_coalitions_fwd,
    ltt_vit_surrogate_fwd,
    ltt_vit_trainable,
)
from ..utils.surgery import New, merge_param_dicts
from . import vanilla_vit as vv
from .types import ModelRecipe, ModelRecipe_Measurements, ModelRecipe_Training


@dataclasses.dataclass
class LttViTMisc:
    pass


def _load_misc(m_path: pathlib.Path, cfg: LttViTConfig) -> LttViTMisc:
    return LttViTMisc()


def conv_pretrained_classifier(cfg: LttViTConfig, bundle: Any, key: jax.Array):
    k_v, k_dst = jax.random.split(key)
    v_classifier = vv.conv_pretrained_classifier(cfg.into(), bundle, k_v)
    dst = init_ltt_vit_surrogate(k_dst, cfg)
    rules = {
        "vit.embeddings.{_}": ...,
        "vit.encoder.layers.{_}": ...,
        "vit.layernorm.{wb}": ...,
        "classifier.{wb}": ...,
        New(): "vit.encoder.s_attn_maps.0_{rest}",
        New(): "vit.encoder.s_attn_layers.0_{rest}",
        New(): "vit.s_attn_layernorm.0.{wb}",
        New(): "s_attn_classifier.{wb}",
    }
    return merge_param_dicts((rules, v_classifier), into=dst)


def conv_classifier_surrogate(cfg, _misc, classifier, key):
    dst = init_ltt_vit_surrogate(key, cfg)
    rules = {
        "vit.{_}": ...,
        "classifier.{_}": ...,
        "s_attn_classifier.{_}": ...,
    }
    return merge_param_dicts((rules, classifier), into=dst)


def conv_surrogate_explainer(cfg, _misc, surrogate, key):
    dst = init_ltt_vit_explainer(key, cfg)
    rules = {
        "vit.{_}": ...,  # incl. the trained branch-0 ladder + its layernorm
        "classifier.{_}": ...,
        "s_attn_classifier.{wb}": None,
        New(): "s_explainer_attn.{rest}",
        New(): "s_explainer_mlp.{rest}",
    }
    return merge_param_dicts((rules, surrogate), into=dst)


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    nil_xs = jnp.asarray(vv._np_null(cfg))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    rules_cls = {
        "vit.embeddings.{_}": ...,
        "vit.encoder.layers.{_}": ...,
        "vit.layernorm.{wb}": ...,
        "classifier.{wb}": ...,
        "vit.encoder.s_attn_maps.0_{rest}": None,
        "vit.encoder.s_attn_layers.0_{rest}": None,
        "vit.s_attn_layernorm.0.{wb}": None,
        "s_attn_classifier.{wb}": None,
    }
    rules_srg = {
        "vit.embeddings.{_}": None,
        "vit.encoder.layers.{_}": None,
        "vit.layernorm.{wb}": None,
        "classifier.{_}": None,
        "vit.encoder.s_attn_maps.0_{rest}": ...,
        "vit.encoder.s_attn_layers.0_{rest}": ...,
        "vit.s_attn_layernorm.0.{wb}": ...,
        "s_attn_classifier.{wb}": ...,
    }
    rules_exp = {
        "vit.embeddings.{_}": None,
        "vit.encoder.layers.{_}": None,
        "vit.layernorm.{wb}": None,
        "classifier.{_}": None,
        "vit.encoder.s_attn_maps.0_{rest}": "vit.encoder.s_attn_maps.1_{rest}",
        "vit.encoder.s_attn_layers.0_{rest}":
            "vit.encoder.s_attn_layers.1_{rest}",
        "vit.s_attn_layernorm.0.{wb}": "vit.s_attn_layernorm.1.{wb}",
        "s_explainer_attn.{_}": ...,
        "s_explainer_mlp.{_}": ...,
    }
    dst = init_ltt_vit_final(key, cfg)
    return merge_param_dicts(
        (rules_cls, classifier),
        (rules_srg, surrogate),
        (rules_exp, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def fw_classifier(cfg, params, xs, mask, **kw):
    xs, mask = vv.fw_xs_preprocess(xs, mask)
    srg_logits, logits, _ = ltt_vit_surrogate_fwd(params, cfg, xs, mask, **kw)
    return srg_logits, logits


def fw_surrogate(cfg, params, xs, mask, **kw):
    xs, mask = vv.fw_xs_preprocess(xs, mask)
    srg_logits, logits, _ = ltt_vit_surrogate_fwd(params, cfg, xs, mask, **kw)
    return srg_logits, logits


def fw_explainer(cfg, params, xs, mask, grand, null, **kw):
    xs, mask = vv.fw_xs_preprocess(xs, mask)
    attr, logits, _ = ltt_vit_explainer_fwd(
        params, cfg, xs, mask, grand, null, **kw
    )
    return attr, logits


def fw_final(cfg, params, xs, **kw):
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    mask = jnp.ones((xs.shape[0], 1 + n_players), dtype=jnp.int32)
    logits, attr, _ = ltt_vit_final_fwd(params, cfg, xs, mask, **kw)
    return logits, attr


def fw_surrogate_coalitions(cfg, params, xs, masks, **kw):
    b, m = masks.shape[:2]
    cls_col = jnp.ones((b, m, 1), dtype=masks.dtype)
    full = jnp.concatenate([cls_col, masks], axis=-1)
    return ltt_vit_surrogate_coalitions_fwd(params, cfg, xs, full, **kw)


def fw_classifier_repr(cfg, params, xs, mask, **kw):
    xs, mask = vv.fw_xs_preprocess(xs, mask)
    srg_logits, _logits, obs = ltt_vit_surrogate_fwd(params, cfg, xs, mask, **kw)
    return srg_logits, obs["repr_cls"]


def fw_explainer_repr(cfg, params, xs, mask, grand, null, **kw):
    xs, mask = vv.fw_xs_preprocess(xs, mask)
    attr, _logits, obs = ltt_vit_explainer_fwd(
        params, cfg, xs, mask, grand, null, **kw
    )
    return attr, obs["repr_exp"]


def ltt_vit_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="ltt_vit",
        version=RECIPE_VERSION,
        t_config=LttViTConfig,
        init_classifier=init_ltt_vit_surrogate,
        init_surrogate=init_ltt_vit_surrogate,
        init_explainer=init_ltt_vit_explainer,
        init_final=init_ltt_vit_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=conv_pretrained_classifier,
        conv_classifier_surrogate=conv_classifier_surrogate,
        conv_surrogate_explainer=conv_surrogate_explainer,
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
        fw_classifier=fw_classifier,
        fw_surrogate=fw_surrogate,
        fw_explainer=fw_explainer,
        fw_final=fw_final,
        fw_surrogate_coalitions=fw_surrogate_coalitions,
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
        trainable=ltt_vit_trainable,
        progressive_trainable=ltt_vit_progressive,
        fw_classifier_repr=fw_classifier_repr,
        fw_explainer_repr=fw_explainer_repr,
    )
