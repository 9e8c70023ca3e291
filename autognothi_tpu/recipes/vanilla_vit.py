"""Recipe: vanilla ViT (/root/reference/recipes/vanilla_vit.py parity).

Quirk preserved: the reference registers this recipe with `id="vanilla_bert"`
(vanilla_vit.py:37, a copy-paste bug) — we keep the honest id but document
the deviation; nothing dispatches on recipe.id.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import RECIPE_VERSION
from ..models.vit import (
    VanillaViTConfig,
    init_vit_classifier,
    init_vit_explainer,
    init_vit_final,
    vit_classifier_fwd,
    vit_explainer_fwd,
    vit_final_fwd,
    vit_surrogate_coalitions_fwd,
    vit_surrogate_fwd,
)
from ..utils.surgery import New, merge_param_dicts
from .types import ModelRecipe, ModelRecipe_Measurements, ModelRecipe_Training


@dataclasses.dataclass
class VanillaViTMisc:
    pass


def _load_misc(m_path: pathlib.Path, cfg: VanillaViTConfig) -> VanillaViTMisc:
    return VanillaViTMisc()


# HF transformers ViTForImageClassification layout -> ours
HF_VIT_RULES = {
    "vit.embeddings.cls_token": ...,
    "vit.embeddings.position_embeddings": ...,
    "vit.embeddings.patch_embeddings.projection.{wb}": ...,
    "vit.encoder.layer.{i}.attention.attention.query.{wb}":
        "vit.encoder.layers.{i}.attention.self.query.{wb}",
    "vit.encoder.layer.{i}.attention.attention.key.{wb}":
        "vit.encoder.layers.{i}.attention.self.key.{wb}",
    "vit.encoder.layer.{i}.attention.attention.value.{wb}":
        "vit.encoder.layers.{i}.attention.self.value.{wb}",
    "vit.encoder.layer.{i}.attention.output.dense.{wb}":
        "vit.encoder.layers.{i}.attention.output.dense.{wb}",
    "vit.encoder.layer.{i}.intermediate.dense.{wb}":
        "vit.encoder.layers.{i}.intermediate.dense.{wb}",
    "vit.encoder.layer.{i}.output.dense.{wb}":
        "vit.encoder.layers.{i}.output.dense.{wb}",
    "vit.encoder.layer.{i}.layernorm_before.{wb}":
        "vit.encoder.layers.{i}.layernorm_before.{wb}",
    "vit.encoder.layer.{i}.layernorm_after.{wb}":
        "vit.encoder.layers.{i}.layernorm_after.{wb}",
    "vit.layernorm.{wb}": ...,
}


def conv_pretrained_classifier(cfg: VanillaViTConfig, bundle: Any, key: jax.Array):
    """`bundle` is a flat name->np.ndarray dict; either already in our
    classifier layout, or an HF ViTForImageClassification state dict."""
    dst = init_vit_classifier(key, cfg)
    if "vit.encoder.layers.0.attention.self.query.weight" in bundle:
        return merge_param_dicts(({"{_}": ...}, bundle), into=dst)
    if "vit.encoder.layer.0.attention.attention.query.weight" in bundle:
        rules = dict(HF_VIT_RULES)
        num_labels_match = (
            "classifier.weight" in bundle
            and bundle["classifier.weight"].shape[0] == cfg.num_labels
        )
        if num_labels_match:
            rules["classifier.{wb}"] = ...
        else:
            rules["classifier.{wb}"] = None
            rules[New()] = "classifier.{wb}"
        return merge_param_dicts((rules, bundle), into=dst)
    raise ValueError("unrecognized pretrained ViT bundle layout")


def conv_classifier_surrogate(cfg, _misc, classifier, key):
    dst = init_vit_classifier(key, cfg)
    rules = {
        "vit.{_}": ...,
        "classifier.{_}": ...,  # re-use pretrained knowledge
    }
    return merge_param_dicts((rules, classifier), into=dst)


def conv_surrogate_explainer(cfg, _misc, surrogate, key):
    dst = init_vit_explainer(key, cfg)
    rules = {
        "vit.{_}": ...,
        "classifier.{_}": None,
        New(): "explainer_attn.{rest}",
        New(): "explainer_mlp.{rest}",
    }
    return merge_param_dicts((rules, surrogate), into=dst)


def _np_null(cfg: VanillaViTConfig) -> np.ndarray:
    return np.zeros(
        (1, cfg.img_channels, cfg.img_px_size, cfg.img_px_size), dtype=np.float32
    )


def fw_xs_preprocess(xs, mask):
    """Prepend the always-on CLS column to the player mask
    (recipes/vanilla_vit.py:219-224)."""
    cls_col = jnp.ones((mask.shape[0], 1), dtype=mask.dtype)
    return xs, jnp.concatenate([cls_col, mask], axis=1)


def fw_classifier(cfg, params, xs, mask, **kw):
    xs, mask = fw_xs_preprocess(xs, mask)
    probs, _ = vit_classifier_fwd(params, cfg, xs, mask, **kw)
    return probs, probs


def fw_surrogate(cfg, params, xs, mask, **kw):
    xs, mask = fw_xs_preprocess(xs, mask)
    probs, _ = vit_surrogate_fwd(params, cfg, xs, mask, **kw)
    return probs, None


def fw_explainer(cfg, params, xs, mask, grand, null, **kw):
    xs, mask = fw_xs_preprocess(xs, mask)
    attr, _ = vit_explainer_fwd(params, cfg, xs, mask, grand, null, **kw)
    return attr, None


def fw_final(cfg, params, xs, **kw):
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    mask = jnp.ones((xs.shape[0], 1 + n_players), dtype=jnp.int32)
    probs, attr, _ = vit_final_fwd(params, cfg, xs, mask, **kw)
    return probs, attr


def fw_classifier_repr(cfg, params, xs, mask, **kw):
    xs, mask = fw_xs_preprocess(xs, mask)
    probs, obs = vit_classifier_fwd(params, cfg, xs, mask, **kw)
    return probs, obs["repr_cls"]


def fw_explainer_repr(cfg, params, xs, mask, grand, null, **kw):
    xs, mask = fw_xs_preprocess(xs, mask)
    attr, obs = vit_explainer_fwd(params, cfg, xs, mask, grand, null, **kw)
    return attr, obs["repr_exp"]


def fw_surrogate_coalitions(cfg, params, xs, masks, **kw):
    """masks: <B, M, n_players> (no CLS column) -> <B, M, n_classes>."""
    b, m = masks.shape[:2]
    cls_col = jnp.ones((b, m, 1), dtype=masks.dtype)
    full = jnp.concatenate([cls_col, masks], axis=-1)
    return vit_surrogate_coalitions_fwd(params, cfg, xs, full, **kw)


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    # replay the surrogate on the null input to bake `surrogate_null`
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    nil_xs = jnp.asarray(_np_null(cfg))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    dst = init_vit_final(key, cfg)
    return merge_param_dicts(
        ({"{_}": "classifier.{_}"}, classifier),
        ({"{_}": "surrogate.{_}"}, surrogate),
        ({"{_}": "explainer.{_}"}, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def _gen_input(cfg: VanillaViTConfig, misc):
    def collate(raw_xs, raw_ys) -> Tuple[np.ndarray, np.ndarray]:
        xs = np.stack([np.asarray(x, dtype=np.float32) for x in raw_xs])
        ys = np.asarray(raw_ys, dtype=np.int64)
        return xs, ys

    return collate


def _trainable(cfg: VanillaViTConfig, section: str):
    if section in ("classifier", "final"):
        # the black-box classifier is frozen (vanilla_vit.py:45-49); in the
        # final model only the classifier branch is frozen
        if section == "classifier":
            return lambda name: False
        return lambda name: not name.startswith("classifier.")
    return lambda name: True


def vanilla_vit_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="vanilla_vit",  # reference says "vanilla_bert" here — known bug
        version=RECIPE_VERSION,
        t_config=VanillaViTConfig,
        init_classifier=init_vit_classifier,
        init_surrogate=init_vit_classifier,
        init_explainer=init_vit_explainer,
        init_final=init_vit_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=conv_pretrained_classifier,
        conv_classifier_surrogate=conv_classifier_surrogate,
        conv_surrogate_explainer=conv_surrogate_explainer,
        conv_explainer_final=conv_explainer_final,
        n_players=lambda cfg: (cfg.img_px_size // cfg.img_patch_size) ** 2,
        gen_input=_gen_input,
        gen_null=lambda cfg, misc: _np_null(cfg),
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
        trainable=_trainable,
        fw_classifier_repr=fw_classifier_repr,
        fw_explainer_repr=fw_explainer_repr,
    )
