"""Recipe: duo vanilla ViT (parity: /root/reference/recipes/
duo_vanilla_vit.py + duo_vanilla_vit_inspect.py)."""

from __future__ import annotations

import dataclasses
import pathlib

import jax
import jax.numpy as jnp

from .. import RECIPE_VERSION
from ..models.common import subdict
from ..models.duo_vit import (
    DuoVanillaViTConfig,
    duo_vit_explainer_from_emb,
    duo_vit_explainer_fwd,
    duo_vit_final_fwd,
    init_duo_vit_explainer,
    init_duo_vit_final,
)
from ..models.vit import init_vit_classifier, vit_embeddings
from ..ops.shapley import loss_shapley
from ..pipeline.training import cross_entropy_on_probs
from ..utils.surgery import New, merge_param_dicts
from . import vanilla_vit as vv
from .types import (
    ModelRecipe,
    ModelRecipe_Measurements,
    ModelRecipe_Measurements_DualTaskSimilarity,
    ModelRecipe_Training,
)


@dataclasses.dataclass
class DuoVanillaViTMisc:
    pass


def _load_misc(m_path: pathlib.Path, cfg) -> DuoVanillaViTMisc:
    return DuoVanillaViTMisc()


def conv_surrogate_explainer(cfg, _misc, surrogate, key):
    dst = init_duo_vit_explainer(key, cfg)
    rules = {
        "vit.{_}": ...,
        "classifier.{_}": ...,
        New(): "explainer_attn.{rest}",
        New(): "explainer_mlp.{rest}",
    }
    return merge_param_dicts((rules, surrogate), into=dst)


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    nil_xs = jnp.asarray(vv._np_null(cfg))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = vv.fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    dst = init_duo_vit_final(key, cfg)
    return merge_param_dicts(
        ({"{_}": "surrogate.{_}"}, surrogate),
        ({"{_}": "explainer.{_}"}, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def fw_explainer(cfg, params, xs, mask, grand, null, **kw):
    xs, mask = vv.fw_xs_preprocess(xs, mask)
    logits, attr, _ = duo_vit_explainer_fwd(
        params, cfg, xs, mask, grand, null, **kw
    )
    return attr, logits


def fw_final(cfg, params, xs, **kw):
    n_players = (cfg.img_px_size // cfg.img_patch_size) ** 2
    mask = jnp.ones((xs.shape[0], 1 + n_players), dtype=jnp.int32)
    logits, attr, _ = duo_vit_final_fwd(params, cfg, xs, mask, **kw)
    return logits, attr


def fw_explainer_repr(cfg, params, xs, mask, grand, null, **kw):
    xs, mask = vv.fw_xs_preprocess(xs, mask)
    _logits, attr, obs = duo_vit_explainer_fwd(
        params, cfg, xs, mask, grand, null, **kw
    )
    return attr, obs["repr_exp"]


def grad_probe(cfg, params, xs, mask, grand, null, zs, masks_bmp, v_0, v_s, v_1):
    xs, mask_full = vv.fw_xs_preprocess(xs, mask)
    emb = vit_embeddings(subdict(params, "vit."), cfg, xs)

    def cls_loss(e):
        logits, _attr, _ = duo_vit_explainer_from_emb(
            params, cfg, e, mask_full, grand, null
        )
        return cross_entropy_on_probs(logits, zs)

    def exp_loss(e):
        _logits, attr, _ = duo_vit_explainer_from_emb(
            params, cfg, e, mask_full, grand, null
        )
        return loss_shapley(masks_bmp, v_0, v_s, v_1, attr)

    return jax.grad(cls_loss)(emb), jax.grad(exp_loss)(emb)


def _trainable(cfg, section: str):
    if section == "classifier":
        return lambda name: False
    return lambda name: True


def duo_vanilla_vit_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="duo_vanilla_vit",
        version=RECIPE_VERSION,
        t_config=DuoVanillaViTConfig,
        init_classifier=init_vit_classifier,
        init_surrogate=init_vit_classifier,
        init_explainer=init_duo_vit_explainer,
        init_final=init_duo_vit_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=vv.conv_pretrained_classifier,
        conv_classifier_surrogate=vv.conv_classifier_surrogate,
        conv_surrogate_explainer=conv_surrogate_explainer,
        conv_explainer_final=conv_explainer_final,
        n_players=lambda cfg: (cfg.img_px_size // cfg.img_patch_size) ** 2,
        gen_input=vv._gen_input,
        gen_null=lambda cfg, misc: vv._np_null(cfg),
        training=ModelRecipe_Training(
            support_classifier=True,
            support_surrogate=True,
            support_explainer=True,
            exp_variant_duo=True,
            exp_variant_kernel_shap=False,
        ),
        fw_classifier=vv.fw_classifier,
        fw_surrogate=vv.fw_surrogate,
        fw_explainer=fw_explainer,
        fw_final=fw_final,
        fw_surrogate_coalitions=vv.fw_surrogate_coalitions,
        measurements=ModelRecipe_Measurements(
            verify_final_coherency=False,
            allow_accuracy=True,
            allow_faithfulness=True,
            allow_cls_acc=True,
            allow_performance_cls=True,
            allow_performance_srg_exp=True,
            allow_performance_fin=True,
            allow_train_resources=True,
            allow_dual_task_similarity=(
                ModelRecipe_Measurements_DualTaskSimilarity(
                    allow=True, grad_probe=grad_probe
                )
            ),
            allow_branches_cka=True,
        ),
        trainable=_trainable,
        fw_classifier_repr=vv.fw_classifier_repr,
        fw_explainer_repr=fw_explainer_repr,
    )
