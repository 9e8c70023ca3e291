"""Recipe: duo vanilla BERT (parity: /root/reference/recipes/
duo_vanilla_bert.py + duo_vanilla_bert_inspect.py).

`fw_explainer` returns (attr, raw logits); the final carries surrogate +
explainer only; coherency verification is off (duo_vanilla_bert.py:75); the
dual-task inspector is a pure grad probe over the shared input embedding."""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any

import jax
import jax.numpy as jnp

from .. import RECIPE_VERSION
from ..data.tokenizer import load_tokenizer
from ..models.bert import bert_embeddings, init_bert_classifier
from ..models.common import subdict
from ..models.duo_bert import (
    DuoVanillaBertConfig,
    duo_bert_explainer_from_emb,
    duo_bert_explainer_fwd,
    duo_bert_final_fwd,
    init_duo_bert_explainer,
    init_duo_bert_final,
)
from ..ops.shapley import loss_shapley
from ..pipeline.training import cross_entropy_on_probs
from ..utils.surgery import New, merge_param_dicts
from . import vanilla_bert as vb
from .types import (
    ModelRecipe,
    ModelRecipe_Measurements,
    ModelRecipe_Measurements_DualTaskSimilarity,
    ModelRecipe_Training,
)


@dataclasses.dataclass
class DuoVanillaBertMisc:
    tokenizer: Any


def _load_misc(m_path: pathlib.Path, cfg) -> DuoVanillaBertMisc:
    return DuoVanillaBertMisc(tokenizer=load_tokenizer(m_path / "tokenizer"))


def conv_surrogate_explainer(cfg, _misc, surrogate, key):
    dst = init_duo_bert_explainer(key, cfg)
    rules = {
        "bert.{_}": ...,
        "bert_pooler.{_}": ...,
        "classifier.{_}": ...,
        New(): "explainer_attn.{rest}",
        New(): "explainer_mlp.{rest}",
    }
    return merge_param_dicts((rules, surrogate), into=dst)


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    n_players = cfg.max_position_embeddings - 1
    nil_xs = jnp.asarray(vb._null_ids(cfg, misc))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = vb.fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    dst = init_duo_bert_final(key, cfg)
    return merge_param_dicts(
        ({"{_}": "surrogate.{_}"}, surrogate),
        ({"{_}": "explainer.{_}"}, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def fw_explainer(cfg, params, xs, mask, grand, null, **kw):
    xs, mask, ttype = vb.fw_xs_preprocess(xs, mask)
    logits, attr, _ = duo_bert_explainer_fwd(
        params, cfg, xs, mask, ttype, grand, null, **kw
    )
    return attr, logits


def fw_final(cfg, params, xs, **kw):
    mask = jnp.ones_like(xs)
    ttype = jnp.zeros_like(xs)
    logits, attr, _ = duo_bert_final_fwd(params, cfg, xs, mask, ttype, **kw)
    return logits, attr


def fw_explainer_repr(cfg, params, xs, mask, grand, null, **kw):
    xs, mask, ttype = vb.fw_xs_preprocess(xs, mask)
    _logits, attr, obs = duo_bert_explainer_fwd(
        params, cfg, xs, mask, ttype, grand, null, **kw
    )
    return attr, obs["repr_exp"]


def grad_probe(cfg, params, xs, mask, grand, null, zs, masks_bmp, v_0, v_s, v_1):
    """Input-embedding gradients of the CE loss vs the Shapley loss
    (the jax.grad replacement of the reference's TorchGradientHook over the
    detached re-grad embedding, duo_vanilla_bert_inspect.py:54-65)."""
    xs, mask_full, ttype = vb.fw_xs_preprocess(xs, mask)
    emb = bert_embeddings(subdict(params, "bert."), cfg, xs, ttype)

    def cls_loss(e):
        logits, _attr, _ = duo_bert_explainer_from_emb(
            params, cfg, e, mask_full, grand, null
        )
        return cross_entropy_on_probs(logits, zs)

    def exp_loss(e):
        _logits, attr, _ = duo_bert_explainer_from_emb(
            params, cfg, e, mask_full, grand, null
        )
        return loss_shapley(masks_bmp, v_0, v_s, v_1, attr)

    return jax.grad(cls_loss)(emb), jax.grad(exp_loss)(emb)


def _trainable(cfg, section: str):
    if section == "classifier":
        return lambda name: False
    return lambda name: True


def duo_vanilla_bert_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="duo_vanilla_bert",
        version=RECIPE_VERSION,
        t_config=DuoVanillaBertConfig,
        init_classifier=init_bert_classifier,
        init_surrogate=init_bert_classifier,
        init_explainer=init_duo_bert_explainer,
        init_final=init_duo_bert_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=vb.conv_pretrained_classifier,
        conv_classifier_surrogate=vb.conv_classifier_surrogate,
        conv_surrogate_explainer=conv_surrogate_explainer,
        conv_explainer_final=conv_explainer_final,
        n_players=lambda cfg: cfg.max_position_embeddings - 1,
        gen_input=vb._gen_input,
        gen_null=lambda cfg, misc: vb._null_ids(cfg, misc),
        training=ModelRecipe_Training(
            support_classifier=True,
            support_surrogate=True,
            support_explainer=True,
            exp_variant_duo=True,
            exp_variant_kernel_shap=False,
        ),
        fw_classifier=vb.fw_classifier,
        fw_surrogate=vb.fw_surrogate,
        fw_explainer=fw_explainer,
        fw_final=fw_final,
        fw_surrogate_coalitions=vb.fw_surrogate_coalitions,
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
        fw_classifier_repr=vb.fw_classifier_repr,
        fw_explainer_repr=fw_explainer_repr,
    )
