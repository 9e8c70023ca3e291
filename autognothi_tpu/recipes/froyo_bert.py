"""Recipe: froyo BERT (parity: /root/reference/recipes/froyo_bert.py).
Stage layouts equal the vanilla ones; only the trainable sets and the
single-trunk Final differ."""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any

import jax
import jax.numpy as jnp

from .. import RECIPE_VERSION
from ..data.tokenizer import load_tokenizer
from ..models.froyo_bert import (
    FroyoBertConfig,
    froyo_bert_final_fwd,
    froyo_bert_trainable,
    init_froyo_bert_final,
)
from ..models.bert import init_bert_classifier, init_bert_explainer
from ..utils.surgery import merge_param_dicts
from . import vanilla_bert as vb
from .types import ModelRecipe, ModelRecipe_Measurements, ModelRecipe_Training


@dataclasses.dataclass
class FroyoBertMisc:
    tokenizer: Any


def _load_misc(m_path: pathlib.Path, cfg: FroyoBertConfig) -> FroyoBertMisc:
    return FroyoBertMisc(tokenizer=load_tokenizer(m_path / "tokenizer"))


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    n_players = cfg.max_position_embeddings - 1
    nil_xs = jnp.asarray(vb._null_ids(cfg, misc))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = vb.fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    dst = init_froyo_bert_final(key, cfg)
    return merge_param_dicts(
        ({"bert.{_}": ..., "bert_pooler.{_}": ..., "classifier.{_}": ...},
         classifier),
        ({"bert.{_}": None,
          "bert_pooler.{_}": "srg_bert_pooler.{_}",
          "classifier.{_}": "srg_classifier.{_}"}, surrogate),
        ({"bert.{_}": None, "explainer_attn.{_}": ...,
          "explainer_mlp.{_}": ...}, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def fw_final(cfg, params, xs, **kw):
    mask = jnp.ones_like(xs)
    ttype = jnp.zeros_like(xs)
    probs, attr, _ = froyo_bert_final_fwd(params, cfg, xs, mask, ttype, **kw)
    return probs, attr


def froyo_bert_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="froyo_bert",
        version=RECIPE_VERSION,
        t_config=FroyoBertConfig,
        init_classifier=init_bert_classifier,
        init_surrogate=init_bert_classifier,
        init_explainer=init_bert_explainer,
        init_final=init_froyo_bert_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=vb.conv_pretrained_classifier,
        conv_classifier_surrogate=vb.conv_classifier_surrogate,
        conv_surrogate_explainer=vb.conv_surrogate_explainer,
        conv_explainer_final=conv_explainer_final,
        n_players=lambda cfg: cfg.max_position_embeddings - 1,
        gen_input=vb._gen_input,
        gen_null=lambda cfg, misc: vb._null_ids(cfg, misc),
        training=ModelRecipe_Training(
            support_classifier=True,
            support_surrogate=True,
            support_explainer=True,
            exp_variant_duo=False,
            exp_variant_kernel_shap=False,
        ),
        fw_classifier=vb.fw_classifier,
        fw_surrogate=vb.fw_surrogate,
        fw_explainer=vb.fw_explainer,
        fw_final=fw_final,
        fw_surrogate_coalitions=vb.fw_surrogate_coalitions,
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
        trainable=froyo_bert_trainable,
        fw_classifier_repr=vb.fw_classifier_repr,
        fw_explainer_repr=vb.fw_explainer_repr,
    )
