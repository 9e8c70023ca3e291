"""Recipe: LTT BERT (parity: /root/reference/recipes/ltt_bert.py).

Conversion notes preserved: classifier and surrogate share one model type;
the explainer inherits the surrogate's trained branch-0 ladder ("bert.{_}"
keep rule, ltt_bert.py:140-144); the final performs the 3-way branch merge
with the surrogate ladder as branch 0 and the explainer ladder renamed to
branch 1 (ltt_bert.py:183-250)."""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any

import jax
import jax.numpy as jnp

from .. import RECIPE_VERSION
from ..data.tokenizer import load_tokenizer
from ..models.ltt_bert import (
    LttBertConfig,
    init_ltt_bert_explainer,
    init_ltt_bert_final,
    init_ltt_bert_surrogate,
    ltt_bert_explainer_fwd,
    ltt_bert_final_fwd,
    ltt_bert_progressive,
    ltt_bert_surrogate_coalitions_fwd,
    ltt_bert_surrogate_fwd,
    ltt_bert_trainable,
)
from ..utils.surgery import New, merge_param_dicts
from . import vanilla_bert as vb
from .types import ModelRecipe, ModelRecipe_Measurements, ModelRecipe_Training


@dataclasses.dataclass
class LttBertMisc:
    tokenizer: Any


def _load_misc(m_path: pathlib.Path, cfg: LttBertConfig) -> LttBertMisc:
    return LttBertMisc(tokenizer=load_tokenizer(m_path / "tokenizer"))


def conv_pretrained_classifier(cfg: LttBertConfig, bundle: Any, key: jax.Array):
    k_v, k_dst = jax.random.split(key)
    v_classifier = vb.conv_pretrained_classifier(cfg.into(), bundle, k_v)
    dst = init_ltt_bert_surrogate(k_dst, cfg)
    rules = {
        "bert.embeddings.{_}": ...,
        "bert.encoder.layers.{_}": ...,
        "bert_pooler.dense.{wb}": ...,
        "classifier.{wb}": ...,
        New(): "bert.encoder.s_attn_maps.0_{rest}",
        New(): "bert.encoder.s_attn_layers.0_{rest}",
        New(): "bert_s_attn_pooler.dense.{wb}",
        New(): "s_attn_classifier.{wb}",
    }
    return merge_param_dicts((rules, v_classifier), into=dst)


def conv_classifier_surrogate(cfg, _misc, classifier, key):
    dst = init_ltt_bert_surrogate(key, cfg)
    rules = {
        "bert.{_}": ...,
        "bert_pooler.{_}": ...,
        "classifier.{_}": ...,
        "bert_s_attn_pooler.{_}": ...,
        "s_attn_classifier.{_}": ...,
    }
    return merge_param_dicts((rules, classifier), into=dst)


def conv_surrogate_explainer(cfg, _misc, surrogate, key):
    dst = init_ltt_bert_explainer(key, cfg)
    rules = {
        "bert.{_}": ...,  # incl. the trained branch-0 ladder
        "bert_pooler.{_}": ...,
        "bert_s_attn_pooler.{_}": None,
        "classifier.{_}": ...,
        "s_attn_classifier.{wb}": None,
        New(): "s_attn_attention_layers.{rest}",
        New(): "s_attn_explainer.{rest}",
    }
    return merge_param_dicts((rules, surrogate), into=dst)


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    n_players = cfg.max_position_embeddings - 1
    nil_xs = jnp.asarray(vb._null_ids(cfg, misc))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    rules_cls = {
        "bert.embeddings.{_}": ...,
        "bert.encoder.layers.{_}": ...,
        "bert_pooler.dense.{wb}": ...,
        "classifier.{wb}": ...,
        "bert.encoder.s_attn_maps.0_{rest}": None,
        "bert.encoder.s_attn_layers.0_{rest}": None,
        "bert_s_attn_pooler.dense.{wb}": None,
        "s_attn_classifier.{wb}": None,
    }
    rules_srg = {
        "bert.embeddings.{_}": None,
        "bert.encoder.layers.{_}": None,
        "bert_pooler.{_}": None,
        "classifier.{_}": None,
        "bert.encoder.s_attn_maps.0_{rest}": ...,
        "bert.encoder.s_attn_layers.0_{rest}": ...,
        "bert_s_attn_pooler.dense.{wb}": ...,
        "s_attn_classifier.{wb}": ...,
    }
    rules_exp = {
        "bert.embeddings.{_}": None,
        "bert.encoder.layers.{_}": None,
        "bert_pooler.{_}": None,
        "classifier.{_}": None,
        "bert.encoder.s_attn_maps.0_{rest}":
            "bert.encoder.s_attn_maps.1_{rest}",
        "bert.encoder.s_attn_layers.0_{rest}":
            "bert.encoder.s_attn_layers.1_{rest}",
        "s_attn_attention_layers.{_}": ...,
        "s_attn_explainer.{_}": ...,
    }
    dst = init_ltt_bert_final(key, cfg)
    return merge_param_dicts(
        (rules_cls, classifier),
        (rules_srg, surrogate),
        (rules_exp, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def fw_classifier(cfg, params, xs, mask, **kw):
    xs, mask, ttype = vb.fw_xs_preprocess(xs, mask)
    srg_logits, logits, _ = ltt_bert_surrogate_fwd(
        params, cfg, xs, mask, ttype, **kw
    )
    return srg_logits, logits


def fw_surrogate(cfg, params, xs, mask, **kw):
    xs, mask, ttype = vb.fw_xs_preprocess(xs, mask)
    srg_logits, logits, _ = ltt_bert_surrogate_fwd(
        params, cfg, xs, mask, ttype, **kw
    )
    return srg_logits, logits


def fw_explainer(cfg, params, xs, mask, grand, null, **kw):
    xs, mask, ttype = vb.fw_xs_preprocess(xs, mask)
    attr, logits, _ = ltt_bert_explainer_fwd(
        params, cfg, xs, mask, ttype, grand, null, **kw
    )
    return attr, logits


def fw_final(cfg, params, xs, **kw):
    mask = jnp.ones_like(xs)
    ttype = jnp.zeros_like(xs)
    logits, attr, _ = ltt_bert_final_fwd(params, cfg, xs, mask, ttype, **kw)
    return logits, attr


def fw_surrogate_coalitions(cfg, params, xs, masks, **kw):
    b, m = masks.shape[:2]
    cls_col = jnp.ones((b, m, 1), dtype=masks.dtype)
    full = jnp.concatenate([cls_col, masks], axis=-1)
    ttype = jnp.zeros_like(xs)
    return ltt_bert_surrogate_coalitions_fwd(params, cfg, xs, full, ttype, **kw)


def fw_classifier_repr(cfg, params, xs, mask, **kw):
    xs, mask, ttype = vb.fw_xs_preprocess(xs, mask)
    srg_logits, _logits, obs = ltt_bert_surrogate_fwd(
        params, cfg, xs, mask, ttype, **kw
    )
    return srg_logits, obs["repr_cls"]


def fw_explainer_repr(cfg, params, xs, mask, grand, null, **kw):
    xs, mask, ttype = vb.fw_xs_preprocess(xs, mask)
    attr, _logits, obs = ltt_bert_explainer_fwd(
        params, cfg, xs, mask, ttype, grand, null, **kw
    )
    return attr, obs["repr_exp"]


def ltt_bert_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="ltt_bert",
        version=RECIPE_VERSION,
        t_config=LttBertConfig,
        init_classifier=init_ltt_bert_surrogate,
        init_surrogate=init_ltt_bert_surrogate,
        init_explainer=init_ltt_bert_explainer,
        init_final=init_ltt_bert_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=conv_pretrained_classifier,
        conv_classifier_surrogate=conv_classifier_surrogate,
        conv_surrogate_explainer=conv_surrogate_explainer,
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
        trainable=ltt_bert_trainable,
        progressive_trainable=ltt_bert_progressive,
        fw_classifier_repr=fw_classifier_repr,
        fw_explainer_repr=fw_explainer_repr,
    )
