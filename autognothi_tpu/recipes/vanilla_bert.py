"""Recipe: vanilla BERT (/root/reference/recipes/vanilla_bert.py parity).

Notes on preserved behavior:
- n_players = max_position_embeddings - 1 (vanilla_bert.py:55);
- gen_input pads/truncates to max_position_embeddings and keeps ONLY
  input_ids — padding positions are governed by the coalition mask, not by
  the tokenizer's attention mask (vanilla_bert.py:239-260);
- token input masking is deliberately disabled; masking happens purely in
  attention (vanilla_bert.py:281-290);
- token_type_ids are all zeros (vanilla_bert.py:289).
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import RECIPE_VERSION
from ..data.tokenizer import encode_batch, load_tokenizer
from ..models.bert import (
    VanillaBertConfig,
    bert_classifier_fwd,
    bert_explainer_fwd,
    bert_final_fwd,
    bert_surrogate_coalitions_fwd,
    bert_surrogate_fwd,
    init_bert_classifier,
    init_bert_explainer,
    init_bert_final,
)
from ..utils.surgery import New, merge_param_dicts
from .types import ModelRecipe, ModelRecipe_Measurements, ModelRecipe_Training


@dataclasses.dataclass
class VanillaBertMisc:
    tokenizer: Any


def _load_misc(m_path: pathlib.Path, cfg: VanillaBertConfig) -> VanillaBertMisc:
    return VanillaBertMisc(tokenizer=load_tokenizer(m_path / "tokenizer"))


# HF BertForSequenceClassification layout -> ours
HF_BERT_SEQCLS_RULES = {
    "bert.embeddings.word_embeddings.weight": ...,
    "bert.embeddings.position_embeddings.weight": ...,
    "bert.embeddings.token_type_embeddings.weight": ...,
    "bert.embeddings.LayerNorm.{wb}": ...,
    "bert.encoder.layer.{i}.attention.self.{qkv}.{wb}":
        "bert.encoder.layers.{i}.attention.self.{qkv}.{wb}",
    "bert.encoder.layer.{i}.attention.output.{mod}.{wb}":
        "bert.encoder.layers.{i}.attention.output.{mod}.{wb}",
    "bert.encoder.layer.{i}.intermediate.dense.{wb}":
        "bert.encoder.layers.{i}.intermediate.dense.{wb}",
    "bert.encoder.layer.{i}.output.{mod}.{wb}":
        "bert.encoder.layers.{i}.output.{mod}.{wb}",
    "bert.pooler.dense.{wb}": "bert_pooler.dense.{wb}",
    "classifier.{wb}": ...,
}

# bare HF BertModel layout -> ours (classifier head freshly initialized)
HF_BERT_BARE_RULES = {
    "embeddings.word_embeddings.weight": "bert.embeddings.word_embeddings.weight",
    "embeddings.position_embeddings.weight":
        "bert.embeddings.position_embeddings.weight",
    "embeddings.token_type_embeddings.weight":
        "bert.embeddings.token_type_embeddings.weight",
    "embeddings.LayerNorm.{wb}": "bert.embeddings.LayerNorm.{wb}",
    "encoder.layer.{i}.attention.self.{qkv}.{wb}":
        "bert.encoder.layers.{i}.attention.self.{qkv}.{wb}",
    "encoder.layer.{i}.attention.output.{mod}.{wb}":
        "bert.encoder.layers.{i}.attention.output.{mod}.{wb}",
    "encoder.layer.{i}.intermediate.dense.{wb}":
        "bert.encoder.layers.{i}.intermediate.dense.{wb}",
    "encoder.layer.{i}.output.{mod}.{wb}":
        "bert.encoder.layers.{i}.output.{mod}.{wb}",
    "pooler.dense.{wb}": "bert_pooler.dense.{wb}",
}


def conv_pretrained_classifier(cfg: VanillaBertConfig, bundle: Any, key: jax.Array):
    dst = init_bert_classifier(key, cfg)
    if "bert.encoder.layers.0.attention.self.query.weight" in bundle:
        return merge_param_dicts(({"{_}": ...}, bundle), into=dst)
    if "bert.encoder.layer.0.attention.self.query.weight" in bundle:
        rules = dict(HF_BERT_SEQCLS_RULES)
        extra = {
            k: None for k in bundle
            if k.startswith("bert.embeddings.position_ids")
        }
        rules.update(extra)
        return merge_param_dicts((rules, bundle), into=dst)
    if "encoder.layer.0.attention.self.query.weight" in bundle:
        rules = dict(HF_BERT_BARE_RULES)
        rules[New()] = "classifier.{wb}"
        extra = {
            k: None for k in bundle if k.startswith("embeddings.position_ids")
        }
        rules.update(extra)
        return merge_param_dicts((rules, bundle), into=dst)
    raise ValueError("unrecognized pretrained BERT bundle layout")


def conv_classifier_surrogate(cfg, _misc, classifier, key):
    dst = init_bert_classifier(key, cfg)
    rules = {
        "bert.{_}": ...,
        "bert_pooler.{_}": ...,
        "classifier.{_}": ...,  # re-use pretrained knowledge
    }
    return merge_param_dicts((rules, classifier), into=dst)


def conv_surrogate_explainer(cfg, _misc, surrogate, key):
    dst = init_bert_explainer(key, cfg)
    rules = {
        "bert.{_}": ...,
        "bert_pooler.{_}": None,
        "classifier.{_}": None,
        New(): "explainer_attn.{rest}",
        New(): "explainer_mlp.{rest}",
    }
    return merge_param_dicts((rules, surrogate), into=dst)


def _null_ids(cfg: VanillaBertConfig, misc: VanillaBertMisc) -> np.ndarray:
    """Token ids of the empty string, padded to max length
    (recipes/vanilla_bert.py:265-278)."""
    return encode_batch(misc.tokenizer, [""], cfg.max_position_embeddings)


def fw_xs_preprocess(xs, mask):
    """Prepend CLS-on column; token_type_ids all zero
    (recipes/vanilla_bert.py:281-290)."""
    cls_col = jnp.ones((mask.shape[0], 1), dtype=mask.dtype)
    mask = jnp.concatenate([cls_col, mask], axis=1)
    token_type_ids = jnp.zeros_like(xs)
    return xs, mask, token_type_ids


def fw_classifier(cfg, params, xs, mask, **kw):
    xs, mask, ttype = fw_xs_preprocess(xs, mask)
    probs, _ = bert_classifier_fwd(params, cfg, xs, mask, ttype, **kw)
    return probs, probs


def fw_surrogate(cfg, params, xs, mask, **kw):
    xs, mask, ttype = fw_xs_preprocess(xs, mask)
    probs, _ = bert_surrogate_fwd(params, cfg, xs, mask, ttype, **kw)
    return probs, None


def fw_explainer(cfg, params, xs, mask, grand, null, **kw):
    xs, mask, ttype = fw_xs_preprocess(xs, mask)
    attr, _ = bert_explainer_fwd(params, cfg, xs, mask, ttype, grand, null, **kw)
    return attr, None


def fw_final(cfg, params, xs, **kw):
    mask = jnp.ones_like(xs)
    ttype = jnp.zeros_like(xs)
    probs, attr, _ = bert_final_fwd(params, cfg, xs, mask, ttype, **kw)
    return probs, attr


def fw_classifier_repr(cfg, params, xs, mask, **kw):
    xs, mask, ttype = fw_xs_preprocess(xs, mask)
    probs, obs = bert_classifier_fwd(params, cfg, xs, mask, ttype, **kw)
    return probs, obs["repr_cls"]


def fw_explainer_repr(cfg, params, xs, mask, grand, null, **kw):
    xs, mask, ttype = fw_xs_preprocess(xs, mask)
    attr, obs = bert_explainer_fwd(
        params, cfg, xs, mask, ttype, grand, null, **kw
    )
    return attr, obs["repr_exp"]


def fw_surrogate_coalitions(cfg, params, xs, masks, **kw):
    b, m = masks.shape[:2]
    cls_col = jnp.ones((b, m, 1), dtype=masks.dtype)
    full = jnp.concatenate([cls_col, masks], axis=-1)
    ttype = jnp.zeros_like(xs)
    return bert_surrogate_coalitions_fwd(params, cfg, xs, full, ttype, **kw)


def conv_explainer_final(cfg, misc, classifier, surrogate, explainer, key):
    n_players = cfg.max_position_embeddings - 1
    nil_xs = jnp.asarray(_null_ids(cfg, misc))
    nil_mask = jnp.ones((1, n_players), dtype=jnp.int32)
    surrogate_null, _ = fw_surrogate(cfg, surrogate, nil_xs, nil_mask)

    dst = init_bert_final(key, cfg)
    return merge_param_dicts(
        ({"{_}": "classifier.{_}"}, classifier),
        ({"{_}": "surrogate.{_}"}, surrogate),
        ({"{_}": "explainer.{_}"}, explainer),
        ({"surrogate_null": ...}, {"surrogate_null": surrogate_null}),
        into=dst,
    )


def _gen_input(cfg: VanillaBertConfig, misc: VanillaBertMisc):
    def collate(raw_xs, raw_ys) -> Tuple[np.ndarray, np.ndarray]:
        ids = encode_batch(misc.tokenizer, list(raw_xs), cfg.max_position_embeddings)
        ys = np.asarray(raw_ys, dtype=np.int64)
        return ids, ys

    return collate


def _trainable(cfg: VanillaBertConfig, section: str):
    if section == "classifier":
        return lambda name: False
    if section == "final":
        return lambda name: not name.startswith("classifier.")
    return lambda name: True


def vanilla_bert_recipe() -> ModelRecipe:
    return ModelRecipe(
        id="vanilla_bert",
        version=RECIPE_VERSION,
        t_config=VanillaBertConfig,
        init_classifier=init_bert_classifier,
        init_surrogate=init_bert_classifier,
        init_explainer=init_bert_explainer,
        init_final=init_bert_final,
        load_misc=_load_misc,
        conv_pretrained_classifier=conv_pretrained_classifier,
        conv_classifier_surrogate=conv_classifier_surrogate,
        conv_surrogate_explainer=conv_surrogate_explainer,
        conv_explainer_final=conv_explainer_final,
        n_players=lambda cfg: cfg.max_position_embeddings - 1,
        gen_input=_gen_input,
        gen_null=lambda cfg, misc: _null_ids(cfg, misc),
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
