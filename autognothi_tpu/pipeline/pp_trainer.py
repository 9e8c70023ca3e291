"""Opt-in pipeline-parallel trainer scaffolding (AUTOGNOTHI_PP=P).

The two full-tower training stages — the classifier (incl. the
pretrain_classifier fine-tune, where depth-proportional grads + Adam
moments dominate memory) and the surrogate (a complete copy of the
backbone KL-distilled under coalition masks) — run with the encoder
stage-sharded over a ("data", "pipe") mesh (parallel/pipeline.py): 1/P of
the depth state per rank.  Vanilla tracks only; the LTT/froyo/duo stages
train heads against a frozen trunk, so there is nothing depth-proportional
to split.

Checkpoints stay flat dicts (`to_flat` merges the slabs back), so resume,
conversions, export and migration are pp-oblivious.  Dropout keys fold per
(layer, microbatch, data-rank) inside the pipeline, so a dropout>0 run is
statistically equivalent but not bit-identical to the sequential trainer
(mini configs train dropout-free — exact parity pinned by
tests/test_train_pp.py).

Each setup_pp_* returns step/eval callables with the SAME signatures as the
sequential trainer's, so the epoch loops stay parallelism-agnostic; params
become a (rest, stacked) pair and `to_flat` restores the flat dict for
checkpointing.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.common import quant_override
from ..parallel.pipeline import (
    make_pipe_mesh,
    merge_encoder_params,
    pp_bert_classifier_fwd,
    pp_vit_classifier_fwd,
    split_encoder_params,
)
from ..parallel.train_step import mesh_safe_pallas
from .training import (
    cross_entropy_on_probs,
    make_optimizer_labeled,
    make_train_step,
)


class PPContext(NamedTuple):
    mesh: Any
    params: tuple            # (rest, stacked)
    tx: Any
    opt_state: Any
    fwd: Callable            # (params, xs, mask, *, deterministic, rng)
    place_batch: Callable
    place_replicated: Callable
    to_flat: Callable


def _pp_context(env, config, m_config, params, trainable,
                pipe: int, microbatches: int, batch_size: int,
                fwd_kind: str = "classifier") -> PPContext:
    kind = config.net.kind
    if kind not in ("vanilla_vit", "vanilla_bert"):
        raise ValueError(
            f"AUTOGNOTHI_PP: unsupported net kind {kind!r} — pipeline "
            "parallelism covers the vanilla tracks; the other recipes train "
            "heads against a frozen trunk and have no depth-proportional "
            "optimizer state to stage-shard")
    n_layers = m_config.num_hidden_layers
    if n_layers % pipe != 0:
        raise ValueError(
            f"AUTOGNOTHI_PP={pipe} does not divide "
            f"num_hidden_layers={n_layers}")
    mesh = make_pipe_mesh(pipe=pipe)
    n_data = mesh.shape["data"]
    if batch_size % (n_data * microbatches) != 0:
        raise ValueError(
            f"AUTOGNOTHI_PP: batch_size={batch_size} does not divide "
            f"data={n_data} x microbatches={microbatches} — pad_batch pads "
            "every batch to batch_size, the one static shape the GPipe "
            "schedule sees")
    track = "vit" if kind == "vanilla_vit" else "bert"
    prefix = f"{track}.encoder.layers"
    env.log(f"[[[ pipeline-parallel: {n_data} data x {pipe} pipe, "
            f"{microbatches} microbatches, {n_layers // pipe} layers/stage ]]]")
    rest, stacked = split_encoder_params(params, n_layers, mesh,
                                         prefix=prefix)
    params = (rest, stacked)

    def label(name: str) -> str:
        return "train" if trainable(name) else "freeze"

    stacked_labels = {}
    for s in stacked:
        labs = {label(f"{prefix}.{i}.{s}") for i in range(n_layers)}
        if len(labs) != 1:
            raise ValueError(
                f"AUTOGNOTHI_PP: trainability differs across layers for "
                f"{prefix}.*.{s} — a stage-sharded stack carries ONE "
                "optimizer label per weight")
        stacked_labels[s] = labs.pop()
    tx, opt_state = make_optimizer_labeled(
        params, ({k: label(k) for k in rest}, stacked_labels))

    if kind == "vanilla_vit":
        from ..recipes.vanilla_vit import fw_xs_preprocess

        if fwd_kind == "classifier":
            def fwd(p, xs, mask, *, deterministic, rng):
                xs, mask = fw_xs_preprocess(xs, mask)
                return pp_vit_classifier_fwd(
                    p[0], p[1], m_config, xs, mask, mesh,
                    microbatches=microbatches, deterministic=deterministic,
                    rng=rng)
        else:
            def fwd(p, xs, mask, grand, null, *, deterministic, rng):
                xs, mask = fw_xs_preprocess(xs, mask)
                return pp_vit_explainer_fwd(
                    p[0], p[1], m_config, xs, mask, grand, null, mesh,
                    microbatches=microbatches, deterministic=deterministic,
                    rng=rng)
    else:
        from ..recipes.vanilla_bert import fw_xs_preprocess

        if fwd_kind == "classifier":
            def fwd(p, xs, mask, *, deterministic, rng):
                ids, mask, ttype = fw_xs_preprocess(xs, mask)
                return pp_bert_classifier_fwd(
                    p[0], p[1], m_config, ids, mask, ttype, mesh,
                    microbatches=microbatches, deterministic=deterministic,
                    rng=rng)
        else:
            def fwd(p, xs, mask, grand, null, *, deterministic, rng):
                ids, mask, ttype = fw_xs_preprocess(xs, mask)
                return pp_bert_explainer_fwd(
                    p[0], p[1], m_config, ids, mask, ttype, grand, null,
                    mesh, microbatches=microbatches,
                    deterministic=deterministic, rng=rng)

    def place_batch(tree):
        def place(x):
            x = jnp.asarray(x)
            spec = (P("data", *([None] * (x.ndim - 1)))
                    if x.ndim and x.shape[0] % n_data == 0
                    else P(*([None] * x.ndim)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        return jax.tree.map(place, tree)

    def place_replicated(tree):
        sharding = NamedSharding(mesh, P())
        return jax.tree.map(lambda v: jax.device_put(v, sharding), tree)

    def to_flat(p):
        return merge_encoder_params(p[0], p[1], n_layers, prefix)

    return PPContext(mesh, params, tx, opt_state, fwd, place_batch,
                     place_replicated, to_flat)


def setup_pp_classifier(env, config, m_config, params, trainable,
                        pipe: int, microbatches: int):
    """-> (params, tx, opt_state, step, eval_fwd, place_batch, to_flat)
    with the sequential train_classifier step/eval signatures."""
    ctx = _pp_context(env, config, m_config, params, trainable,
                      pipe, microbatches, config.train_classifier.batch_size)

    def loss_fn(p, xs, mask, labels, rng, ltt_active, weights):
        # same trainer discipline as the sequential path: quant + pallas
        # pinned off in the differentiated forward
        with mesh_safe_pallas(), quant_override("none"):
            probs = ctx.fwd(p, xs, mask, deterministic=False, rng=rng)
        return cross_entropy_on_probs(probs, labels, weights), probs

    step = make_train_step(ctx.tx, loss_fn)

    def _eval(p, xs, mask, labels, weights, ltt_active):
        with mesh_safe_pallas(), quant_override("none"):
            probs = ctx.fwd(p, xs, mask, deterministic=True, rng=None)
        return probs, cross_entropy_on_probs(probs, labels, weights)

    return (ctx.params, ctx.tx, ctx.opt_state, step, jax.jit(_eval),
            ctx.place_batch, ctx.to_flat)


def setup_pp_surrogate(env, config, m_config, params, cls_params, trainable,
                       pipe: int, microbatches: int):
    """-> (params, cls_params, tx, opt_state, step, eval_fwd, place_batch,
    to_flat) with the sequential train_surrogate step/eval signatures.  The
    frozen teacher stays the trainer's own sequential executable;
    `cls_params` comes back replicated onto the pipe mesh for it."""
    from ..ops.shapley import loss_logits_kl_divergence

    ctx = _pp_context(env, config, m_config, params, trainable,
                      pipe, microbatches, config.train_surrogate.batch_size)

    def loss_fn(p, xs, mask, orig_ys, labels, rng, ltt_active, weights):
        with mesh_safe_pallas(), quant_override("none"):
            adapt_ys = ctx.fwd(p, xs, mask, deterministic=False, rng=rng)
        kld = loss_logits_kl_divergence(orig_ys, adapt_ys, weights)
        cls = cross_entropy_on_probs(adapt_ys, labels, weights)
        return kld, (cls, adapt_ys)

    step = make_train_step(ctx.tx, loss_fn)

    def _eval(p, xs, mask, orig_ys, labels, weights, ltt_active):
        with mesh_safe_pallas(), quant_override("none"):
            adapt_ys = ctx.fwd(p, xs, mask, deterministic=True, rng=None)
        return (adapt_ys,
                loss_logits_kl_divergence(orig_ys, adapt_ys, weights),
                cross_entropy_on_probs(adapt_ys, labels, weights))

    return (ctx.params, ctx.place_replicated(cls_params), ctx.tx,
            ctx.opt_state, step, jax.jit(_eval), ctx.place_batch, ctx.to_flat)
