"""Shapley estimation math, fully on-device.

Numerical-parity notes (see /root/reference/models/shapley.py):

- `mask_shapley` samples coalition sizes from the Shapley kernel distribution
  p(k) proportional to 1/(k(n-k)) for k in 1..n-1, thresholds uniform noise at
  idx/n = (k-1)/n — NOT k/n: the reference quirk (`masks_2 = idx/n_players`,
  mask_shapley_new) whose bit-parity the tests pin; "fixing" the threshold
  would change the coalition-size distribution — and pairs every mask with
  its complement (requires even n_mask_samples)
  for variance reduction (:56-79).  Unlike the reference (CPU numpy + host to
  device copy every step) masks are generated on-device from a `jax.random`
  key so the explainer train step is one fused XLA program.
- `loss_shapley` is the vit-shapley weighted regression objective
  `n_players * MSE(null + mask @ phi^T, v_s)` (:9-53).
- `loss_logits_kl_divergence` deliberately reproduces the reference's
  argument orientation `kl_div(input=log_softmax(ref), target=softmax(cur))`
  (:96-106) — i.e. KL(current || ref) with batchmean reduction — because that
  exact (mis)orientation is observable training behavior.
- `normalize_shapley_explanation` is the additive efficiency projection
  (:82-93); note it runs on the *token* axis including CLS, as the callers do.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "shapley_kernel_probs",
    "mask_shapley",
    "loss_shapley",
    "normalize_shapley_explanation",
    "loss_logits_kl_divergence",
    "mask_purely_uniform",
    "mask_uniform_selective",
]


def shapley_kernel_probs(n_players: int) -> jnp.ndarray:
    """p(k) ~ 1/(k(n-k)) over coalition sizes k = 1..n-1, normalized."""
    k = jnp.arange(1, n_players, dtype=jnp.float32)
    probs = 1.0 / (k * (n_players - k))
    return probs / probs.sum()


def mask_shapley(
    key: jax.Array, n_mask_samples: int, n_players: int, paired: bool = True
) -> jnp.ndarray:
    """Sample <n_mask_samples, n_players> coalition masks (int32 of 0/1).

    With `paired=True` (the training default), half the samples are drawn and
    each is interleaved with its complement: [m0, ~m0, m1, ~m1, ...].
    """
    if paired:
        if n_mask_samples % 2 != 0:
            raise ValueError("paired sampling requires even n_mask_samples")
        n_draw = n_mask_samples // 2
    else:
        n_draw = n_mask_samples

    k_noise, k_size = jax.random.split(key)
    probs = shapley_kernel_probs(n_players)
    # coalition-size index in [0, n_players-2]; threshold at idx / n_players
    size_idx = jax.random.choice(
        k_size, n_players - 1, shape=(n_draw, 1), p=probs
    ).astype(jnp.float32)
    noise = jax.random.uniform(k_noise, (n_draw, n_players))
    masks = (noise > size_idx / n_players).astype(jnp.int32)

    if paired:
        masks = jnp.stack([masks, 1 - masks], axis=1).reshape(
            n_draw * 2, n_players
        )
    return masks


def loss_shapley(
    mask: jnp.ndarray,  # <batch, n_mask_samples, n_players>
    v_0: jnp.ndarray,  # <1, n_classes>  surrogate on null input
    v_s: jnp.ndarray,  # <batch * n_mask_samples, n_classes> masked values
    v_1: jnp.ndarray,  # <batch, n_classes>  grand coalition (unused, kept for parity)
    phi: jnp.ndarray,  # <batch, n_classes, n_players> attributions
    weights: Optional[jnp.ndarray] = None,  # <batch> 0/1; None = all real
) -> jnp.ndarray:
    """FastSHAP-style weighted regression: n_players * MSE(v0 + mask.phi, v_s).

    `weights` marks real batch rows (0 = padding) so ragged final batches can
    be edge-padded to a fixed shape: the result equals the unpadded mean
    exactly (weighted mean sum(w*sq)/sum(w) over the per-row expansion)."""
    del v_1
    batch, n_mask_samples, n_players = mask.shape
    # regression math in fp32 regardless of (possibly bf16) network outputs
    values_pred = jnp.swapaxes(phi, 1, 2).astype(jnp.float32)
    approx = v_0.astype(jnp.float32).reshape(1, 1, -1) + jnp.einsum(
        "bmp,bpc->bmc", mask.astype(jnp.float32), values_pred
    )
    sq = (approx.reshape(batch * n_mask_samples, -1)
          - v_s.astype(jnp.float32)) ** 2
    if weights is None:
        return n_players * jnp.mean(sq)
    w = weights.astype(jnp.float32)
    n_classes = sq.shape[-1]
    per_row = jnp.sum(sq.reshape(batch, -1), axis=1)  # sum over M * C
    denom = jnp.sum(w) * n_mask_samples * n_classes
    return n_players * jnp.sum(w * per_row) / jnp.maximum(denom, 1.0)


def normalize_shapley_explanation(
    pred: jnp.ndarray,  # <batch, n_tokens, n_classes>
    grand: jnp.ndarray,  # <batch, n_classes>
    null: jnp.ndarray,  # <1, n_classes>
) -> jnp.ndarray:
    """Additive efficiency projection: shift each column so per-class sums
    equal grand - null."""
    n_tokens = pred.shape[1]
    grand = grand[:, None, :]
    null = null.reshape(1, 1, -1)
    diff = (grand - null) - jnp.sum(pred, axis=1, keepdims=True)
    return pred + diff / n_tokens


def loss_logits_kl_divergence(
    ref: jnp.ndarray, current: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference-oriented KL distillation loss (batchmean).

    Equals torch.nn.functional.kl_div(input=log_softmax(ref),
    target=softmax(current), reduction="batchmean") =
    mean_b sum_c p_cur(c) * (log p_cur(c) - log p_ref(c)).

    `weights` <batch> marks real rows (0 = padding): weighted batchmean.
    """
    log_p_ref = jax.nn.log_softmax(ref, axis=-1)
    p_cur = jax.nn.softmax(current, axis=-1)
    log_p_cur = jax.nn.log_softmax(current, axis=-1)
    per_item = jnp.sum(p_cur * (log_p_cur - log_p_ref), axis=-1)
    if weights is None:
        return jnp.mean(per_item)
    w = weights.astype(per_item.dtype)
    return jnp.sum(w * per_item) / jnp.maximum(jnp.sum(w), 1.0)


def mask_purely_uniform(
    key: jax.Array, batch_size: int, n_features: int
) -> jnp.ndarray:
    """Random masks whose masked-out count is ~uniform over [0, n]."""
    k_a, k_b = jax.random.split(key)
    noise = jax.random.uniform(k_a, (batch_size, n_features))
    threshold = jax.random.uniform(k_b, (batch_size, 1))
    return (noise > threshold).astype(jnp.int32)


def mask_uniform_selective(
    key: jax.Array, batch_size: int, n_features: int, n_masked: int
) -> jnp.ndarray:
    """Masks with exactly `n_masked` zeros per row, positions uniform."""
    noise = jax.random.uniform(key, (batch_size, n_features))
    ranks = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)
    return (ranks >= n_masked).astype(jnp.int32)
