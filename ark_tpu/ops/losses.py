"""Objectives: next-token cross-entropy with PAD ignore + VAE KL.

Matches the reference losses exactly:
  - CE: ``F.cross_entropy(logits.reshape(-1, V), seq[:, 1:].reshape(-1),
    ignore_index=PAD)`` — mean over non-PAD target tokens
    (reference train.py:48-52, ablation_study.py:50-57).
  - KL: ``-0.5 * mean(1 + logv - mu^2 - exp(logv))`` over all (batch, dim)
    elements (reference models.py:199-200), combined as ``ce + beta * kl``
    (ablation_study.py:63-73).

Computation is float32 regardless of the activation compute dtype; the
log-softmax streams the vocab axis via the standard max/subtract/logsumexp
fusion (XLA fuses this with the logits matmul epilogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def token_nll(logits, targets):
    """Per-token negative log-likelihood in nats.

    logits [..., V] (any float dtype; promoted to f32), targets [...] int.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return logz - tgt_logit


def masked_cross_entropy(logits, targets, pad_id, row_weights=None):
    """Mean NLL over non-PAD targets (torch ignore_index semantics).

    row_weights [B] optionally zeroes whole rows (used to neutralize
    ragged-batch padding rows in evaluation).
    Returns (ce_mean, n_tokens)."""
    nll = token_nll(logits, targets)
    mask = (targets != pad_id).astype(jnp.float32)
    if row_weights is not None:
        mask = mask * row_weights[:, None].astype(jnp.float32)
    total = jnp.sum(nll * mask)
    count = jnp.sum(mask)
    return total / jnp.maximum(count, 1.0), count


def kl_mean_weighted(mu, logv, row_weights=None):
    """Batch-mean KL matching reference models.py:199-200; with optional row
    weights the mean runs over real rows only."""
    elt = -0.5 * (1 + logv - jnp.square(mu) - jnp.exp(logv))
    if row_weights is None:
        return jnp.mean(elt)
    w = row_weights.astype(jnp.float32)
    per_row = jnp.mean(elt, axis=1)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
