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

import math

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


# ---------------------------------------------------------------------------
# Structured (per-slot s/p/o) loss stack — the reference ships these in
# kgvae/model/utils.py:15-64 (U-3 in SURVEY §2). They are dead code there
# (never called), but they are part of the API surface, so working
# equivalents are provided (and tested in tests/test_losses_extra.py).
# ---------------------------------------------------------------------------

def compute_kl_divergence(mu, logvar):
    """Reference utils.py:15-16: per-graph-summed KL, batch-averaged."""
    return jnp.mean(-0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar),
                                   axis=1))


def compute_reconstruction_loss(logits, targets, mask=None):
    """Per-slot (subject, relation, object) CE (reference utils.py:19-35).

    logits: (subject_logits, relation_logits, object_logits), each [B, T, C];
    targets: [B, T, 3] int. The reference concatenates the three per-element
    loss vectors and averages (masked by ``mask`` reshaped flat)."""
    parts = []
    for i, lg in enumerate(logits):
        nll = token_nll(lg, targets[:, :, i]).reshape(-1)
        parts.append(nll)
    total = jnp.concatenate(parts, axis=0)
    if mask is not None:
        m = jnp.tile(mask.reshape(-1), 3).astype(jnp.float32)
        return jnp.sum(total * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(total)


def pad_triples(triples, max_edges, pad_value=0):
    """Pad/truncate [B, T, 3] to [B, max_edges, 3] (reference utils.py:37-46)."""
    b, t, _ = triples.shape
    if t >= max_edges:
        return triples[:, :max_edges, :]
    pad = jnp.full((b, max_edges - t, 3), pad_value, triples.dtype)
    return jnp.concatenate([triples, pad], axis=1)


def create_padding_mask(triples, pad_value=0):
    """Float mask over flattened triple components (reference utils.py:50-54)."""
    b = triples.shape[0]
    flat = triples.reshape(b, -1)
    return (flat != pad_value).astype(jnp.float32)


def compute_entity_sorting_loss(entity_logits, sorted_entities, mask=None):
    """Reference utils.py:56-64."""
    nll = token_nll(entity_logits, sorted_entities).reshape(-1)
    if mask is not None:
        m = mask.reshape(-1).astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


LN2 = math.log(2)  # the one shared definition; eval/compression imports it


def kl_mean_weighted(mu, logv, row_weights=None):
    """Batch-mean KL matching reference models.py:199-200; with optional row
    weights the mean runs over real rows only."""
    elt = -0.5 * (1 + logv - jnp.square(mu) - jnp.exp(logv))
    if row_weights is None:
        return jnp.mean(elt)
    w = row_weights.astype(jnp.float32)
    per_row = jnp.mean(elt, axis=1)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def kl_free_bits_weighted(mu, logv, free_bits, row_weights=None):
    """Free-bits KL training objective (Kingma et al. 2016, IAF appendix):
    each latent dimension's batch-mean KL is floored at ``free_bits`` bits
    before averaging, so the optimizer gains nothing by collapsing a
    dimension below the floor — the mitigation knob for the t-SAIL posterior
    collapse documented in docs/QUALITY.md.

    DELIBERATE DEVIATION from the reference (which has no free-bits; its
    ELBO is ablation_study.py:63-73): config ``free_bits`` is 0/off by
    default, and the reported train/val ``kl_loss`` metrics always remain
    the TRUE (unfloored) KL — the floor only shapes the gradient.

    ``free_bits`` is in BITS per latent dimension (the literature's unit);
    internally floored in nats. With the reference's element-mean KL
    convention (kl_mean_weighted), the floored objective is
    mean_j(max(lambda, mean_batch KL_j))."""
    elt = -0.5 * (1 + logv - jnp.square(mu) - jnp.exp(logv))  # [B, D] nats
    if row_weights is None:
        kl_dim = jnp.mean(elt, axis=0)
    else:
        w = row_weights.astype(jnp.float32)[:, None]
        kl_dim = jnp.sum(elt * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    lam = jnp.float32(free_bits) * LN2
    return jnp.mean(jnp.maximum(kl_dim, lam))


def compute_ce_row_cap(seq, pad_id, batch_size, shuffle=False,
                       row_weights=None, align=128, n_shards=1):
    """Static upper bound on live (non-PAD) teacher-forcing rows per batch.

    Host-side (numpy) helper for the fused-CE row-skipping path
    (ops/pallas/logit_ce.py ``row_cap``): the kernel's cost is linear in
    rows x vocab, and on the wd datasets ~40% of rows are PAD. Returns 0
    (= no cap) when capping cannot help (uniform-length data) or cannot be
    bounded usefully (shuffled batches whose worst case is ~the full batch).

    seq [N, L]: token sequences (targets are seq[:, 1:]); batches are
    consecutive ``batch_size`` slices when ``shuffle`` is False (the
    reference's shuffle_train: false default, SURVEY quirk Q-10), else any
    composition — bounded by the ``batch_size`` longest graphs.
    ``row_weights``: optional 0/1 per-row weights (ragged eval batches);
    weight-0 rows count as empty (the loss PADs their targets).
    ``n_shards``: under a data-parallel mesh the kernel runs per shard on
    1/n_shards of the batch (contiguous leading-dim blocks, GSPMD layout);
    the returned cap then bounds any SHARD's live rows.
    """
    import numpy as np

    seq = np.asarray(seq)
    live = (seq[:, 1:] != pad_id).sum(axis=1)
    if row_weights is not None:
        live = live * (np.asarray(row_weights) > 0)
    if batch_size % n_shards != 0:
        return 0
    group = batch_size // n_shards
    n_rows = group * (seq.shape[1] - 1)
    if shuffle:
        bound = int(np.sort(live)[-group:].sum())
    else:
        nb = len(live) // batch_size
        if nb == 0:
            return 0
        bound = int(live[:nb * batch_size].reshape(nb * n_shards, group)
                    .sum(axis=1).max())
    cap = min(n_rows, -(-bound // align) * align)
    return 0 if cap >= n_rows else int(cap)
