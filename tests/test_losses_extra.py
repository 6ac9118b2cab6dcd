"""Equivalents of the reference's auxiliary/dead-code APIs (SURVEY U-3, V-3,
and the uncalled SAIL helpers): verified against torch where the reference
defines torch semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ark_tpu.ops.losses import (
    compute_entity_sorting_loss,
    compute_kl_divergence,
    compute_reconstruction_loss,
    create_padding_mask,
    pad_triples,
)


def test_compute_kl_divergence_matches_torch():
    mu = np.random.default_rng(0).normal(size=(4, 6)).astype(np.float32)
    lv = np.random.default_rng(1).normal(size=(4, 6)).astype(np.float32)
    want = (-0.5 * torch.sum(1 + torch.tensor(lv) - torch.tensor(mu) ** 2
                             - torch.tensor(lv).exp(), dim=1).mean())
    got = compute_kl_divergence(jnp.asarray(mu), jnp.asarray(lv))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_compute_reconstruction_loss_matches_torch():
    rng = np.random.default_rng(2)
    B, T, C = 3, 5, 11
    logits = [rng.normal(size=(B, T, C)).astype(np.float32) for _ in range(3)]
    targets = rng.integers(0, C, size=(B, T, 3))

    tl = [torch.tensor(x) for x in logits]
    tt = torch.tensor(targets)
    losses = [F.cross_entropy(tl[i].reshape(-1, C), tt[:, :, i].reshape(-1),
                              reduction="none") for i in range(3)]
    want = torch.cat(losses, dim=0).mean()
    got = compute_reconstruction_loss(
        tuple(jnp.asarray(x) for x in logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    mask = (rng.random((B, T)) > 0.3).astype(np.float32)
    tm = torch.tensor(np.tile(mask.reshape(-1), 3))
    want_m = (torch.cat(losses, dim=0) * tm).sum() / tm.sum()
    got_m = compute_reconstruction_loss(
        tuple(jnp.asarray(x) for x in logits), jnp.asarray(targets),
        mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(got_m), float(want_m), rtol=1e-5)


def test_pad_triples_and_mask():
    t = jnp.arange(2 * 3 * 3).reshape(2, 3, 3) + 1
    padded = pad_triples(t, 5)
    assert padded.shape == (2, 5, 3)
    assert (np.asarray(padded[:, 3:]) == 0).all()
    assert pad_triples(t, 2).shape == (2, 2, 3)
    m = create_padding_mask(padded)
    assert m.shape == (2, 15)
    assert m[0, :9].sum() == 9 and m[0, 9:].sum() == 0


def test_entity_sorting_loss():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 4, 7)).astype(np.float32)
    ents = rng.integers(0, 7, size=(2, 4))
    want = F.cross_entropy(torch.tensor(logits).reshape(-1, 7),
                           torch.tensor(ents).reshape(-1))
    got = compute_entity_sorting_loss(jnp.asarray(logits), jnp.asarray(ents))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_verify_generated_graphs_and_sample_and_verify(small_datasets):
    from ark_tpu.data import load_data_as_list
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.eval import get_verifier
    from ark_tpu.eval.verification_extra import (
        count_unique_graphs,
        sample_and_verify,
        verify_generated_graphs,
    )
    from ark_tpu.models import build_model

    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), (mn, mx), _ = \
        load_data_as_list("syn-paths")
    verifier = get_verifier("syn-paths")
    arr = np.zeros((4, mx, 3), np.int64)
    for i, g in enumerate(train_g[:3]):
        arr[i, :len(g)] = np.asarray(g)
    # note: index-0 components are treated as padding by the reference's
    # convention here; graph 3 stays empty
    res = verify_generated_graphs(arr, verifier, i2e, i2r)
    assert res["total_count"] == 4
    assert res["valid_count"] >= 1

    layout = build_vocab_layout(len(e2i), len(r2i), mn, mx, False)
    cfg = dict(model_type="SAIL", d_model=16, d_latent=6, n_heads=2,
               n_layers=2, seq_len=layout.seq_len,
               vocab_size=layout.vocab_size, n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0)
    m = build_model(cfg)
    params = m.init(jax.random.key(0))
    out = sample_and_verify(m, params, layout, cfg, verifier, i2e, i2r,
                            num_samples=8)
    assert out["total_count"] == 8
    uniq = count_unique_graphs(m, params, layout, d_latent=6, num_samples=16)
    assert 1 <= len(uniq) <= 16


def test_kl_free_bits_floor_and_gradient():
    """Free-bits objective (ops/losses.py): dims below the floor contribute
    exactly the floor and get ZERO gradient (no reward for collapsing
    further); dims above the floor behave like the plain KL."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ark_tpu.ops.losses import (LN2, kl_free_bits_weighted,
                                    kl_mean_weighted)

    b, d = 8, 4
    key = jax.random.key(0)
    # dims 0,1 collapsed (mu~0, logv~0 -> KL~0); dims 2,3 far from prior
    mu = jnp.concatenate([jnp.zeros((b, 2)),
                          2.0 + jax.random.normal(key, (b, 2)) * 0.1], axis=1)
    logv = jnp.zeros((b, d))

    fb = 0.5  # bits/dim
    lam = fb * LN2
    val = kl_free_bits_weighted(mu, logv, fb)
    elt = -0.5 * (1 + logv - mu**2 - jnp.exp(logv))
    kl_dim = elt.mean(axis=0)
    want = jnp.mean(jnp.maximum(kl_dim, lam))
    assert float(val) == pytest.approx(float(want))
    assert float(val) > float(kl_mean_weighted(mu, logv))  # floor binds

    # free_bits=0 == plain batch-mean KL
    assert float(kl_free_bits_weighted(mu, logv, 0.0)) == pytest.approx(
        float(kl_mean_weighted(mu, logv)))

    g = jax.grad(lambda m: kl_free_bits_weighted(m, logv, fb))(mu)
    g = np.asarray(g)
    assert np.all(g[:, :2] == 0.0), "collapsed dims must get zero gradient"
    assert np.all(np.abs(g[:, 2:]) > 0.0)

    # weighted variant: padding rows excluded from the per-dim mean
    w = jnp.array([1.0] * 6 + [0.0] * 2)
    mu2 = mu.at[6:].set(100.0)  # garbage in padded rows must not matter
    a = kl_free_bits_weighted(mu[:6], logv[:6], fb)
    bv = kl_free_bits_weighted(mu2, logv, fb, row_weights=w)
    assert float(a) == pytest.approx(float(bv))
