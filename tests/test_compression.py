"""Posterior-bits: the fused single-pass computation must equal the
reference's per-token prefix loop (SURVEY quirk Q-2 equivalence proof).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from ark_tpu.data.dataset import GraphSeqArrays
from ark_tpu.data.tokenizer import build_vocab_layout
from ark_tpu.models import build_model
from ark_tpu.eval import posterior_bits

LAYOUT = build_vocab_layout(20, 4, 3, 3, use_padding=False)
CFG = dict(model_type="ARK", d_model=16, d_latent=6, n_heads=2, n_layers=2,
           seq_len=LAYOUT.seq_len, vocab_size=LAYOUT.vocab_size,
           n_entities=LAYOUT.num_entities, n_relations=LAYOUT.num_relations,
           dec_dropout=0.0)


def _toy_arrays(n=10):
    rng = np.random.default_rng(0)
    triples = rng.integers(0, 4, size=(n, 3, 3)).astype(np.int32)
    triples[:, :, 0] %= 20
    triples[:, :, 2] %= 20
    from ark_tpu.train.steps import build_seq_from_triples
    seq = np.asarray(build_seq_from_triples(
        jnp.asarray(triples), LAYOUT.ent_base, LAYOUT.rel_base, 1, 2))
    return GraphSeqArrays(triples=triples, seq=seq,
                          n_edges=np.full(n, 3, np.int32), layout=LAYOUT)


def _naive_bits_per_sequence(model, params, seq, pad_id=0):
    """Direct port of the reference loop (models.py:473-486): full prefix
    re-forward per token, stop at first PAD target."""
    total = 0.0
    seq = np.asarray(seq)
    for t in range(1, len(seq)):
        target = int(seq[t])
        if target == pad_id:
            break
        logits = np.asarray(model.apply(params, jnp.asarray(seq[None, :t]))[0, -1],
                            dtype=np.float64)
        logz = np.log(np.exp(logits - logits.max()).sum()) + logits.max()
        total += -(logits[target] - logz) / math.log(2)
    return total


def test_single_pass_equals_prefix_loop():
    m = build_model(CFG)
    params = m.init(jax.random.key(0))
    data = _toy_arrays(6)
    stats = posterior_bits(m, params, data, LAYOUT, sample_frac=1.0,
                           batch_size=4)
    assert len(stats["records"]) == 6
    for i in range(6):
        want = _naive_bits_per_sequence(m, params, data.seq[i])
        np.testing.assert_allclose(stats["records"][i]["ar_bits"], want,
                                   rtol=1e-3, atol=1e-3)
    assert stats["avg_kl_bits"] == 0.0
    total = [r["total_bits"] for r in stats["records"]]
    np.testing.assert_allclose(stats["avg_total_bits"], np.mean(total), rtol=1e-6)
    np.testing.assert_allclose(stats["min_total_bits"], np.min(total), rtol=1e-6)


def test_sample_frac_subset():
    m = build_model(CFG)
    params = m.init(jax.random.key(0))
    data = _toy_arrays(10)
    stats = posterior_bits(m, params, data, LAYOUT, sample_frac=0.3)
    assert len(stats["records"]) == 3  # first max(1, 0.3*10)


def test_sail_kl_bits():
    m = build_model(dict(CFG, model_type="SAIL"))
    params = m.init(jax.random.key(0))
    data = _toy_arrays(5)
    stats = posterior_bits(m, params, data, LAYOUT, sample_frac=1.0,
                           rng=jax.random.key(1))
    assert stats["avg_kl_bits"] > 0.0
    np.testing.assert_allclose(
        stats["avg_total_bits"], stats["avg_ar_bits"] + stats["avg_kl_bits"],
        rtol=1e-5)
