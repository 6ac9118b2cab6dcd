"""Sampler correctness: scan sampler vs step-by-step decode, filtering math vs
a direct reimplementation of the reference's torch filtering, forced tokens,
EOS freezing, and beam search vs a pure-Python mirror of the reference
algorithm (models.py:283-300).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ark_tpu.data.tokenizer import build_vocab_layout
from ark_tpu.models import build_model
from ark_tpu.sample import beam_generate, decode_latent, generate
from ark_tpu.sample.samplers import process_logits

LAYOUT = build_vocab_layout(20, 4, 3, 3, use_padding=False)
BASE = dict(d_model=16, d_latent=6, n_heads=2, n_layers=2,
            seq_len=LAYOUT.seq_len, vocab_size=LAYOUT.vocab_size,
            n_entities=LAYOUT.num_entities, n_relations=LAYOUT.num_relations,
            dec_dropout=0.0)


def _model(mt):
    m = build_model(dict(BASE, model_type=mt))
    return m, m.init(jax.random.key(0))


def test_greedy_scan_matches_python_decode():
    for mt in ["ARK", "t-ARK"]:
        m, params = _model(mt)
        seq = generate(m, params, LAYOUT, jax.random.key(1), 5, sample=False)
        assert seq.shape == (5, LAYOUT.seq_len)
        # python greedy via full-prefix teacher forcing
        cur = np.full((5, 1), 1, np.int32)  # BOS
        finished = np.zeros(5, bool)
        for t in range(LAYOUT.seq_len - 1):
            logits = np.asarray(m.apply(params, jnp.asarray(cur)))[:, -1]
            nxt = logits.argmax(-1).astype(np.int32)
            nxt = np.where(finished, 2, nxt)
            finished |= nxt == 2
            cur = np.concatenate([cur, nxt[:, None]], axis=1)
        np.testing.assert_array_equal(np.asarray(seq), cur)


def _torch_style_filter(probs, top_k, top_p):
    """Direct numpy port of the reference's filtering semantics
    (models.py:436-449) for oracle comparison."""
    probs = probs.copy()
    if top_k and top_k > 0:
        idx = np.argsort(-probs)[:top_k]
        mask = np.zeros_like(probs)
        mask[idx] = 1.0
        probs = probs * mask
        probs = probs / max(probs.sum(), 1e-12)
    if top_p and 0.0 < top_p < 1.0:
        order = np.argsort(-probs)
        sp = probs[order]
        cdf = np.cumsum(sp)
        cutoff = cdf > top_p
        cutoff[1:] = cutoff[:-1].copy()
        cutoff[0] = False
        sp[cutoff] = 0.0
        sp = sp / max(sp.sum(), 1e-12)
        out = np.zeros_like(probs)
        out[order] = sp
        probs = out
    return probs


@pytest.mark.parametrize("top_k,top_p", [(0, 0.0), (5, 0.0), (0, 0.9),
                                         (7, 0.5), (3, 0.95)])
def test_filtering_matches_reference_semantics(top_k, top_p):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 33)).astype(np.float32) * 3
    got = np.asarray(process_logits(jnp.asarray(logits), 1.0, top_k, top_p))
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    for b in range(4):
        want = _torch_style_filter(probs[b], top_k, top_p)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-6)


def test_top_k_ties_keep_exactly_k():
    """Positional exact-k like the reference's topk+scatter
    (conditioned.py:86-91): a value threshold would keep ALL boundary
    ties and renormalize to a different distribution (round-4 review
    finding)."""
    from ark_tpu.sample.samplers import filter_top_k

    probs = jnp.asarray([[0.4, 0.3, 0.3, 0.0]])
    out = np.asarray(filter_top_k(probs, 2))
    assert (out > 0).sum() == 2
    np.testing.assert_allclose(out[0, 0], 0.4 / 0.7, rtol=1e-6)


def test_generate_test_graphs_tail_batch_unaffected_by_padding():
    """The ragged tail batch must decode identically to a full-batch run
    of just its real rows: the batch-mean beam ranking would otherwise be
    steered by zero-padded filler rows (round-4 review finding)."""
    from ark_tpu.eval.verification_extra import generate_test_graphs

    class _Data:
        def __init__(self, triples):
            self.triples = triples

        def __len__(self):
            return len(self.triples)

    layout = build_vocab_layout(12, 3, 2, 2, use_padding=False)
    cfg = dict(model_type="SAIL", d_model=16, d_latent=4, n_heads=2,
               n_layers=1, seq_len=layout.seq_len,
               vocab_size=layout.vocab_size, n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0,
               batch_size=4, tie_weights=True, use_pallas_gru=False)
    m = build_model(cfg)
    params = m.init(jax.random.key(0))
    rng = np.random.default_rng(7)
    triples = rng.integers(0, 3, size=(5, 2, 3)).astype(np.int32)
    # 5 rows at batch_size=4 -> second batch has 1 real + 3 padded rows
    padded = generate_test_graphs(m, params, layout, _Data(triples),
                                  beam_width=2, batch_size=4,
                                  rng=jax.random.key(1))
    # the tail row decoded alone, with the rng stream aligned to the
    # padded run's SECOND batch (one split consumed by its first batch)
    r1 = jax.random.split(jax.random.key(1))[0]
    alone = generate_test_graphs(m, params, layout, _Data(triples[4:]),
                                 beam_width=2, batch_size=1, rng=r1)
    assert padded[4] == alone[0]


def test_temperature():
    logits = jnp.asarray([[1.0, 2.0, 3.0]])
    p = np.asarray(process_logits(logits, temperature=0.5))
    want = np.exp(np.array([2.0, 4.0, 6.0]))
    want = want / want.sum()
    np.testing.assert_allclose(p[0], want, rtol=1e-5)


def test_forced_tokens_and_eos_freeze():
    m, params = _model("ARK")
    forced_rel = LAYOUT.rel_base + 1
    forced_obj = LAYOUT.ent_base + 7
    seq = generate(m, params, LAYOUT, jax.random.key(3), 8, sample=True,
                   top_p=0.9, forced=((2, forced_rel), (3, forced_obj)))
    s = np.asarray(seq)
    assert (s[:, 2] == forced_rel).all()
    assert (s[:, 3] == forced_obj).all()
    # EOS freezing: everything after the first EOS is EOS
    for row in s:
        idx = np.where(row == 2)[0]
        if idx.size:
            assert (row[idx[0]:] == 2).all()


def test_sampling_reproducible():
    m, params = _model("ARK")
    a = generate(m, params, LAYOUT, jax.random.key(9), 6, sample=True, top_p=0.9)
    b = generate(m, params, LAYOUT, jax.random.key(9), 6, sample=True, top_p=0.9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _python_beam(m, params, layout, z, beam):
    """Pure-Python mirror of reference SAIL.beam_generate (models.py:283-300):
    full-prefix decode, batch-mean ranking, batch-global EOS stop."""
    from ark_tpu.models.decoders import gru_cond_apply, txf_cond_apply

    def dec(zz, s):
        s = jnp.asarray(s)
        if m.decoder_arch == "gru":
            out = gru_cond_apply(params["dec"], zz, s, deterministic=True)
        else:
            out = txf_cond_apply(params["dec"], zz, s, 2, deterministic=True)
        return np.asarray(out[:, -1].astype(jnp.float32))

    B = z.shape[0]
    bos, eos = 1, 2
    seqs = [(np.full((B, 1), bos, np.int64), np.zeros(B))]
    for _ in range(layout.seq_len - 1):
        cand = []
        for s, lp in seqs:
            logits = dec(z, s)
            logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
            ids = np.argsort(-logp, axis=-1)[:, :beam]
            top_lp = np.take_along_axis(logp, ids, axis=-1)
            for k in range(beam):
                cand.append((np.concatenate([s, ids[:, k:k + 1]], 1),
                             lp + top_lp[:, k]))
        seqs = sorted(cand, key=lambda x: x[1].mean(), reverse=True)[:beam]
        if all((s[:, -1] == eos).all() for s, _ in seqs):
            break
    best = seqs[0][0]
    out = np.full((B, layout.seq_len), eos, np.int64)
    out[:, :best.shape[1]] = best
    return out


@pytest.mark.parametrize("mt", ["SAIL", "t-SAIL"])
def test_beam_matches_python_reference(mt):
    m, params = _model(mt)
    z = jax.random.normal(jax.random.key(4), (3, BASE["d_latent"]))
    got = np.asarray(beam_generate(m, params, LAYOUT, z, beam=3))
    want = _python_beam(m, params, LAYOUT, z, beam=3)
    np.testing.assert_array_equal(got, want)


def test_decode_latent_greedy():
    m, params = _model("SAIL")
    z = jax.random.normal(jax.random.key(5), (4, BASE["d_latent"]))
    seq = decode_latent(m, params, LAYOUT, z, beam=1)
    assert seq.shape == (4, LAYOUT.seq_len)
    assert (np.asarray(seq)[:, 0] == 1).all()


def test_top_p_fast_path_equals_full_sort():
    from ark_tpu.sample.samplers import filter_top_p, filter_top_p_fast

    rng = np.random.default_rng(3)
    # peaked distribution (fast path) over a vocab larger than the prefilter
    logits = rng.normal(size=(6, 5000)).astype(np.float32) * 4
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = jnp.asarray(probs / probs.sum(-1, keepdims=True))
    got = filter_top_p_fast(probs, 0.9, prefilter=256)
    want = filter_top_p(probs, 0.9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-8)
    # near-uniform (nucleus wider than the prefilter -> exact fallback)
    flat = jnp.full((4, 5000), 1.0 / 5000.0)
    got2 = filter_top_p_fast(flat, 0.9, prefilter=256)
    want2 = filter_top_p(flat, 0.9)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-6, atol=1e-8)


def test_rejection_top_p_exactness():
    """Rejection nucleus sampler: every drawn token is in the exact nucleus,
    and empirical frequencies match the renormalized nucleus distribution."""
    from ark_tpu.sample.samplers import filter_top_p, sample_top_p_rejection

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32) * 2.5)
    want = np.asarray(filter_top_p(jax.nn.softmax(logits, -1), 0.9))[0]
    nucleus = set(np.nonzero(want > 0)[0].tolist())

    draws = []
    key = jax.random.key(0)
    batched = jnp.tile(logits, (256, 1))
    for i in range(40):
        key, k = jax.random.split(key)
        draws.append(np.asarray(sample_top_p_rejection(k, batched, 0.9)))
    draws = np.concatenate(draws)            # ~10k samples
    assert set(np.unique(draws).tolist()) <= nucleus
    freq = np.bincount(draws, minlength=64) / len(draws)
    np.testing.assert_allclose(freq, want, atol=0.02)


@pytest.mark.parametrize("mt", ["SAIL", "t-SAIL"])
def test_per_row_beam_equals_single_row_reference_beam(mt):
    """Per-row beam over a batch must equal looped B=1 reference beams —
    the exactness property the latent-analysis probes rely on to batch
    their decodes."""
    from ark_tpu.sample import beam_generate_per_row

    m, params = _model(mt)
    z = jax.random.normal(jax.random.key(11), (4, BASE["d_latent"]))
    got = np.asarray(beam_generate_per_row(m, params, LAYOUT, z, beam=3))
    for i in range(4):
        want = np.asarray(beam_generate(m, params, LAYOUT, z[i:i + 1], beam=3))
        np.testing.assert_array_equal(got[i], want[0], err_msg=f"row {i}")


@pytest.mark.parametrize("mt", ["ARK", "SAIL"])
def test_sampler_bank_multi_chunk_matches_host_loop(mt):
    """The one-dispatch chunk scan (round 3) must produce bitwise the same
    sequences as round 2's chunk-at-a-time host loop: same per-chunk rng
    split structure, same chunk shapes."""
    from ark_tpu.sample import make_sampler
    from ark_tpu.train.loop import SamplerBank

    m, params = _model(mt)
    cfg = dict(BASE, model_type=mt, sample_chunk=8, temperature=1.0,
               top_p=0.9, top_k=0)
    bank = SamplerBank(m, LAYOUT, cfg, chunk=8)
    rng = jax.random.key(42)
    if mt == "ARK":
        got = bank.sample_sequences(params, rng, 20)  # 3 chunks, sliced
        base = make_sampler(m, LAYOUT, sample=True, temperature=1.0,
                            top_p=0.9, top_k=0)
        outs, r = [], rng
        for _ in range(3):
            r, k = jax.random.split(r)
            outs.append(np.asarray(base(params, k, 8)))
        want = np.concatenate(outs)[:20]
    else:
        got = bank.sample_latent_sequences(params, rng, 20)
        base = make_sampler(m, LAYOUT, sample=False)
        outs, r = [], rng
        for _ in range(3):
            r, kz, ks = jax.random.split(r, 3)
            z = jax.random.normal(kz, (8, BASE["d_latent"]))
            outs.append(np.asarray(base(params, ks, z)))
        want = np.concatenate(outs)[:20]
    assert got.shape == (20, LAYOUT.seq_len)
    np.testing.assert_array_equal(got, want)


def test_sampler_bank_device_variant_is_bitwise_and_unfetched():
    """sample_sequences_device (the serving pipelining hook) returns a jax
    device array with bitwise the tokens of sample_sequences for the same
    rng — overlapping fetches must not change what is sampled."""
    from ark_tpu.train.loop import SamplerBank

    m, params = _model("ARK")
    cfg = dict(BASE, model_type="ARK", sample_chunk=8, temperature=1.0,
               top_p=0.9, top_k=0)
    bank = SamplerBank(m, LAYOUT, cfg, chunk=8)
    rng = jax.random.key(7)
    dev = bank.sample_sequences_device(params, rng, 20)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(
        np.asarray(dev), bank.sample_sequences(params, rng, 20))


def test_sampler_bank_cycling_sizes_share_one_compile():
    """Serving requests of varying --num-samples must not recompile per
    distinct size (round-3 VERDICT item 8): the chunk count is a dynamic
    fori_loop bound; only the power-of-two buffer bucket is static, so all
    sizes within a bucket share ONE compiled program, and tokens for a
    given target_n are independent of which other sizes ran before."""
    from ark_tpu.train.loop import SamplerBank

    m, params = _model("ARK")
    cfg = dict(BASE, model_type="ARK", sample_chunk=8, temperature=1.0,
               top_p=0.9, top_k=0)
    bank = SamplerBank(m, LAYOUT, cfg, chunk=8)
    rng = jax.random.key(9)
    out17 = bank.sample_sequences(params, rng, 17)   # 3 chunks -> bucket 4
    n0 = bank._lm_multi._cache_size()
    out25 = bank.sample_sequences(params, rng, 25)   # 4 chunks -> bucket 4
    out31 = bank.sample_sequences(params, rng, 31)   # 4 chunks -> bucket 4
    assert bank._lm_multi._cache_size() == n0 == 1
    assert out17.shape == (17, LAYOUT.seq_len)
    assert out25.shape == (25, LAYOUT.seq_len)
    # same rng + same chunk stream: 25-sample request's first 17 rows are
    # exactly the 17-sample request (the host-loop equivalence invariant)
    np.testing.assert_array_equal(out25[:17], out17)
    np.testing.assert_array_equal(out31[:25], out25)


@pytest.mark.parametrize("mt", ["t-ARK", "t-SAIL"])
def test_windowed_attention_sampling_is_token_exact(mt):
    """Prefix-windowed attention (attn_window_segments, the round-5 t-ARK
    sampling lever): the segmented token scan must produce BITWISE the
    single-scan tokens — every key a segment's static cache slice drops
    was causally masked to -1e30, whose exp underflows to exactly 0, so
    the softmax and probs@V contractions are unchanged."""
    from ark_tpu.sample import make_sampler
    from ark_tpu.sample.samplers import _window_segments

    # long enough that 'auto' actually segments (>= 2 segments need > 16
    # decode steps)
    layout = build_vocab_layout(40, 4, 15, 15, use_padding=True)
    assert _window_segments(layout.seq_len - 1, layout.seq_len, 3) is not None
    cfg = dict(BASE, model_type=mt, d_model=32, n_heads=4,
               seq_len=layout.seq_len, vocab_size=layout.vocab_size,
               n_entities=40, n_relations=4)
    m_seg = build_model(cfg)                                  # auto -> 3
    m_off = build_model(dict(cfg, attn_window_segments=1))    # single scan
    params = m_seg.init(jax.random.key(0))
    if mt == "t-SAIL":
        arg = jax.random.normal(jax.random.key(5), (8, cfg["d_latent"]))
    else:
        arg = 8
    for kwargs in (dict(sample=True, top_p=0.9), dict(sample=False)):
        a = np.asarray(make_sampler(m_seg, layout, **kwargs)(
            params, jax.random.key(3), arg))
        b = np.asarray(make_sampler(m_off, layout, **kwargs)(
            params, jax.random.key(3), arg))
        np.testing.assert_array_equal(a, b)


def test_window_segments_shapes():
    from ark_tpu.sample.samplers import _window_segments

    # wd-articles geometry: 85 steps over an 86-slot cache
    assert _window_segments(85, 86, 3) == [(0, 32, 32), (32, 64, 64),
                                           (64, 85, 86)]
    # too short to segment; and explicit off
    assert _window_segments(10, 11, 3) is None
    assert _window_segments(85, 86, 1) is None
    # every segment's window covers its last write position
    for n, L, k in [(85, 86, 5), (127, 128, 4), (33, 34, 2)]:
        segs = _window_segments(n, L, k) or [(0, n, L)]
        assert segs[-1][1] == n
        prev_stop = 0
        for start, stop, win in segs:
            assert start == prev_stop and win >= stop and win <= L
            prev_stop = stop
