"""Fused logits+top-p sampling kernel (ops/pallas/sample_step.py).

CPU-testable properties (interpret mode): the in-kernel PRNG returns
all-zero bits under the TPU interpreter, so every Gumbel field is constant
and candidate #0 is exactly argmax(logits) — whose strictly-above mass is 0,
always accepted. The kernel therefore degenerates to EXACT greedy decoding
here, which pins down everything except the noise: the streamed logits
(matmul + bias + temperature + v_true masking), the flash log-sum-exp, the
block-argmax bookkeeping, the acceptance masses, and the row-chunking path.
The distribution itself (real Gumbel noise) is validated statistically on
TPU hardware — see docs/BENCH_NOTES.md round-2 sampling section.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from ark_tpu.ops.pallas.sample_step import fused_top_p_sample, supported

B, D, V, VB = 16, 128, 512, 128


def _data(seed=0, b=B):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.normal(size=(b, D)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    return y, w, bias


def test_supported_predicate():
    assert supported(512, 512, 58880)
    assert not supported(13, 512, 58880)      # rows not multiple of 8
    assert not supported(512, 100, 58880)     # d not multiple of 128
    assert not supported(512, 512, 58811)     # v not multiple of vblock


@pytest.mark.parametrize("strategy", ["gumbel", "expmin"])
def test_interpret_degenerates_to_exact_greedy(strategy):
    # interpret-mode PRNG bits are all zero -> constant uniforms -> both the
    # Gumbel ("log") and exponential-race ("race") winner arithmetics
    # degenerate to exact argmax over the v_true-masked logits
    y, w, bias = _data()
    v_true = 500
    logits = y @ w.T + bias
    logits = jnp.where(jnp.arange(V) < v_true, logits, -1e30)
    want = np.asarray(jnp.argmax(logits, axis=-1))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(7), 0.9,
                                            v_true=v_true, vblock=VB,
                                            strategy=strategy))
    np.testing.assert_array_equal(got, want)
    assert (got < v_true).all()


def test_bf16_head_streaming_degenerates_to_bf16_greedy():
    """mm_dtype=bfloat16 (config ``fused_sample_dtype``): the kernel's
    bf16-streamed head matmul with f32 accumulation matches the same
    computation spelled in XLA — interpret-mode degeneracy picks the
    argmax of THOSE logits (a perf mode, not bit-identical to f32)."""
    y, w, bias = _data()
    v_true = 500
    logits = jnp.dot(y.astype(jnp.bfloat16), w.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32) + bias
    logits = jnp.where(jnp.arange(V) < v_true, logits, -1e30)
    want = np.asarray(jnp.argmax(logits, axis=-1))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(7), 0.9,
                                            v_true=v_true, vblock=VB,
                                            mm_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(got, want)


def test_expmin_race_is_the_same_draw_as_gumbel_argmax():
    """The exponential-race identity behind strategy='expmin'
    (ops/pallas/sample_step._pass_a_kernel noise='race'): from the SAME
    uniform field, blockwise argmin of e_v * exp(bm - l_v) merged by the
    recovered per-block score bm - log(min_s) picks exactly the global
    Gumbel-argmax winner, and the recovered score equals the winner's
    l + G. Verified in float64 against the direct Gumbel computation."""
    rng = np.random.default_rng(0)
    nblk, vb = 8, 16
    for _ in range(200):
        l = (rng.normal(size=(5, nblk * vb)) * 5).astype(np.float64)
        u = rng.uniform(1e-7, 1 - 1e-7, size=l.shape).astype(np.float64)
        g = l - np.log(-np.log(u))
        want = g.argmax(axis=1)
        want_score = g.max(axis=1)

        best_score = np.full(5, -np.inf)
        best_idx = np.zeros(5, np.int64)
        e = -np.log(u)
        for j in range(nblk):
            lb = l[:, j * vb:(j + 1) * vb]
            eb = e[:, j * vb:(j + 1) * vb]
            bm = lb.max(axis=1, keepdims=True)
            s = eb * np.exp(bm - lb)
            k = s.argmin(axis=1)
            score = bm[:, 0] - np.log(s.min(axis=1))
            better = score > best_score
            best_idx = np.where(better, j * vb + k, best_idx)
            best_score = np.where(better, score, best_score)
        np.testing.assert_array_equal(best_idx, want)
        np.testing.assert_allclose(best_score, want_score, rtol=1e-12)


def test_temperature_preserves_argmax():
    # temperature rescales logits; the (interpret-mode) greedy token is
    # invariant, proving the scale is applied inside the kernel cleanly
    y, w, bias = _data(1)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(3), 0.9,
                                          temperature=0.25, vblock=VB))
        c = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(3), 0.9,
                                          temperature=2.0, vblock=VB))
    np.testing.assert_array_equal(a, c)


def test_row_chunking_matches_single_call():
    import ark_tpu.ops.pallas.sample_step as ss

    y, w, bias = _data(2, b=48)
    logits = y @ w.T + bias
    want = np.asarray(jnp.argmax(logits, axis=-1))
    orig = ss.ROWCHUNK
    try:
        ss.ROWCHUNK = 16  # force 3 chunks
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(5),
                                                0.9, vblock=VB))
    finally:
        ss.ROWCHUNK = orig
    np.testing.assert_array_equal(got, want)


def test_cdf_kernel_matches_pure_jax_mirror_bitwise():
    """Exact equivalence for the CDF kernels (the repo invariant: every
    Pallas kernel has an interpret-mode equivalence test against a pure
    spec). The mirror repeats the kernel's op order exactly — per-block
    dot_general, flash-LSE, Hillis-Steele prefix — so lse/idx/clog must be
    BITWISE equal, for random targets, for a target placed exactly ON a CDF
    prefix value (pinning the strictly-below count rule: first index whose
    prefix reaches u), and for a target beyond the f32 prefix total
    (pinning the last-in-vocab fallback)."""
    import ark_tpu.ops.pallas.sample_step as ss

    b, d, v, vb, v_true, k = 16, 128, 512, 128, 500, 4
    y, w, bias = _data(9, b=b)
    inv_temp = 1.0

    def block_logits(j):
        wj = w[j * vb:(j + 1) * vb]
        lg = jax.lax.dot_general(y, wj, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        lg = (lg + bias[j * vb:(j + 1) * vb].reshape(1, vb)) * inv_temp
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (b, vb), 1) + j * vb
        return jnp.where(cols_g < v_true, lg, ss.NEG)

    # mirror LSE (flash accumulation in block order)
    m = jnp.full((b, 1), ss.NEG)
    l = jnp.zeros((b, 1))
    for j in range(v // vb):
        lg = block_logits(j)
        m_new = jnp.maximum(m, jnp.max(lg, axis=1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(lg - m_new), axis=1,
                                             keepdims=True)
        m = m_new
    lse_mirror = m + jnp.log(l)

    # mirror prefix masses (Hillis-Steele per block + carried total)
    def hs_prefix(x):
        dd = 1
        while dd < vb:
            x = x + jnp.pad(x, ((0, 0), (dd, 0)))[:, :vb]
            dd *= 2
        return x

    carry = jnp.zeros((b, 1))
    cums_blocks, logit_blocks = [], []
    for j in range(v // vb):
        lg = block_logits(j)
        cums = carry + hs_prefix(jnp.exp(lg - lse_mirror))
        cums_blocks.append(np.asarray(cums))
        logit_blocks.append(np.asarray(lg))
        carry = cums[:, -1:]
    cums_all = np.concatenate(cums_blocks, axis=1)    # [b, v]
    logits_all = np.concatenate(logit_blocks, axis=1)

    # targets: [random, exactly-on-a-prefix-value, beyond-total, random]
    rng = np.random.default_rng(11)
    u = rng.uniform(0.05, 0.95, size=(b, k)).astype(np.float32)
    mid = cums_all[:, 250].astype(np.float32)         # strictly inside
    u[:, 1] = mid
    u[:, 2] = np.nextafter(cums_all[:, v_true - 1].astype(np.float32),
                           np.float32(2.0))           # beyond f32 total

    def mirror_draw(uu):
        """Per-block count-of-strictly-below with the kernel's in-vocab
        guard: the first block whose count stays inside BOTH the block and
        the true vocab wins; no block -> the v_true-1 fallback."""
        idx = np.empty((b, k), np.int32)
        clog = np.empty((b, k), np.float32)
        for i in range(b):
            for c in range(k):
                bi = -1
                for j in range(v // vb):
                    cnt = int(np.sum(cums_blocks[j][i] < uu[i, c]))
                    if bi < 0 and cnt < vb and j * vb + cnt < v_true:
                        bi = j * vb + cnt
                if bi < 0:
                    idx[i, c] = v_true - 1
                    clog[i, c] = logits_all[i, v_true - 1]
                else:
                    idx[i, c] = bi
                    clog[i, c] = logits_all[i, bi]
        return idx, clog

    want_idx, want_clog = mirror_draw(u)
    with pltpu.force_tpu_interpret_mode():
        lse = np.asarray(ss._compute_lse(y, w, bias, v_true=v_true,
                                         inv_temp=inv_temp, vblock=vb))
        got_idx, got_clog = ss._draw_candidates_cdf(
            y, w, bias, jnp.asarray(lse), jnp.asarray(u), v_true=v_true,
            k_cands=k, inv_temp=inv_temp, vblock=vb)
    np.testing.assert_array_equal(lse, np.asarray(lse_mirror))
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
    np.testing.assert_array_equal(np.asarray(got_clog), want_clog)
    # the on-a-boundary column really exercised the >= rule: u == cums[250]
    assert (want_idx[:, 1] == 250).all()
    # and the beyond-total column really fell back
    assert (want_idx[:, 2] == v_true - 1).all()


def test_cdf_tokens_in_nucleus_and_distribution():
    """strategy='cdf' draws its targets from jax.random OUTSIDE the kernel,
    so interpret mode exercises the REAL sampling distribution on CPU
    (unlike the Gumbel strategy, whose interpret-mode PRNG is all-zero):
    every sampled token must be in the top-p nucleus, and the empirical
    distribution over many iid rows must match the renormalized nucleus."""
    rng = np.random.default_rng(3)
    b, d, v = 512, 128, 128
    y1 = (rng.normal(size=(1, d)) * 0.12).astype(np.float32)
    y = jnp.asarray(np.repeat(y1, b, 0))
    w = jnp.asarray((rng.normal(size=(v, d)) * 0.12).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(v,)) * 0.3).astype(np.float32))
    logits = np.asarray(y1 @ np.asarray(w).T + np.asarray(bias))[0]
    p = np.exp(logits - logits.max())
    p /= p.sum()
    order = np.argsort(-p)
    cdf = np.cumsum(p[order])
    ncut = np.searchsorted(cdf, 0.9, side="left") + 1  # crossing token kept
    nucleus = np.zeros(v, bool)
    nucleus[order[:ncut]] = True
    pn = np.where(nucleus, p, 0.0)
    pn /= pn.sum()
    assert 50 < ncut < v  # the construction gives a wide, nontrivial nucleus

    counts = np.zeros(v)
    n_draws = 0
    with pltpu.force_tpu_interpret_mode():
        for s in range(8):
            tok = np.asarray(fused_top_p_sample(
                y, w, bias, jnp.int32(1000 + s), 0.9, strategy="cdf"))
            np.add.at(counts, tok, 1)
            n_draws += b
    assert counts[~nucleus].sum() == 0  # rejection rule: never off-nucleus
    tv = 0.5 * np.abs(counts / n_draws - pn).sum()
    # ~0.05 expected from sampling noise at 4096 draws over ~106 tokens
    assert tv < 0.12, tv


def test_vblock_rowchunk_override_kwargs():
    """The tile-override knobs (``vblock``/``rowchunk`` kwargs; config
    ``fused_sample_vblock``/``fused_sample_rowchunk``): a non-default tile
    geometry runs the same streamed-logits math — interpret-mode greedy
    degeneracy is tile-invariant — and the rowchunk kwarg drives the
    recursion without the module constant."""
    y, w, bias = _data(2, b=48)
    logits = y @ w.T + bias
    want = np.asarray(jnp.argmax(logits, axis=-1))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(5), 0.9,
                                            vblock=256, rowchunk=16))
    np.testing.assert_array_equal(got, want)


def test_cdf_vblock_override_stays_in_nucleus():
    # cdf draws real (host) uniforms, so a tile override exercises the
    # REAL stitched prefix scan at the new width on CPU
    y, w, bias = _data(3, b=32)
    v_true = 500
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(11), 0.9,
                                            v_true=v_true, vblock=256,
                                            rowchunk=8, strategy="cdf"))
    assert got.shape == (32,)
    assert (got >= 0).all() and (got < v_true).all()


def test_k_cands_override_greedy_and_nucleus():
    # interpret-mode zero noise: candidate 0 is argmax for ANY k, so the
    # k_cands knob must not perturb the degenerate greedy result; the cdf
    # strategy (real host uniforms) must stay in-vocab at k=2
    y, w, bias = _data(4, b=16)
    logits = y @ w.T + bias
    want = np.asarray(jnp.argmax(logits, axis=-1))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(5), 0.9,
                                            k_cands=2))
        got_cdf = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(5),
                                                0.9, v_true=500, k_cands=2,
                                                strategy="cdf"))
    np.testing.assert_array_equal(got, want)
    assert (got_cdf >= 0).all() and (got_cdf < 500).all()


def test_kernel_rejects_bad_tile_and_temperature():
    # ValueErrors, not asserts: under python -O a non-dividing tile would
    # silently truncate the vocabulary; temperature=0.0 would silently
    # sample at T=1 (round-4 kernel review findings)
    y, w, bias = _data()
    with pytest.raises(ValueError, match="vocab tile"):
        fused_top_p_sample(y, w, bias, jnp.int32(1), 0.9, vblock=384)
    with pytest.raises(ValueError, match="temperature"):
        fused_top_p_sample(y, w, bias, jnp.int32(1), 0.9, vblock=VB,
                           temperature=0.0)


def test_tile_override_validation():
    from ark_tpu.sample import make_sampler
    from ark_tpu.train.loop import SamplerBank

    with pytest.raises(ValueError, match="fused_vblock"):
        make_sampler(None, None, fused_vblock=100)
    with pytest.raises(ValueError, match="fused_rowchunk"):
        make_sampler(None, None, fused_rowchunk=12)
    with pytest.raises(ValueError, match="fused_k_cands"):
        make_sampler(None, None, fused_k_cands=1)
    with pytest.raises(ValueError, match="fused_sample_vblock"):
        SamplerBank(None, None, {"fused_sample_vblock": 100})
    with pytest.raises(ValueError, match="fused_sample_rowchunk"):
        SamplerBank(None, None, {"fused_sample_rowchunk": -8})
    with pytest.raises(ValueError, match="fused_sample_kcands"):
        SamplerBank(None, None, {"fused_sample_kcands": 9})


def test_cdf_vocab_masking_and_row_chunking():
    import ark_tpu.ops.pallas.sample_step as ss

    y, w, bias = _data(2, b=48)
    v_true = 500
    orig = ss.ROWCHUNK
    try:
        ss.ROWCHUNK = 16  # force 3 chunks through the recursion
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_top_p_sample(y, w, bias, jnp.int32(5),
                                                0.9, v_true=v_true,
                                                vblock=VB, strategy="cdf"))
    finally:
        ss.ROWCHUNK = orig
    assert got.shape == (48,)
    assert (got >= 0).all() and (got < v_true).all()


@pytest.mark.parametrize("mt", ["ARK", "t-ARK"])
def test_sampler_fused_path_runs_end_to_end(mt):
    """make_sampler(fused=True) in interpret mode == the greedy sampler
    (PRNG-zero degeneracy), wiring decode_step_features + head + kernel
    through the whole generation scan."""
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model
    from ark_tpu.sample import make_sampler

    layout = build_vocab_layout(5000, 4, 2, 2, use_padding=False)
    cfg = dict(model_type=mt, d_model=128, d_latent=8, n_heads=2, n_layers=2,
               seq_len=layout.seq_len, vocab_size=layout.vocab_size,
               n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0,
               batch_size=8, vocab_pad_multiple=128, tie_weights=True,
               use_pallas_gru=False)
    m = build_model(cfg)
    params = m.init(jax.random.key(0))
    fused_sampler = make_sampler(m, layout, sample=True, top_p=0.9,
                                 fused=True)
    greedy = make_sampler(m, layout, sample=False, fused=False)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sampler(params, jax.random.key(1), 8))
    want = np.asarray(greedy(params, jax.random.key(1), 8))
    np.testing.assert_array_equal(got, want)


def test_sampler_fused_forced_tokens_match_xla_path():
    """Forced (position, token) pairs ride the fused path: post-draw
    override == the _force logits mask. In interpret mode the Gumbel
    kernel degenerates to argmax, so fused+forced must equal the XLA
    greedy sampler with the same forced pairs (the conditioned-generation
    mechanism, reference conditioned.py:73-76)."""
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model
    from ark_tpu.sample import make_sampler

    layout = build_vocab_layout(5000, 4, 2, 2, use_padding=False)
    cfg = dict(model_type="ARK", d_model=128, d_latent=8, n_heads=2,
               n_layers=2, seq_len=layout.seq_len,
               vocab_size=layout.vocab_size, n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0,
               batch_size=8, vocab_pad_multiple=128, tie_weights=True,
               use_pallas_gru=False)
    m = build_model(cfg)
    params = m.init(jax.random.key(0))
    rel_id, ent_id = 23, 17  # any in-vocab ids: the override is unconditional
    forced = ((2, rel_id), (3, ent_id))
    fused_sampler = make_sampler(m, layout, sample=True, top_p=0.9,
                                 fused=True, forced=forced)
    greedy = make_sampler(m, layout, sample=False, fused=False,
                          forced=forced)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sampler(params, jax.random.key(1), 8))
    want = np.asarray(greedy(params, jax.random.key(1), 8))
    np.testing.assert_array_equal(got, want)
    live = want[:, 1] != layout.special_tokens["EOS"]  # EOS freeze wins
    assert (got[live, 2] == rel_id).all() and (got[live, 3] == ent_id).all()
    assert live.any()


@pytest.mark.parametrize("strategy", ["gumbel", "expmin"])
def test_sharded_gumbel_matches_unsharded_greedy(strategy):
    """fused_top_p_sample_sharded under a 2-way vocab-sharded shard_map ==
    the unsharded argmax (interpret-mode Gumbel degeneracy), exercising the
    global column offsets, the cross-shard pmax/pmin winner merge, the
    flash-LSE merge and the psum'd nucleus masses — with v_true=500 cutting
    into the SECOND shard's slice (global masking through ofs). 'expmin'
    shares the merge (its bg output is the same Gumbel score), so the same
    test covers its sharded path."""
    from jax.sharding import PartitionSpec as P
    from ark_tpu.parallel import make_mesh
    from ark_tpu.ops.pallas.sample_step import fused_top_p_sample_sharded

    y, w, bias = _data()
    v_true = 500
    logits = y @ w.T + bias
    logits = jnp.where(jnp.arange(V) < v_true, logits, -1e30)
    want = np.asarray(jnp.argmax(logits, axis=-1))
    # NOTE: 2-way mesh — pallas interpret mode deadlocks with more
    # simulated devices on this 1-core host (tests/test_parallel.py)
    mesh = make_mesh({"model": 2})

    def local(y, w, b):
        return fused_top_p_sample_sharded(y, w, b, jnp.int32(7), 0.9,
                                          v_true=v_true, vblock=VB,
                                          strategy=strategy)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(), P("model", None), P("model")),
                      out_specs=P(), check_vma=False)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.jit(f)(y, w, bias))
    np.testing.assert_array_equal(got, want)
    assert (got < v_true).all()


def test_sharded_cdf_tokens_in_nucleus_and_distribution():
    """strategy='cdf' under a vocab-sharded shard_map draws from the SAME
    renormalized-nucleus distribution as the unsharded kernel: per-shard
    prefix scans stitched by the earlier-shards softmax mass, first-found
    (pmin) candidate merge, psum'd membership masses. Interpret mode runs
    the real distribution on CPU (targets come from jax.random outside the
    kernel)."""
    from jax.sharding import PartitionSpec as P
    from ark_tpu.parallel import make_mesh
    from ark_tpu.ops.pallas.sample_step import fused_top_p_sample_sharded

    rng = np.random.default_rng(3)
    b, d, v = 512, 128, 256
    y1 = (rng.normal(size=(1, d)) * 0.12).astype(np.float32)
    y = jnp.asarray(np.repeat(y1, b, 0))
    w = jnp.asarray((rng.normal(size=(v, d)) * 0.12).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(v,)) * 0.3).astype(np.float32))
    logits = np.asarray(y1 @ np.asarray(w).T + np.asarray(bias))[0]
    p = np.exp(logits - logits.max())
    p /= p.sum()
    order = np.argsort(-p)
    cdf = np.cumsum(p[order])
    ncut = np.searchsorted(cdf, 0.9, side="left") + 1
    nucleus = np.zeros(v, bool)
    nucleus[order[:ncut]] = True
    pn = np.where(nucleus, p, 0.0)
    pn /= pn.sum()
    assert 50 < ncut < v

    mesh = make_mesh({"model": 2})

    def local(y, w, b, s):
        return fused_top_p_sample_sharded(y, w, b, s, 0.9, v_true=v,
                                          vblock=128, strategy="cdf")

    f = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("model", None), P("model"), P()),
        out_specs=P(), check_vma=False))
    counts = np.zeros(v)
    n_draws = 0
    with pltpu.force_tpu_interpret_mode():
        for s in range(8):
            tok = np.asarray(f(y, w, bias, jnp.int32(1000 + s)))
            np.add.at(counts, tok, 1)
            n_draws += b
    assert counts[~nucleus].sum() == 0  # rejection rule: never off-nucleus
    tv = 0.5 * np.abs(counts / n_draws - pn).sum()
    assert tv < 0.12, tv


def test_sampler_vocab_sharded_fused_end_to_end():
    """make_sampler(shard_vocab=True) on a {'data':1,'model':2} mesh with
    VOCAB-SHARDED head params drives the sharded fused kernel through the
    whole generation scan; interpret-mode Gumbel degeneracy makes it equal
    the unsharded greedy sampler token-for-token (round-3 VERDICT item 2:
    the serving path survives the north-star vocab-sharded geometry)."""
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model
    from ark_tpu.parallel import make_mesh, param_shardings
    from ark_tpu.sample import make_sampler

    layout = build_vocab_layout(5000, 4, 2, 2, use_padding=False)
    cfg = dict(model_type="ARK", d_model=128, d_latent=8, n_heads=2,
               n_layers=2, seq_len=layout.seq_len,
               vocab_size=layout.vocab_size, n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0,
               batch_size=8, vocab_pad_multiple=1024, tie_weights=True,
               use_pallas_gru=False)
    mesh = make_mesh({"data": 1, "model": 2})
    m = build_model(cfg, mesh=mesh)
    params = m.init(jax.random.key(0))
    params_s = jax.device_put(params,
                              param_shardings(params, mesh, shard_vocab=True))
    fused_sampler = make_sampler(m, layout, sample=True, top_p=0.9,
                                 fused=True, mesh=mesh, shard_vocab=True)
    greedy = make_sampler(build_model(cfg), layout, sample=False, fused=False)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sampler(params_s, jax.random.key(1), 8))
    want = np.asarray(greedy(params, jax.random.key(1), 8))
    np.testing.assert_array_equal(got, want)


def test_sampler_cdf_strategy_end_to_end():
    """fused_strategy='cdf' through the full generation scan: real sampling
    in interpret mode — check the sequence contract (BOS start, in-vocab
    tokens, per-row EOS freeze) rather than a greedy-degeneracy match."""
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model
    from ark_tpu.sample import make_sampler

    layout = build_vocab_layout(5000, 4, 2, 2, use_padding=False)
    cfg = dict(model_type="ARK", d_model=128, d_latent=8, n_heads=2,
               n_layers=2, seq_len=layout.seq_len,
               vocab_size=layout.vocab_size, n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0,
               batch_size=8, vocab_pad_multiple=128, tie_weights=True,
               use_pallas_gru=False)
    m = build_model(cfg)
    params = m.init(jax.random.key(0))
    sampler = make_sampler(m, layout, sample=True, top_p=0.9, fused=True,
                           fused_strategy="cdf")
    with pltpu.force_tpu_interpret_mode():
        seq = np.asarray(sampler(params, jax.random.key(1), 8))
    st = layout.special_tokens
    assert seq.shape == (8, layout.seq_len)
    assert (seq[:, 0] == st["BOS"]).all()
    assert (seq >= 0).all() and (seq < layout.vocab_size).all()
    eos = st["EOS"]
    for row in seq:
        hits = np.flatnonzero(row == eos)
        if hits.size:  # after the first EOS the row is frozen to EOS
            assert (row[hits[0]:] == eos).all()


def test_sharded_sampler_data_x_model_mesh():
    """The combined geometry the north star names ({'data': 2, 'model': 2}):
    batch rows split over 'data' while each vocab shard streams its head
    slice — interpret-mode Gumbel degeneracy must still equal the unsharded
    argmax row-for-row (cross-shard merges only ever see their data shard's
    rows)."""
    from jax.sharding import PartitionSpec as P
    from ark_tpu.parallel import make_mesh
    from ark_tpu.ops.pallas.sample_step import fused_top_p_sample_sharded

    y, w, bias = _data(4)
    v_true = 500
    logits = y @ w.T + bias
    logits = jnp.where(jnp.arange(V) < v_true, logits, -1e30)
    want = np.asarray(jnp.argmax(logits, axis=-1))
    mesh = make_mesh({"data": 2, "model": 2})

    def local(y, w, b):
        return fused_top_p_sample_sharded(y, w, b, jnp.int32(7), 0.9,
                                          v_true=v_true, vblock=VB)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("model", None), P("model")),
        out_specs=P("data"), check_vma=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(f(y, w, bias))
    np.testing.assert_array_equal(got, want)


def test_cdf_raw_sharded_stitching_matches_unsharded_bitwise():
    """The sharded CDF draw's raw mode (global column offset + initial
    prefix carry c0 + -1 not-found sentinels + fallback-logit accumulator)
    stitches EXACTLY into the unsharded kernel's result when fed the same
    global lse and the true carry: shard 1's first block computes
    c0 + prefix(p) with bit-identical summands, so the merged
    (first-found-index, logit) must equal the unsharded (idx, clog)
    BITWISE — including a beyond-f32-total target resolving to the
    owner shard's v_true-1 fallback."""
    import ark_tpu.ops.pallas.sample_step as ss

    b, d, v, vb, v_true, k = 16, 128, 512, 128, 500, 4
    y, w, bias = _data(9, b=b)
    half = v // 2

    with pltpu.force_tpu_interpret_mode():
        lse = ss._compute_lse(y, w, bias, v_true=v_true, inv_temp=1.0,
                              vblock=vb)
        # targets: random + one beyond the f32 prefix total (fallback)
        rng = np.random.default_rng(11)
        u = rng.uniform(0.05, 0.95, size=(b, k)).astype(np.float32)
        u[:, 2] = 2.0  # > any prefix total -> v_true-1 fallback
        u = jnp.asarray(u)

        want_idx, want_clog = ss._draw_candidates_cdf(
            y, w, bias, lse, u, v_true=v_true, k_cands=k, inv_temp=1.0,
            vblock=vb)

        # shard 0: columns [0, 256), zero carry
        bi0, bl0, ll0 = ss._draw_candidates_cdf(
            y, w[:half], bias[:half], lse, u, v_true=v_true, k_cands=k,
            inv_temp=1.0, vblock=vb, col_ofs=0, raw=True)
        # the true carry after shard 0 = its blocks' accumulated prefix,
        # reproduced with the kernel's own op order (flash p + HS prefix)
        carry = jnp.zeros((b, 1))
        for j in range(half // vb):
            lg = jax.lax.dot_general(y, w[j * vb:(j + 1) * vb],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            lg = lg + bias[j * vb:(j + 1) * vb].reshape(1, vb)
            cols_g = jax.lax.broadcasted_iota(jnp.int32, (b, vb), 1) + j * vb
            lg = jnp.where(cols_g < v_true, lg, ss.NEG)
            p = jnp.exp(lg - lse)
            x = p
            dd = 1
            while dd < vb:
                x = x + jnp.pad(x, ((0, 0), (dd, 0)))[:, :vb]
                dd *= 2
            carry = carry + x[:, -1:]
        # shard 1: columns [256, 512), carry from shard 0
        bi1, bl1, ll1 = ss._draw_candidates_cdf(
            y, w[half:], bias[half:], lse, u, v_true=v_true, k_cands=k,
            inv_temp=1.0, vblock=vb, col_ofs=half, c0=carry, raw=True)

    BIG = np.int32(1 << 30)
    bi0, bi1 = np.asarray(bi0), np.asarray(bi1)
    f0 = np.where(bi0 >= 0, bi0, BIG)
    f1 = np.where(bi1 >= 0, bi1, BIG)
    idx_min = np.minimum(f0, f1)
    found = idx_min < BIG
    clog_hit = (np.where(f0 == idx_min, np.asarray(bl0), 0.0)
                + np.where(f1 == idx_min, np.asarray(bl1), 0.0))
    # owner of column v_true-1 is shard 1; shard 0's ll stays 0
    assert (np.asarray(ll0) == 0.0).all()
    idx = np.where(found, idx_min, v_true - 1)
    clog = np.where(found, clog_hit, np.asarray(ll1))

    np.testing.assert_array_equal(idx, np.asarray(want_idx))
    np.testing.assert_array_equal(clog, np.asarray(want_clog))
    assert (np.asarray(want_idx)[:, 2] == v_true - 1).all()  # fallback hit
