"""On-device autoregressive sampling as a single ``lax.scan``.

Replaces the reference's per-token host loop (models.py:407-471, which
re-encodes the full prefix every step and runs a per-row Python multinomial
for top-p, models.py:450-453) with one compiled scan:

  - O(1) per-token state (GRU hidden carry / transformer KV cache)
  - vectorized temperature / top-k / top-p filtering (sort + cumsum)
  - per-row EOS freezing: after a row emits EOS, all its later tokens are
    EOS. The reference instead early-stops only when the *whole batch* hits
    EOS simultaneously and right-pads with EOS (models.py:462-467, SURVEY
    quirk Q-4); both decode to identical triples because ``seq_to_triples``
    stops at the first EOS (utils.py:74).
  - forced-token hooks: a static list of (position, token_id) pairs whose
    logits are replaced by one-hot(-inf elsewhere) — the conditioned
    generation mechanism (reference conditioned.py:73-76, 140-151).

Sampling semantics match the reference order of operations: temperature ->
softmax -> top-k filter -> renormalize -> top-p filter -> renormalize ->
multinomial (models.py:429-455).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def filter_top_k(probs, top_k: int):
    """Keep EXACTLY the top_k highest-probability tokens (0 < top_k < V),
    renormalize — positional like the reference's topk+scatter
    (conditioned.py:86-91), not a value threshold: with ties at the
    boundary a `probs >= thresh` rule would keep MORE than k tokens and
    renormalize to a different distribution."""
    _, idx = jax.lax.top_k(probs, top_k)
    mask = jnp.put_along_axis(jnp.zeros_like(probs), idx,
                              jnp.ones((), probs.dtype), axis=-1,
                              inplace=False)
    kept = probs * mask
    return kept / jnp.clip(kept.sum(-1, keepdims=True), 1e-12, None)


def filter_top_p(probs, top_p: float):
    """Nucleus filtering with the reference's shifted-cutoff rule
    (conditioned.py:93-100): sort desc, keep tokens until the cumulative
    probability first exceeds top_p (the crossing token stays).

    Known deviation (docs/DESIGN.md): EXACT probability ties at the
    nucleus boundary are all kept (value threshold), where the reference's
    positional cutoff keeps only those before the crossing index in sort
    order. The fused Pallas sampler's strictly-above-mass acceptance rule
    implements the same ties-kept nucleus, so the two repo paths agree
    exactly; measure-zero for trained models."""
    sp = jnp.sort(probs, axis=-1)[..., ::-1]
    cdf = jnp.cumsum(sp, axis=-1)
    cutoff = cdf > top_p
    cutoff = jnp.concatenate(
        [jnp.zeros_like(cutoff[..., :1]), cutoff[..., :-1]], axis=-1)
    num_kept = jnp.sum(~cutoff, axis=-1) - 1  # index of smallest kept prob
    thresh = jnp.take_along_axis(sp, num_kept[..., None], axis=-1)
    kept = jnp.where(probs >= thresh, probs, 0.0)
    return kept / jnp.clip(kept.sum(-1, keepdims=True), 1e-12, None)


def filter_top_p_fast(probs, top_p: float, prefilter: int = 2048):
    """Exact top-p with a cheap fast path for large vocabularies.

    A full [B, V] sort per token step dominates big-vocab sampling. For a
    (minimally) trained model the nucleus lives in the head of the
    distribution, so sort only the top ``prefilter`` probabilities
    (lax.top_k); whenever each row's cumulative top-k mass crosses top_p the
    result equals the full sort EXACTLY (the cutoff index is inside the
    prefix). The full-sort path runs under lax.cond only when some row's
    nucleus is wider (e.g. near-uniform logits at init)."""
    v = probs.shape[-1]
    if v <= prefilter:
        return filter_top_p(probs, top_p)
    topv = jax.lax.top_k(probs, prefilter)[0]       # desc-sorted prefix
    cdf = jnp.cumsum(topv, axis=-1)
    crosses = cdf[..., -1] > top_p

    def fast(probs):
        cutoff = cdf > top_p
        cutoff = jnp.concatenate(
            [jnp.zeros_like(cutoff[..., :1]), cutoff[..., :-1]], axis=-1)
        num_kept = jnp.sum(~cutoff, axis=-1) - 1
        thresh = jnp.take_along_axis(topv, num_kept[..., None], axis=-1)
        kept = jnp.where(probs >= thresh, probs, 0.0)
        return kept / jnp.clip(kept.sum(-1, keepdims=True), 1e-12, None)

    return jax.lax.cond(jnp.all(crosses), fast,
                        lambda p: filter_top_p(p, top_p), probs)


def process_logits(logits, temperature=1.0, top_k=0, top_p=0.0):
    """logits [B, V] -> filtered probability distribution [B, V]."""
    logits = logits.astype(jnp.float32)
    if temperature and temperature != 1.0:
        logits = logits / float(temperature)
    probs = jax.nn.softmax(logits, axis=-1)
    if top_k and 0 < top_k < logits.shape[-1]:
        probs = filter_top_k(probs, int(top_k))
    if top_p and 0.0 < top_p < 1.0:
        probs = filter_top_p_fast(probs, float(top_p))
    return probs


def sample_top_p_rejection(rng, logits, top_p, max_attempts=16,
                           first_attempts=4):
    """EXACT nucleus sampling without any sort (the large-vocab fast path).

    Sampling from the renormalized nucleus equals rejection sampling: draw
    x ~ softmax(logits), accept iff x is in the nucleus. Membership is one
    reduction: token i is kept by the sorted-cdf rule iff the probability
    mass STRICTLY above p_i is <= top_p (ties at the boundary are all kept,
    the same value-threshold semantics as filter_top_p). Acceptance
    probability is the nucleus mass, which by construction EXCEEDS top_p
    (the nucleus is the smallest prefix whose mass crosses top_p), so a few
    draws per row suffice for any model, trained or not. After max_attempts
    (P(fail) <= (1-top_p)^max_attempts per row, ~1e-16 at top_p=0.9) the
    last draw is kept.

    Candidate draws use inverse-CDF on a once-per-step cumsum (a binary
    search per row) instead of ``jax.random.categorical`` — the latter
    generates a full [B, V] Gumbel field per ATTEMPT (~30M threefry
    elements at the wd-articles shape), which dominated the round-1
    sampler. ``first_attempts`` candidates are drawn and tested together
    up front so the straggler while_loop (which must run until every row
    accepts) almost never trips: P(a row rejects all of them) is
    (1-top_p)^first_attempts = 1e-4 at top_p=0.9.
    """
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    b, v = probs.shape
    cdf = jnp.cumsum(probs, axis=-1)
    total = cdf[:, -1]

    def draw(key, n):
        """n iid categorical draws per row: u ~ U[0, total), invert the CDF.
        searchsorted is O(log V) gathers; RNG cost is n*B uniforms."""
        u = jax.random.uniform(key, (n, b)) * total[None, :]
        cand = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"),
                        in_axes=(0, 1), out_axes=1)(cdf, u)
        return jnp.minimum(cand, v - 1).astype(jnp.int32)

    def in_nucleus(cand):
        """cand [n, b] -> bool [n, b]; one O(V) reduction per attempt row."""
        p_cand = jnp.take_along_axis(probs, cand.T, axis=-1).T  # [n, b]
        masses = [
            jnp.sum(jnp.where(probs > p_cand[i][:, None], probs, 0.0),
                    axis=-1)
            for i in range(cand.shape[0])
        ]
        return jnp.stack(masses) <= top_p

    rng, k0 = jax.random.split(rng)
    n0 = min(first_attempts, max_attempts)
    cand0 = draw(k0, n0)                       # [n0, b]
    ok0 = in_nucleus(cand0)                    # [n0, b]
    first = jnp.argmax(ok0, axis=0)            # first accepted (0 if none)
    accepted = jnp.any(ok0, axis=0)
    # unaccepted rows keep the LAST draw as the provisional fallback token
    token = jnp.where(accepted, cand0[first, jnp.arange(b)], cand0[-1])

    def cond(carry):
        _, _, accepted, it = carry
        return (~jnp.all(accepted)) & (it < max_attempts)

    def body(carry):
        rng, token, accepted, it = carry
        rng, k = jax.random.split(rng)
        cand = draw(k, 1)[0]
        ok = in_nucleus(cand[None])[0]
        take = (~accepted)
        token = jnp.where(take, cand, token)
        accepted = accepted | (take & ok) | (it == max_attempts - 1)
        return rng, token, accepted, it + 1

    _, token, _, _ = jax.lax.while_loop(
        cond, body, (rng, token, accepted, jnp.int32(n0)))
    return token


def _force(logits, pos_idx, forced):
    """Replace logits with one-hot(token) at generation index ``pos_idx``
    for each static (position, token_id) pair."""
    for position, token_id in forced:
        onehot = jnp.full_like(logits, NEG_INF).at[:, token_id].set(0.0)
        logits = jnp.where(pos_idx == position, onehot, logits)
    return logits


def _window_segments(n_steps, cache_len, n_seg):
    """Split a ``n_steps``-token decode scan into <= ``n_seg`` contiguous
    segments [(start, stop, window)]: steps in [start, stop) attend over
    the first ``window`` KV-cache slots (window >= stop, so every masked
    key the segment can touch is inside the slice). Boundaries and windows
    round up to 16 (the bf16 sublane tile on the cache's L axis). Returns
    None when a single full-window segment results (nothing to win)."""
    n_seg = max(1, min(int(n_seg), (n_steps + 15) // 16))
    segs, start = [], 0
    for i in range(n_seg):
        if i == n_seg - 1:
            stop = n_steps
        else:
            stop = min(n_steps,
                       ((n_steps * (i + 1) + n_seg - 1) // n_seg + 15)
                       // 16 * 16)
        if stop <= start:
            continue
        segs.append((start, stop, min(cache_len, (stop + 15) // 16 * 16)))
        start = stop
    if len(segs) <= 1:
        return None
    return segs


def make_sampler(model, layout, *, sample=True, temperature=1.0, top_k=0,
                 top_p=0.0, forced=(), mesh=None, fused="auto",
                 fused_strategy="auto", shard_vocab=False,
                 fused_mm_dtype=None, fused_vblock=None,
                 fused_rowchunk=None, fused_k_cands=None):
    """Builds a jitted sampler.

    lm models:  sampler(params, rng, batch_size) -> seq [B, seq_len] int32
    vae models: sampler(params, rng, z)          -> seq [B, seq_len] int32
    (batch_size is static; all sampling knobs are compile-time constants.)

    With ``mesh``, the decode state and per-step tokens are PINNED to the
    'data' axis with sharding constraints — the lm decode state is created
    inside the jit, so without the constraint GSPMD is free to replicate
    the whole generation on every chip.

    ``fused``: 'auto' | True | False — the Pallas fused logits+top-p
    sampling kernel (ops/pallas/sample_step.py; big-vocab nucleus sampling
    without materializing [B, V] logits). 'auto' engages it on TPU for
    pure top-p sampling on large vocabularies when the model exposes
    pre-head decode steps and the shapes meet the kernel constraints.
    Forced (position, token) pairs ride the fused path too: the sampled
    token is overridden post-draw, which equals the logits mask exactly.

    ``fused_strategy``: 'auto' | 'gumbel' | 'expmin' | 'cdf' —
    candidate-draw strategy inside the fused kernel (sample_step.py module
    docstring). 'auto' resolves to the faster measured default.

    ``fused_mm_dtype``: matmul input dtype for the fused kernel's head
    streaming (config key ``fused_sample_dtype``) — 'bfloat16' halves the
    per-pass HBM read of the ~120 MB head with f32 accumulation; a perf
    mode like ``fused_ce_dtype``, not bit-identical to the f32 default.
    The cast happens once outside the token scan.

    ``fused_vblock`` / ``fused_rowchunk``: override the fused kernel's
    vocab-tile width / rows-per-kernel chunking (config keys
    ``fused_sample_vblock`` / ``fused_sample_rowchunk``; defaults
    sample_step.pick_vblock / ROWCHUNK). Bigger vocab tiles amortize the
    per-block pipeline overhead that dominates sampling, but VMEM bounds
    vblock x rowchunk — e.g. a 2048 tile needs <= 256 rows. A non-default
    vblock re-keys the per-block noise stream (same distribution,
    different tokens — like ``fused_strategy``); perf knobs, hardware-A/B
    gated like the rest of this family.

    ``fused_k_cands``: candidates drawn per acceptance round (config key
    ``fused_sample_kcands``; default 4). Fewer candidates cut pass A's
    per-element noise work but raise the per-round retry probability
    (1-top_p)^k — the round-2 tile table showed k=3 slightly ahead and
    k=2 behind at vblock 512; the optimum shifts with tile geometry. The
    residual keep-last-candidate bias budget is (1-top_p)^(k*max_rounds),
    so k >= 2 keeps it <= ~1e-8 at the 0.9 default; same distribution
    otherwise, different RNG stream than k=4.

    Transformer decoders additionally read ``attn_window_segments`` from
    the model config ('auto' default = 3): the token scan is split into
    that many segments, each attending over a statically-sliced KV-cache
    prefix — token-exact vs the full-cache read (decoders._mha_step), it
    only removes the HBM traffic of keys the causal mask zeroes. 0/1
    disables.

    ``shard_vocab``: the head params are vocab-sharded over the mesh's
    'model' axis (parallel/mesh.param_shardings). The fused kernel then
    runs per (data, vocab) shard — each device streams only its V/n_model
    head slice, per-row scalar collectives merge the shard statistics
    (ops/pallas/sample_step.fused_top_p_sample_sharded) — instead of
    all-gathering the ~120 MB wd-articles head every token step.
    """
    if fused_vblock is not None and (int(fused_vblock) <= 0
                                     or int(fused_vblock) % 128):
        # lane-width multiple; divisibility into the (per-shard) padded
        # vocab is checked by supported() below with graceful XLA fallback
        raise ValueError(f"fused_vblock must be a positive multiple of 128, "
                         f"got {fused_vblock!r}")
    if fused_rowchunk is not None and (int(fused_rowchunk) <= 0
                                       or int(fused_rowchunk) % 8):
        raise ValueError(f"fused_rowchunk must be a positive multiple of 8, "
                         f"got {fused_rowchunk!r}")
    if mesh is not None and "data" not in dict(mesh.shape):
        # fail at build time: the decode-state/token pins build
        # P('data', ...) sharding constraints, which would otherwise die
        # with an obscure GSPMD error at first trace (the trainer guards
        # this at startup; direct callers deserve the same)
        raise ValueError("make_sampler requires a 'data' axis in the mesh "
                         f"(size 1 is fine); got {dict(mesh.shape)}")
    if fused_k_cands is not None and not 2 <= int(fused_k_cands) <= 8:
        # k=1 would push the keep-last residual bias to (1-top_p)^max_rounds
        # (~1e-4 at the 0.9 default) — outside the shared bias budget
        raise ValueError(f"fused_k_cands must be in [2, 8], "
                         f"got {fused_k_cands!r}")
    st = layout.special_tokens
    bos, eos = st["BOS"], st["EOS"]
    L = layout.seq_len
    forced = tuple(forced)

    if fused == "auto":
        fused = jax.default_backend() not in ("cpu",)
    if fused_strategy == "auto":
        fused_strategy = "gumbel"
    if fused_mm_dtype is None and jax.default_backend() not in ("cpu",):
        # round-5 measured + validity-gated default: the bf16-streamed
        # head unlocks the 2048 vocab tile (1.040x sampling; validity
        # 77.8% vs 77.0% f32 on the same 40-epoch checkpoint —
        # runs_r5/ab/TABLE.md). CPU/interpret stays f32, the parity
        # dtype; set fused_sample_dtype: float32 to force exact-f32
        # sampling on TPU.
        fused_mm_dtype = "bfloat16"
    if fused_mm_dtype is not None and jnp.dtype(fused_mm_dtype) not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError("fused_mm_dtype must be float32 or bfloat16, got "
                         f"{fused_mm_dtype!r}")
    if fused_strategy not in ("gumbel", "expmin", "cdf"):
        # fail fast (config files bypass the CLI choices= guard); a bad
        # value must not silently sample gumbel on non-fused runs and die
        # at trace time hours later on fused ones
        raise ValueError("fused_strategy must be 'auto', 'gumbel', "
                         f"'expmin' or 'cdf', got {fused_strategy!r}")
    fused_model_ok = bool(
        fused and sample and top_p and 0.0 < top_p < 1.0 and not top_k
        and model.decode_step_features is not None
        and model.head is not None and layout.vocab_size > 4096)

    # Prefix-windowed attention for transformer decode (exact — see
    # decoders._mha_step): segment the token scan so early tokens read a
    # statically smaller KV-cache slice instead of the full padded cache
    # the mask will zero anyway. At the wd-articles geometry the full
    # [B, H, L, dh] read per step per layer rivals the streamed head
    # (round-5 t-ARK trace, docs/BENCH_NOTES.md). Measured on TPU
    # (runs_r5/ab/r5_bench_tark_win*.json): 3 segments +8.5%, 6 segments
    # +13.3% over the unwindowed control, with a plateau from 6 on
    # (8 and 12 segments measure identically) — so 'auto' = 6 for txf
    # decoders (fewest compiled scan bodies at the plateau).
    # Config `attn_window_segments`: 'auto', 0/1 = off, N = N segments.
    n_seg = (getattr(model, "config", None) or {}).get(
        "attn_window_segments", "auto")
    if n_seg == "auto":
        n_seg = 6 if getattr(model, "decoder_arch", None) == "txf" else 1
    attn_segments = _window_segments(L - 1, L, int(n_seg)) \
        if getattr(model, "decoder_arch", None) == "txf" else None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _pin(tree):
            def one(x):
                spec = P("data", *([None] * (jnp.ndim(x) - 1)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))
            return jax.tree.map(one, tree)
    else:
        def _pin(tree):
            return tree

    def _scan_sample(params, rng, state, batch):
        use_fused = False
        if fused_vblock and not fused_model_ok:
            # an explicit tile request that silently measured the XLA
            # fallback would invalidate a hardware A/B — this leg covers
            # the model/config gates (the shape gates warn below)
            import warnings
            warnings.warn(
                "fused sampling disengaged despite explicit "
                f"fused_sample_vblock={fused_vblock}: the fused kernel "
                "needs pure top-p sampling (sample=True, 0<top_p<1, no "
                "top_k), a TPU backend (or fused=True), vocab > 4096, and "
                "a tied head exposing decode features; falling back to "
                "the XLA sampling path")
        if fused_model_ok:
            from ark_tpu.ops.pallas.sample_step import (
                fused_top_p_sample, fused_top_p_sample_sharded,
                supported as fused_supported)

            w_head, b_head = model.head(params)
            mm_dtype = jnp.dtype(fused_mm_dtype or jnp.float32)
            # cast once, outside the token scan: every pass then streams
            # the (possibly bf16) head instead of re-converting per step
            w_head = w_head.astype(mm_dtype)
            nd = 1 if mesh is None else dict(mesh.shape).get("data", 1)
            nm = 1 if mesh is None else dict(mesh.shape).get("model", 1)
            # a 'data' axis is guaranteed by the build-time mesh guard
            # above (size 1 is fine)
            vocab_sharded = bool(shard_vocab and nm > 1)
            if vocab_sharded:
                # per-(data, vocab)-shard kernel shapes: each device holds
                # a V/nm head slice and a batch/nd row block
                use_fused = (batch % nd == 0 and w_head.shape[0] % nm == 0
                             and fused_supported(batch // nd,
                                                 w_head.shape[1],
                                                 w_head.shape[0] // nm,
                                                 vblock=fused_vblock))
            else:
                use_fused = (batch % nd == 0 and fused_supported(
                    batch // nd, w_head.shape[1], w_head.shape[0],
                    vblock=fused_vblock))
            if fused_vblock and not use_fused:
                # an explicit tile request that silently measured the XLA
                # fallback would invalidate a hardware A/B — warn at trace,
                # naming the predicate that actually failed
                import warnings
                v_shard = w_head.shape[0] // (nm if vocab_sharded else 1)
                why = []
                if batch % nd:
                    why.append(f"batch {batch} % data-axis {nd} != 0")
                if (batch // max(nd, 1)) % 8:
                    why.append(f"per-shard rows {batch // max(nd, 1)} % 8 != 0")
                if w_head.shape[1] % 128:
                    why.append(f"d_model {w_head.shape[1]} % 128 != 0")
                if vocab_sharded and w_head.shape[0] % nm:
                    why.append(f"padded vocab {w_head.shape[0]} % model-axis "
                               f"{nm} != 0")
                if v_shard % int(fused_vblock):
                    why.append(f"vblock {fused_vblock} does not divide the "
                               f"(per-shard) padded vocab {v_shard}")
                warnings.warn(
                    "fused sampling disengaged despite explicit "
                    f"fused_sample_vblock={fused_vblock} "
                    f"({'; '.join(why) or 'unsupported shape'}); "
                    "falling back to the XLA sampling path")

            def fused_draw(y, k):
                seed = jax.random.randint(k, (), 0, jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
                common = dict(top_p=float(top_p), v_true=layout.vocab_size,
                              temperature=(float(temperature)
                                           if temperature else 1.0),
                              strategy=fused_strategy, mm_dtype=mm_dtype,
                              vblock=(int(fused_vblock)
                                      if fused_vblock else None),
                              rowchunk=(int(fused_rowchunk)
                                        if fused_rowchunk else None),
                              k_cands=(int(fused_k_cands)
                                       if fused_k_cands else 4))
                if vocab_sharded:
                    from jax.sharding import PartitionSpec as P

                    def local(y, w, b, seed):
                        # decorrelate Gumbel noise across DATA shards only:
                        # the vocab shards of one data shard must share the
                        # seed (their per-block noise stitches one global
                        # draw, sample_step.fused_top_p_sample_sharded)
                        s = seed + jax.lax.axis_index("data") * 65537
                        return fused_top_p_sample_sharded(y, w, b, s,
                                                          **common)

                    return jax.shard_map(
                        local, mesh=mesh,
                        in_specs=(P("data", None), P("model", None),
                                  P("model"), P()),
                        out_specs=P("data"), check_vma=False)(
                            y, w_head, b_head, seed)
                if mesh is not None and nd > 1:
                    from jax.sharding import PartitionSpec as P

                    def local(y, w, b, seed):
                        # decorrelate per-shard Gumbel noise
                        s = seed + jax.lax.axis_index("data") * 65537
                        return fused_top_p_sample(y, w, b, s, **common)

                    return jax.shard_map(
                        local, mesh=mesh,
                        in_specs=(P("data", None), P(), P(), P()),
                        out_specs=P("data"), check_vma=False)(
                            y, w_head, b_head, seed)
                return fused_top_p_sample(y, w_head, b_head, seed, **common)

        def make_body(window):
            # ``window`` is a STATIC per-segment KV-cache prefix length
            # (None = full cache; always None for non-transformer decoders)
            win_kw = {} if window is None else {"window": int(window)}

            def body(carry, t):
                state, token, finished, rng = carry
                rng, k = jax.random.split(rng)
                if use_fused:
                    # Pallas fused logits + nucleus sampling: never
                    # materializes the [B, V] logits
                    y, state = model.decode_step_features(params, state,
                                                          token, t, **win_kw)
                    state = _pin(state)
                    nxt = fused_draw(y.astype(jnp.float32), k)
                    # forced positions: overriding the sampled token is
                    # exactly the one-hot(-inf elsewhere) logits mask of
                    # _force — the forced token has probability 1 either way
                    # (the conditioned generation mechanism, reference
                    # conditioned.py:73-76)
                    for position, token_id in forced:
                        nxt = jnp.where(t + 1 == position,
                                        jnp.int32(token_id), nxt)
                else:
                    logits, state = model.decode_step(params, state, token,
                                                      t, **win_kw)
                    state = _pin(state)
                    logits = _force(logits.astype(jnp.float32), t + 1, forced)
                    if sample:
                        scaled = (logits / float(temperature)
                                  if temperature and temperature != 1.0
                                  else logits)
                        if (top_p and 0.0 < top_p < 1.0 and not top_k
                                and logits.shape[-1] > 4096):
                            # sort-free exact nucleus sampling (big-vocab)
                            nxt = sample_top_p_rejection(k, scaled,
                                                         float(top_p))
                        else:
                            probs = process_logits(logits, temperature,
                                                   top_k, top_p)
                            nxt = jax.random.categorical(
                                k, jnp.log(jnp.clip(probs, 1e-30, None)))
                    else:
                        nxt = jnp.argmax(logits, axis=-1)
                nxt = _pin(jnp.where(finished, eos, nxt).astype(jnp.int32))
                finished = finished | (nxt == eos)
                return (state, nxt, finished, rng), nxt

            return body

        token0 = _pin(jnp.full((batch,), bos, jnp.int32))
        finished0 = _pin(jnp.zeros((batch,), bool))
        carry = (_pin(state), token0, finished0, rng)
        if attn_segments is None:
            (_, _, _, _), toks = jax.lax.scan(make_body(None), carry,
                                              jnp.arange(L - 1))
        else:
            # segmented scan: same body math, same rng chain (one split per
            # step regardless of segmentation) — tokens are bitwise the
            # single-scan path's (tests/test_sampling.py)
            parts = []
            for start, stop, win in attn_segments:
                carry, tp = jax.lax.scan(make_body(win), carry,
                                         jnp.arange(start, stop))
                parts.append(tp)
            toks = jnp.concatenate(parts, axis=0)
        seq = _pin(jnp.concatenate([token0[:, None], toks.T], axis=1))
        return seq

    if model.kind == "lm":
        @functools.partial(jax.jit, static_argnums=(2,))
        def sampler(params, rng, batch_size):
            state = model.decode_state(params, batch_size)
            return _scan_sample(params, rng, state, batch_size)
    else:
        @jax.jit
        def sampler(params, rng, z):
            state = model.decode_state(params, z)
            return _scan_sample(params, rng, state, z.shape[0])

    return sampler


def generate(model, params, layout, rng, batch_size, *, sample=True,
             temperature=1.0, top_k=0, top_p=0.0, forced=()):
    """Convenience one-shot generation (reference ARK.generate surface,
    models.py:407-471). Returns int32 [batch_size, seq_len]."""
    sampler = make_sampler(model, layout, sample=sample, temperature=temperature,
                           top_k=top_k, top_p=top_p, forced=forced)
    return sampler(params, rng, batch_size)


def decode_latent(model, params, layout, z, *, beam=1, rng=None):
    """SAIL decode from latent vectors (reference models.py:262-266).
    beam=1 -> greedy scan; beam>1 -> reference-faithful beam search."""
    from ark_tpu.sample.beam import beam_generate

    if beam <= 1:
        sampler = make_sampler(model, layout, sample=False)
        if rng is None:
            rng = jax.random.key(0)  # unused in greedy mode
        return sampler(params, rng, z)
    return beam_generate(model, params, layout, z, beam=beam)
