"""Pallas TPU kernel: fused logits + nucleus (top-p) token sampling.

The serving hot path (reference generate loop, models.py:407-471): per token
step the decoder head produces [B, V] logits with V ~ 59k, then temperature
-> softmax -> top-p -> multinomial. Materializing the logits and running the
sampling math as XLA ops costs several full [B, V] HBM round-trips per token
(round-2 measurements: softmax ~1 ms, one categorical draw ~1.2 ms, one
nucleus-membership reduction ~0.6 ms at B=512); the head weights alone are
~120 MB read per step.

This kernel streams vocabulary blocks through VMEM and never materializes
the logits. Two passes over W per token step (one matmul read each):

  Pass A (grid over vocab blocks): logits block = y @ W_blk^T + b_blk,
    online max/log-sum-exp (flash-softmax), and K independent Gumbel-argmax
    candidate draws (Gumbel-max trick: argmax_v(logits_v + G_v) is an exact
    sample from softmax(logits); K independent Gumbel fields give K iid
    candidates). Per-block Gumbel noise comes from the in-kernel PRNG
    (pltpu.prng_seed / prng_random_bits), seeded per (step_seed, block, k).
    Outputs: lse [B,1], candidate ids [B,K], candidate logits [B,K].

  Pass B (grid over vocab blocks): recompute the logits block and
    accumulate, per candidate, the probability mass STRICTLY above the
    candidate's logit: mass_k = sum_v exp(l_v - lse) * [l_v > l_cand_k].
    Output: masses [B, K].

Outside the kernel, candidate k is in the nucleus iff mass_k <= top_p —
exactly ops/samplers.filter_top_p's sorted-cdf rule (ties at the boundary
all kept), so accepting the first in-nucleus candidate is exact rejection
sampling from the renormalized nucleus. P(a row rejects all K) =
(1-top_p)^K; the caller retries with a fresh seed for the (rare) stragglers.

Strategy "cdf" (inverse-CDF candidates) replaces pass A's per-element
Gumbel noise (K x [B, VBLOCK] random fields plus two transcendentals per
element per block) with K *scalar* uniforms per row and three noise-free
passes. Measured on hardware this is 0.84x the Gumbel strategy — each pass
is matmul-bound at production tile sizes, so the pass count (3 vs 2) is
everything and the noise is effectively free — but it compiles 45x faster
and its distribution is CPU-testable (docs/BENCH_NOTES.md round-3 A/B):

  Pass L: flash log-sum-exp only (one matmul read of W).
  Pass C (sequential grid over vocab blocks): recompute the logits block,
    p = exp(l - lse), running in-row prefix mass; candidate k is the first
    vocab index whose cumulative mass reaches target u_k ~ U(0,1) — the
    classic inverse-CDF draw, an exact sample from softmax(logits) just
    like Gumbel-argmax, but the only per-element work is one exp (shared
    across candidates), one cumsum, and K compares.
  Pass B: identical nucleus-membership masses as above.

The acceptance rule and retry loop are shared, so both strategies sample
the identical renormalized-nucleus distribution; they differ only in how a
candidate-from-softmax is drawn. CDF boundary precision: the f32 prefix
sum over V terms carries ~sqrt(V)*2^-24 relative rounding, so a target u
within ~1e-5 of a CDF boundary can land one token off, and u beyond the
accumulated total (same magnitude) falls back to the last in-vocab token —
out-of-nucleus fallbacks are rejected and redrawn by the shared membership
check, so the residual bias is confined to boundary-rounding inside the
nucleus. The Gumbel strategy (default) has no such boundary term.

Requires B % 8 == 0, D % 128 == 0, V % vblock == 0 (the padded-vocab layout;
columns >= v_true are masked out). Callers check ``supported()`` and fall
back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VBLOCK = 512
NEG = -1e30

# rows per kernel invocation: bounds VMEM (y + logits + gumbel temporaries
# scale with rows; 512 rows compile within the 16 MB scoped-vmem budget at
# d=512/vblock<=1024, 2048 rows do not). Larger batches are row-chunked.
ROWCHUNK = 512


def pick_vblock(v):
    """Largest vocab tile that divides v (0 = none). Bigger tiles amortize
    per-block pipeline overhead: at B=512/V=59k, vblock 1024 is ~1.4x faster
    than 512 (docs/BENCH_NOTES.md); 1280+ overflows VMEM at ROWCHUNK 512."""
    for vb in (1024, 640, 512, 384, 256, 128):
        if v % vb == 0:
            return vb
    return 0


def supported(b, d, v, vblock=None):
    vb = vblock if vblock else pick_vblock(v)
    return b % 8 == 0 and d % 128 == 0 and vb > 0 and v % vb == 0


def _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true):
    n = y_ref.shape[0]
    vb = w_ref.shape[0]
    logits = jax.lax.dot_general(
        y_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = (logits + b_ref[0, :].reshape(1, vb)) * inv_temp
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1) + j * vb
    return jnp.where(cols_g < v_true, logits, NEG)


def _uniform_from_bits(bits):
    # top 24 bits -> (0, 1): u = (bits >> 8) * 2^-24 + 2^-25.
    # Mosaic has no uint32->f32 cast; after the shift the value fits in
    # int31, so bitcast to int32 first.
    top = pltpu.bitcast(bits >> 8, jnp.int32)
    return top.astype(jnp.float32) * (1.0 / (1 << 24)) + 1.0 / (1 << 25)


def _flash_lse_init(m_scr, l_scr):
    m_scr[:] = jnp.full_like(m_scr, NEG)
    l_scr[:] = jnp.zeros_like(l_scr)


def _flash_lse_update(m_scr, l_scr, logits):
    """One streaming log-sum-exp block update (the single spec both the
    Gumbel pass A and the CDF LSE pass must match)."""
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new


def _flash_lse_final(m_scr, l_scr):
    return m_scr[:] + jnp.log(l_scr[:])


def _pass_a_kernel(seed_ref, y_ref, w_ref, b_ref,
                   lse_ref, idx_ref, clog_ref,
                   m_scr, l_scr, bg_scr, bi_scr, bl_scr,
                   *, v_true, k_cands, inv_temp):
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    n = y_ref.shape[0]
    vb = w_ref.shape[0]

    @pl.when(j == 0)
    def _():
        _flash_lse_init(m_scr, l_scr)
        bg_scr[:] = jnp.full_like(bg_scr, NEG)
        bi_scr[:] = jnp.zeros_like(bi_scr)
        bl_scr[:] = jnp.full_like(bl_scr, NEG)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true)
    _flash_lse_update(m_scr, l_scr, logits)

    # K independent Gumbel-argmax candidates
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1)
    for k in range(k_cands):
        # at most 2 seed scalars are supported; fold (block, candidate)
        # into the second
        pltpu.prng_seed(seed_ref[0], j * k_cands + k)
        u = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits((n, vb)), jnp.uint32))
        g = logits + (-jnp.log(-jnp.log(u)))
        bm = jnp.max(g, axis=1, keepdims=True)
        is_max = g == bm
        idx_blk = jnp.min(jnp.where(is_max, cols, vb), axis=1, keepdims=True)
        logit_at = jnp.sum(jnp.where(cols == idx_blk, logits, 0.0),
                           axis=1, keepdims=True)
        better = bm > bg_scr[:, k:k + 1]
        bg_scr[:, k:k + 1] = jnp.where(better, bm, bg_scr[:, k:k + 1])
        bi_scr[:, k:k + 1] = jnp.where(
            better, (idx_blk + j * vb).astype(jnp.float32),
            bi_scr[:, k:k + 1])
        bl_scr[:, k:k + 1] = jnp.where(better, logit_at, bl_scr[:, k:k + 1])

    @pl.when(j == nv - 1)
    def _():
        lse_ref[:] = _flash_lse_final(m_scr, l_scr)
        idx_ref[:] = bi_scr[:].astype(jnp.int32)
        clog_ref[:] = bl_scr[:]


def _pass_b_kernel(y_ref, w_ref, b_ref, lse_ref, clog_ref, mass_ref,
                   acc_scr, *, v_true, k_cands, inv_temp):
    j = pl.program_id(0)
    nv = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true)
    p = jnp.exp(logits - lse_ref[:])
    for k in range(k_cands):
        above = logits > clog_ref[:, k:k + 1]
        acc_scr[:, k:k + 1] += jnp.sum(jnp.where(above, p, 0.0),
                                       axis=1, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        mass_ref[:] = acc_scr[:]


def _pass_lse_kernel(y_ref, w_ref, b_ref, lse_ref, m_scr, l_scr,
                     *, v_true, inv_temp):
    j = pl.program_id(0)
    nv = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        _flash_lse_init(m_scr, l_scr)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true)
    _flash_lse_update(m_scr, l_scr, logits)

    @pl.when(j == nv - 1)
    def _():
        lse_ref[:] = _flash_lse_final(m_scr, l_scr)


def _prefix_sum(x):
    """In-row inclusive prefix sum via log2(vb) shift-adds (Mosaic has no
    cumsum lowering; pad/slice/add all lower fine)."""
    n, vb = x.shape
    d = 1
    while d < vb:
        shifted = jnp.pad(x, ((0, 0), (d, 0)))[:, :vb]
        x = x + shifted
        d *= 2
    return x


def _pass_cdf_kernel(y_ref, w_ref, b_ref, lse_ref, t_ref,
                     idx_ref, clog_ref,
                     c_scr, bi_scr, bl_scr, ll_scr,
                     *, v_true, k_cands, inv_temp):
    """Inverse-CDF candidate draw: candidate k = first vocab index whose
    running softmax prefix mass reaches target t_k in (0, 1). Sequential
    grid over vocab blocks; c_scr carries the cumulative mass so far,
    bi/bl the found index/logit per candidate (-1 = not found yet), ll the
    fallback logit at the last in-vocab column for targets beyond the f32
    prefix total."""
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    n = y_ref.shape[0]
    vb = w_ref.shape[0]
    jlast = (v_true - 1) // vb        # static: block holding col v_true-1

    @pl.when(j == 0)
    def _():
        c_scr[:] = jnp.zeros_like(c_scr)
        bi_scr[:] = jnp.full_like(bi_scr, -1.0)
        bl_scr[:] = jnp.full_like(bl_scr, NEG)
        ll_scr[:] = jnp.full_like(ll_scr, NEG)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true)
    p = jnp.exp(logits - lse_ref[:])           # masked cols underflow to 0
    cums = c_scr[:] + _prefix_sum(p)           # [n, vb] running prefix

    cols = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1)
    for k in range(k_cands):
        t_k = t_ref[:, k:k + 1]
        # first in-block index with prefix >= t_k == count of strictly-
        # below prefixes (cums is nondecreasing); vb means "not here".
        # The in-vocab guard matters: masked cols carry p == 0, but the
        # shift-add prefix associates the SAME summands differently per
        # column, so a masked col's prefix can round ABOVE the in-vocab
        # total — a target within ~2^-24 of the total must fall through to
        # the v_true-1 fallback, never select a masked column.
        cnt = jnp.sum((cums < t_k).astype(jnp.float32), axis=1,
                      keepdims=True)
        found = ((cnt < vb) & (cnt + j * vb < v_true)
                 & (bi_scr[:, k:k + 1] < 0))
        sel = cols == cnt.astype(jnp.int32)
        logit_at = jnp.sum(jnp.where(sel, logits, 0.0), axis=1,
                           keepdims=True)
        bi_scr[:, k:k + 1] = jnp.where(found, cnt + j * vb,
                                       bi_scr[:, k:k + 1])
        bl_scr[:, k:k + 1] = jnp.where(found, logit_at, bl_scr[:, k:k + 1])
    c_scr[:] = cums[:, -1:]

    @pl.when(j == jlast)
    def _():
        c0 = (v_true - 1) - jlast * vb
        ll_scr[:] = logits[:, c0:c0 + 1]

    @pl.when(j == nv - 1)
    def _():
        none = bi_scr[:] < 0
        idx_ref[:] = jnp.where(none, v_true - 1,
                               bi_scr[:]).astype(jnp.int32)
        clog_ref[:] = jnp.where(none, ll_scr[:], bl_scr[:])


def _compute_lse(y, w, b, *, v_true, inv_temp, vblock):
    n, d = y.shape
    v = w.shape[0]
    return pl.pallas_call(
        functools.partial(_pass_lse_kernel, v_true=v_true,
                          inv_temp=inv_temp),
        grid=(v // vblock,),
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
    )(y, w.reshape(v, d), b.reshape(1, v))[0]


def _draw_candidates_cdf(y, w, b, lse, targets, *, v_true, k_cands,
                         inv_temp, vblock):
    n, d = y.shape
    v = w.shape[0]
    return pl.pallas_call(
        functools.partial(_pass_cdf_kernel, v_true=v_true, k_cands=k_cands,
                          inv_temp=inv_temp),
        grid=(v // vblock,),
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k_cands), jnp.int32),
            jax.ShapeDtypeStruct((n, k_cands), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
    )(y, w.reshape(v, d), b.reshape(1, v), lse, targets)


def _draw_candidates(y, w, b, seed, *, v_true, k_cands, inv_temp, vblock):
    n, d = y.shape
    v = w.shape[0]
    grid = (v // vblock,)
    lse, idx, clog = pl.pallas_call(
        functools.partial(_pass_a_kernel, v_true=v_true, k_cands=k_cands,
                          inv_temp=inv_temp),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, k_cands), jnp.int32),
            jax.ShapeDtypeStruct((n, k_cands), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
        ],
    )(seed.reshape(1), y, w.reshape(v, d), b.reshape(1, v))

    masses = _candidate_masses(y, w, b, lse, clog, v_true=v_true,
                               k_cands=k_cands, inv_temp=inv_temp,
                               vblock=vblock)
    return idx, masses


def _candidate_masses(y, w, b, lse, clog, *, v_true, k_cands, inv_temp,
                      vblock):
    n, d = y.shape
    v = w.shape[0]
    return pl.pallas_call(
        functools.partial(_pass_b_kernel, v_true=v_true, k_cands=k_cands,
                          inv_temp=inv_temp),
        grid=(v // vblock,),
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, k_cands), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, k_cands), jnp.float32)],
    )(y, w.reshape(v, d), b.reshape(1, v), lse, clog)[0]


def fused_top_p_sample(y, w, b, seed, top_p, *, v_true=None, temperature=1.0,
                       k_cands=4, max_rounds=4, vblock=None,
                       strategy="gumbel"):
    """One fused sampling step: y [B, D] f32 hidden states, w [V, D]
    embedding-layout head, b [V], seed int32 scalar -> token [B] int32
    drawn from the renormalized top-p nucleus of softmax(logits/T).

    Each round draws ``k_cands`` iid candidates and accepts the first
    in-nucleus one; rows with no acceptance retry with a fresh seed
    (P(retry) = (1-top_p)^k_cands per row). After ``max_rounds`` the last
    candidate is kept — P <= (1-top_p)^(k_cands*max_rounds) ~ 1e-16 at the
    defaults, the same residual-bias budget as the XLA rejection path.

    ``strategy``: how a candidate-from-softmax is drawn (module docstring):
    "gumbel" = in-kernel Gumbel-argmax fields (2 passes over W, per-element
    noise); "cdf" = inverse-CDF prefix scan (3 passes over W, K scalar
    uniforms per row, no per-element noise). Same distribution either way;
    the nucleus acceptance rule and retry loop are shared."""
    if strategy not in ("gumbel", "cdf"):
        raise ValueError(
            f"strategy must be 'gumbel' or 'cdf', got {strategy!r}")
    n = y.shape[0]
    v_true = v_true or w.shape[0]
    vblock = vblock if vblock else pick_vblock(w.shape[0])
    assert vblock > 0 and w.shape[0] % vblock == 0, \
        f"no vocab tile divides V={w.shape[0]} (callers gate on supported())"
    inv_temp = (1.0 / float(temperature)) if temperature else 1.0
    y = y.astype(jnp.float32)
    w = w.astype(jnp.float32)
    b = b.astype(jnp.float32)
    seed = jnp.asarray(seed).astype(jnp.int32)

    if n > ROWCHUNK:
        # row-chunking keeps each kernel's VMEM bounded; each chunk runs its
        # own candidate rounds with a decorrelated seed
        toks = [
            fused_top_p_sample(y[s:s + ROWCHUNK], w, b,
                               seed + jnp.int32(104729 * (s // ROWCHUNK + 1)),
                               top_p, v_true=v_true, temperature=temperature,
                               k_cands=k_cands, max_rounds=max_rounds,
                               vblock=vblock, strategy=strategy)
            for s in range(0, n, ROWCHUNK)
        ]
        return jnp.concatenate(toks)

    if strategy == "cdf":
        lse = _compute_lse(y, w, b, v_true=v_true, inv_temp=inv_temp,
                           vblock=vblock)

        def draw(s):
            # K scalar targets per row; (0, 1)-open so a zero draw cannot
            # select a zero-probability leading token
            u = jax.random.uniform(jax.random.PRNGKey(s), (n, k_cands),
                                   minval=jnp.float32(1e-7), maxval=1.0)
            idx, clog = _draw_candidates_cdf(y, w, b, lse, u, v_true=v_true,
                                             k_cands=k_cands,
                                             inv_temp=inv_temp,
                                             vblock=vblock)
            masses = _candidate_masses(y, w, b, lse, clog, v_true=v_true,
                                       k_cands=k_cands, inv_temp=inv_temp,
                                       vblock=vblock)
            return idx, masses
    else:
        draw = functools.partial(_draw_candidates, y, w, b, v_true=v_true,
                                 k_cands=k_cands, inv_temp=inv_temp,
                                 vblock=vblock)

    def pick(idx, masses):
        ok = masses <= top_p                      # [B, K]
        first = jnp.argmax(ok, axis=1)
        token = jnp.take_along_axis(idx, first[:, None], axis=1)[:, 0]
        accepted = jnp.any(ok, axis=1)
        return jnp.where(accepted, token, idx[:, -1]), accepted

    idx, masses = draw(seed)
    token, accepted = pick(idx, masses)

    def cond(carry):
        _, accepted, r = carry
        return (~jnp.all(accepted)) & (r < max_rounds)

    def body(carry):
        token, accepted, r = carry
        idx, masses = draw(seed + r * jnp.int32(7919))
        tok_r, ok_r = pick(idx, masses)
        take = ~accepted
        token = jnp.where(take, tok_r, token)
        accepted = accepted | (take & ok_r) | (r == max_rounds - 1)
        return token, accepted, r + 1

    token, _, _ = jax.lax.while_loop(cond, body,
                                     (token, accepted, jnp.int32(1)))
    return token.astype(jnp.int32)
