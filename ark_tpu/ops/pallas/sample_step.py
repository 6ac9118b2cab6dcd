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

from ark_tpu.ops.collectives import merge_lse
from ark_tpu.ops.pallas.flash_lse import (
    NEG,
    flash_lse_final as _flash_lse_final,
    flash_lse_init as _flash_lse_init,
    flash_lse_update as _flash_lse_update,
)

VBLOCK = 512

# rows per kernel invocation: bounds VMEM (y + logits + gumbel temporaries
# scale with rows; 512 rows compile within the 16 MB scoped-vmem budget at
# d=512/vblock<=1024, 2048 rows do not). Larger batches are row-chunked.
ROWCHUNK = 512


def _check_tile_and_temp(vblock, v, temperature):
    """ValueErrors, not asserts: under ``python -O`` a non-dividing tile
    would silently truncate the vocabulary (grid = V // vblock), and a
    falsy temperature=0.0 would silently sample at T=1."""
    if not (vblock and vblock > 0 and v % vblock == 0):
        raise ValueError(f"no vocab tile divides V={v} (vblock={vblock}; "
                         "callers gate on supported())")
    if temperature is not None and float(temperature) <= 0.0:
        raise ValueError(
            f"temperature must be > 0, got {temperature!r} (greedy decode "
            "is a separate path; T=0 would silently sample at T=1 here)")


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


def default_geometry(v, mm_dtype):
    """Measured-fastest default (vblock, rowchunk) for the head dtype.

    Round-5 hardware A/B (runs_r5/ab/TABLE.md): the 2048-wide vocab tile
    is 1.040x the round-2 (1024, 512) geometry but only fits VMEM with
    the bf16-streamed head at rowchunk 256 — f32 at 2048 OOMs and
    (2048, 128) craters to 0.64x, so f32 keeps (pick_vblock, 512)."""
    if jnp.dtype(mm_dtype) == jnp.dtype(jnp.bfloat16) and v % 2048 == 0:
        return 2048, 256
    return pick_vblock(v), ROWCHUNK


def _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true, ofs=0):
    """``ofs``: this call's GLOBAL column offset — 0 for a full-vocab call;
    axis_index('model') * V_shard when the head is vocab-sharded and each
    device streams only its W slice (fused_top_p_sample_sharded). The
    v_true mask is evaluated in global column coordinates.

    The matmul input precision follows W's dtype (``fused_sample_dtype``:
    callers may stream a bf16-cast head — half the HBM bytes per pass —
    with f32 accumulation; y is cast to match). Bias add, temperature and
    masking stay f32."""
    n = y_ref.shape[0]
    vb = w_ref.shape[0]
    logits = jax.lax.dot_general(
        y_ref[:].astype(w_ref.dtype), w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = (logits + b_ref[0, :].reshape(1, vb)) * inv_temp
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1) + j * vb + ofs
    return jnp.where(cols_g < v_true, logits, NEG)


def _uniform_from_bits(bits):
    # top 24 bits -> (0, 1): u = (bits >> 8) * 2^-24 + 2^-25.
    # Mosaic has no uint32->f32 cast; after the shift the value fits in
    # int31, so bitcast to int32 first.
    top = pltpu.bitcast(bits >> 8, jnp.int32)
    return top.astype(jnp.float32) * (1.0 / (1 << 24)) + 1.0 / (1 << 25)


# _flash_lse_init/_flash_lse_update/_flash_lse_final live in flash_lse.py —
# the single streaming-LSE spec shared with the fused CE kernel


def _pass_a_kernel(seed_ref, ofs_ref, y_ref, w_ref, b_ref,
                   lse_ref, idx_ref, clog_ref, bg_ref,
                   m_scr, l_scr, bg_scr, bi_scr, bl_scr,
                   *, v_true, k_cands, inv_temp, noise="log"):
    """``ofs_ref`` (SMEM): this call's GLOBAL column offset (0 full-vocab;
    axis_index('model') * V_shard when vocab-sharded). Candidate ids are
    GLOBAL, the per-block Gumbel seed folds the GLOBAL block index — so a
    sharded call draws bit-identical noise to the same blocks of an
    unsharded call and the cross-shard pmax merge reproduces the unsharded
    winner exactly. ``bg_ref`` additionally returns the best Gumbel score
    per candidate (the cross-shard merge key; unsharded callers ignore it).

    ``noise`` selects the within-block winner arithmetic (both consume the
    SAME per-block uniform field and are the SAME draw algebraically):

      "log"  (strategy "gumbel"): per-element Gumbel scores
        g = logits - log(-log u), block winner by max — 2 transcendental
        [n, vb] fields per candidate.
      "race" (strategy "expmin"): the exponential-race identity
        argmax_v (l_v + G_v) == argmin_v e_v * exp(bm - l_v) with
        e = -log u and bm the block max (exp(bm - l) is per-element but
        SHARED across the K candidates), then ONE [n, 1] log converts the
        block winner back to its exact Gumbel score
        bm - log(min_s) == l_w + G_w for the cross-block/cross-shard
        max-merge. Per candidate this is 1 log field instead of 2
        (plus the one shared exp field) — the round-2 trace put pass A's
        noise at 65% of sampling device time, so halving its
        transcendental work is the targeted win (docs/BENCH_NOTES.md).
        Same distribution EXACTLY (same uniforms, same argmax in real
        arithmetic); tokens may differ from "gumbel" only at float
        near-ties. Cols >= 88 nats below the block max round to
        probability 0 under "race" (exp underflow) — unreachable under
        "log" too (a float32 uniform cannot produce a Gumbel gap that
        large), so the truncation is shared.
    """
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    n = y_ref.shape[0]
    vb = w_ref.shape[0]
    ofs = ofs_ref[0]

    @pl.when(j == 0)
    def _():
        _flash_lse_init(m_scr, l_scr)
        bg_scr[:] = jnp.full_like(bg_scr, NEG)
        bi_scr[:] = jnp.zeros_like(bi_scr)
        bl_scr[:] = jnp.full_like(bl_scr, NEG)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true, ofs)
    _flash_lse_update(m_scr, l_scr, logits)

    # K independent Gumbel-argmax candidates
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1)
    if noise == "race":
        bm_blk = jnp.max(logits, axis=1, keepdims=True)
        # masked cols: logits = NEG -> exp(bm + 1e30) = +inf -> s = +inf,
        # never the min. Fully-masked blocks: bm = NEG absorbs the [n, 1]
        # -log(min_s) term below, so their score stays exactly NEG and
        # never beats a live block (the same absorption that guards the
        # "log" path).
        ipm = jnp.exp(bm_blk - logits)        # 1/softmax-rel, shared over k
    for k in range(k_cands):
        # at most 2 seed scalars are supported; fold (GLOBAL block,
        # candidate) into the second
        pltpu.prng_seed(seed_ref[0], (j + ofs // vb) * k_cands + k)
        u = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits((n, vb)), jnp.uint32))
        if noise == "race":
            s = (-jnp.log(u)) * ipm           # e_v / p_rel_v
            sm = jnp.min(s, axis=1, keepdims=True)
            is_best = s == sm
            bm = bm_blk - jnp.log(sm)         # == l_w + G_w ([n, 1] log)
        else:
            g = logits + (-jnp.log(-jnp.log(u)))
            bm = jnp.max(g, axis=1, keepdims=True)
            is_best = g == bm
        idx_blk = jnp.min(jnp.where(is_best, cols, vb), axis=1,
                          keepdims=True)
        logit_at = jnp.sum(jnp.where(cols == idx_blk, logits, 0.0),
                           axis=1, keepdims=True)
        better = bm > bg_scr[:, k:k + 1]
        bg_scr[:, k:k + 1] = jnp.where(better, bm, bg_scr[:, k:k + 1])
        bi_scr[:, k:k + 1] = jnp.where(
            better, (idx_blk + j * vb + ofs).astype(jnp.float32),
            bi_scr[:, k:k + 1])
        bl_scr[:, k:k + 1] = jnp.where(better, logit_at, bl_scr[:, k:k + 1])

    @pl.when(j == nv - 1)
    def _():
        lse_ref[:] = _flash_lse_final(m_scr, l_scr)
        idx_ref[:] = bi_scr[:].astype(jnp.int32)
        clog_ref[:] = bl_scr[:]
        bg_ref[:] = bg_scr[:]


def _pass_b_kernel(ofs_ref, y_ref, w_ref, b_ref, lse_ref, clog_ref, mass_ref,
                   acc_scr, *, v_true, k_cands, inv_temp):
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    ofs = ofs_ref[0]

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true, ofs)
    p = jnp.exp(logits - lse_ref[:])
    for k in range(k_cands):
        above = logits > clog_ref[:, k:k + 1]
        acc_scr[:, k:k + 1] += jnp.sum(jnp.where(above, p, 0.0),
                                       axis=1, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        mass_ref[:] = acc_scr[:]


def _pass_lse_kernel(ofs_ref, y_ref, w_ref, b_ref, lse_ref, m_scr, l_scr,
                     *, v_true, inv_temp):
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    ofs = ofs_ref[0]

    @pl.when(j == 0)
    def _():
        _flash_lse_init(m_scr, l_scr)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true, ofs)
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


def _pass_cdf_kernel(ofs_ref, c0_ref, y_ref, w_ref, b_ref, lse_ref, t_ref,
                     *refs, v_true, k_cands, inv_temp, raw=False):
    """Inverse-CDF candidate draw: candidate k = first vocab index whose
    running softmax prefix mass reaches target t_k in (0, 1). Sequential
    grid over vocab blocks; c_scr carries the cumulative mass so far,
    bi/bl the found index/logit per candidate (-1 = not found yet), ll the
    fallback logit at the last in-vocab column for targets beyond the f32
    prefix total.

    ``ofs_ref`` (SMEM): GLOBAL column offset (0 full-vocab; vocab-sharded
    calls pass axis_index('model') * V_shard) — candidate ids and the
    v_true mask use global coordinates. ``c0_ref`` [n, 1]: the prefix mass
    BELOW this call's slice (0 full-vocab; sum of earlier shards' softmax
    mass when sharded) so the stitched per-shard prefixes form one global
    CDF. With ``raw`` the kernel skips the fallback resolution and emits
    (bi with -1 = not-found-here, bl, ll) for the caller's cross-shard
    merge (fused_top_p_sample_sharded)."""
    if raw:
        idx_ref, clog_ref, ll_ref, c_scr, bi_scr, bl_scr, ll_scr = refs
    else:
        idx_ref, clog_ref, c_scr, bi_scr, bl_scr, ll_scr = refs
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    n = y_ref.shape[0]
    vb = w_ref.shape[0]
    ofs = ofs_ref[0]

    @pl.when(j == 0)
    def _():
        c_scr[:] = c0_ref[:]
        bi_scr[:] = jnp.full_like(bi_scr, -1.0)
        bl_scr[:] = jnp.full_like(bl_scr, NEG)
        ll_scr[:] = jnp.zeros_like(ll_scr)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true, ofs)
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
        found = ((cnt < vb) & (cnt + j * vb + ofs < v_true)
                 & (bi_scr[:, k:k + 1] < 0))
        sel = cols == cnt.astype(jnp.int32)
        logit_at = jnp.sum(jnp.where(sel, logits, 0.0), axis=1,
                           keepdims=True)
        bi_scr[:, k:k + 1] = jnp.where(found, cnt + j * vb + ofs,
                                       bi_scr[:, k:k + 1])
        bl_scr[:, k:k + 1] = jnp.where(found, logit_at, bl_scr[:, k:k + 1])
    c_scr[:] = cums[:, -1:]

    # the fallback logit at GLOBAL column v_true-1: exactly one block of
    # one call ever matches (a sharded call may own none — ll stays 0 and
    # the merge masks it out via the owner test)
    cols_g = cols + j * vb + ofs
    ll_scr[:] += jnp.sum(jnp.where(cols_g == v_true - 1, logits, 0.0),
                         axis=1, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        if raw:
            idx_ref[:] = bi_scr[:].astype(jnp.int32)
            clog_ref[:] = bl_scr[:]
            ll_ref[:] = ll_scr[:]
        else:
            none = bi_scr[:] < 0
            idx_ref[:] = jnp.where(none, v_true - 1,
                                   bi_scr[:]).astype(jnp.int32)
            clog_ref[:] = jnp.where(none, ll_scr[:], bl_scr[:])


def _ofs_arr(col_ofs):
    return jnp.asarray(col_ofs, jnp.int32).reshape(1)


def _compute_lse(y, w, b, *, v_true, inv_temp, vblock, col_ofs=0):
    n, d = y.shape
    v = w.shape[0]
    return pl.pallas_call(
        functools.partial(_pass_lse_kernel, v_true=v_true,
                          inv_temp=inv_temp),
        grid=(v // vblock,),
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
        ],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
    )(_ofs_arr(col_ofs), y, w.reshape(v, d), b.reshape(1, v))[0]


def _draw_candidates_cdf(y, w, b, lse, targets, *, v_true, k_cands,
                         inv_temp, vblock, col_ofs=0, c0=None, raw=False):
    n, d = y.shape
    v = w.shape[0]
    if c0 is None:
        c0 = jnp.zeros((n, 1), jnp.float32)
    nkspec = pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [nkspec, nkspec]
    out_shape = [
        jax.ShapeDtypeStruct((n, k_cands), jnp.int32),
        jax.ShapeDtypeStruct((n, k_cands), jnp.float32),
    ]
    if raw:
        out_specs.append(pl.BlockSpec((n, 1), lambda j: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n, 1), jnp.float32))
    return pl.pallas_call(
        functools.partial(_pass_cdf_kernel, v_true=v_true, k_cands=k_cands,
                          inv_temp=inv_temp, raw=raw),
        grid=(v // vblock,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            nkspec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
    )(_ofs_arr(col_ofs), c0, y, w.reshape(v, d), b.reshape(1, v), lse,
      targets)


def _pass_a_call(y, w, b, seed, *, v_true, k_cands, inv_temp, vblock,
                 col_ofs=0, noise="log"):
    """Pass A: (lse [n,1], candidate ids [n,K] GLOBAL, candidate logits
    [n,K], best Gumbel scores [n,K])."""
    n, d = y.shape
    v = w.shape[0]
    nkspec = pl.BlockSpec((n, k_cands), lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pass_a_kernel, v_true=v_true, k_cands=k_cands,
                          inv_temp=inv_temp, noise=noise),
        grid=(v // vblock,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            nkspec, nkspec, nkspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, k_cands), jnp.int32),
            jax.ShapeDtypeStruct((n, k_cands), jnp.float32),
            jax.ShapeDtypeStruct((n, k_cands), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
            pltpu.VMEM((n, k_cands), jnp.float32),
        ],
    )(seed.reshape(1), _ofs_arr(col_ofs), y, w.reshape(v, d),
      b.reshape(1, v))


def _draw_candidates(y, w, b, seed, *, v_true, k_cands, inv_temp, vblock,
                     noise="log"):
    lse, idx, clog, _ = _pass_a_call(y, w, b, seed, v_true=v_true,
                                     k_cands=k_cands, inv_temp=inv_temp,
                                     vblock=vblock, noise=noise)
    masses = _candidate_masses(y, w, b, lse, clog, v_true=v_true,
                               k_cands=k_cands, inv_temp=inv_temp,
                               vblock=vblock)
    return idx, masses


def _candidate_masses(y, w, b, lse, clog, *, v_true, k_cands, inv_temp,
                      vblock, col_ofs=0):
    n, d = y.shape
    v = w.shape[0]
    return pl.pallas_call(
        functools.partial(_pass_b_kernel, v_true=v_true, k_cands=k_cands,
                          inv_temp=inv_temp),
        grid=(v // vblock,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(_ofs_arr(col_ofs), y, w.reshape(v, d), b.reshape(1, v), lse, clog)[0]


def fused_top_p_sample(y, w, b, seed, top_p, *, v_true=None, temperature=1.0,
                       k_cands=4, max_rounds=4, vblock=None, rowchunk=None,
                       strategy="gumbel", mm_dtype=jnp.float32):
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
    noise); "expmin" = the same draw via the exponential-race identity
    (2 passes, about half the noise transcendentals — _pass_a_kernel
    docstring); "cdf" = inverse-CDF prefix scan (3 passes over W, K scalar
    uniforms per row, no per-element noise). Same distribution in all
    cases; the nucleus acceptance rule and retry loop are shared.

    ``vblock`` / ``rowchunk`` override the vocab-tile width and the
    rows-per-kernel chunking (defaults: pick_vblock / ROWCHUNK). The
    per-block noise seed folds the GLOBAL block index, so a different
    vblock is a different (equally distributed) RNG stream — a perf knob
    like ``strategy``, not bit-stable across values. VMEM bounds the
    product: bigger tiles need smaller row chunks (the hardware A/B in
    scripts/tpu_queue gates any default change)."""
    if strategy not in ("gumbel", "expmin", "cdf"):
        raise ValueError(
            f"strategy must be 'gumbel', 'expmin' or 'cdf', got {strategy!r}")
    n = y.shape[0]
    v_true = v_true or w.shape[0]
    dvb, drc = default_geometry(w.shape[0], mm_dtype)
    vblock = vblock if vblock else dvb
    rowchunk = int(rowchunk) if rowchunk else drc
    _check_tile_and_temp(vblock, w.shape[0], temperature)
    inv_temp = (1.0 / float(temperature)) if temperature else 1.0
    y = y.astype(jnp.float32)
    # mm_dtype (``fused_sample_dtype``): the head streams in this dtype —
    # bf16 halves the dominant HBM read of every pass, f32 accumulation
    # (a perf mode like fused_ce_dtype, not bit-identical to f32)
    w = w.astype(jnp.dtype(mm_dtype))
    b = b.astype(jnp.float32)
    seed = jnp.asarray(seed).astype(jnp.int32)

    if n > rowchunk:
        # row-chunking keeps each kernel's VMEM bounded; each chunk runs its
        # own candidate rounds with a decorrelated seed
        toks = [
            fused_top_p_sample(y[s:s + rowchunk], w, b,
                               seed + jnp.int32(104729 * (s // rowchunk + 1)),
                               top_p, v_true=v_true, temperature=temperature,
                               k_cands=k_cands, max_rounds=max_rounds,
                               vblock=vblock, rowchunk=rowchunk,
                               strategy=strategy, mm_dtype=mm_dtype)
            for s in range(0, n, rowchunk)
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
        draw = functools.partial(
            _draw_candidates, y, w, b, v_true=v_true, k_cands=k_cands,
            inv_temp=inv_temp, vblock=vblock,
            noise="race" if strategy == "expmin" else "log")

    return _accept_loop(draw, seed, top_p, max_rounds)


def _accept_loop(draw, seed, top_p, max_rounds):
    """Shared candidate-acceptance retry loop: draw(seed) -> (idx [B,K]
    GLOBAL candidate ids, masses [B,K] strictly-above nucleus masses);
    accept the first candidate with mass <= top_p, retry stragglers with a
    fresh seed, keep the last candidate after ``max_rounds``."""
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


def fused_top_p_sample_sharded(y, w, b, seed, top_p, *, v_true,
                               axis_name="model", temperature=1.0,
                               k_cands=4, max_rounds=4, vblock=None,
                               rowchunk=None, strategy="gumbel",
                               mm_dtype=jnp.float32):
    """Vocab-sharded fused sampling step — runs INSIDE a shard_map whose
    specs put w/b's vocab dimension on ``axis_name`` (the north-star
    wd-articles serving geometry, parallel/mesh.param_shardings).

    y [B_local, D] hidden states (batch may be data-sharded outside);
    w [V_pad/n_model, D] / b [V_pad/n_model] the LOCAL head slice; seed an
    int32 scalar IDENTICAL on every vocab shard of a data shard (data-axis
    decorrelation is the caller's job). Each device streams only its vocab
    slice — the head is never all-gathered — and per-row scalar collectives
    merge the shard statistics:

      gumbel: per-shard pass A draws candidates over the local slice with
        the GLOBAL block index folded into the Gumbel seed, so the shard
        noise is bit-identical to the same blocks of an unsharded call;
        the winner merges by pmax of the best Gumbel score (ties broken to
        the lowest global id, matching the unsharded kernel's first-block-
        wins rule), the candidate logit by a masked psum, the logsumexp by
        the flash merge.
      cdf: per-shard flash LSE -> global lse (ops/collectives.merge_lse); each shard's
        prefix scan starts at the softmax mass of all earlier shards
        (exp(lse_shard - lse) all-gathered), stitching one global CDF; the
        first found (smallest) global index wins by pmin; targets beyond
        the f32 total fall back to v_true-1 on its owning shard.

    The nucleus-membership masses psum over shards and the shared
    acceptance/retry loop (_accept_loop) sees replicated (idx, mass) — all
    shards take the same branch. Same renormalized-nucleus distribution as
    fused_top_p_sample; equivalence: tests/test_fused_sample.py (sharded
    greedy degeneracy is bit-exact, sharded cdf is distribution-tested).
    """
    if strategy not in ("gumbel", "expmin", "cdf"):
        raise ValueError(
            f"strategy must be 'gumbel', 'expmin' or 'cdf', got {strategy!r}")
    n = y.shape[0]
    v_shard = w.shape[0]
    dvb, drc = default_geometry(v_shard, mm_dtype)
    vblock = vblock if vblock else dvb
    rowchunk = int(rowchunk) if rowchunk else drc
    _check_tile_and_temp(vblock, v_shard, temperature)
    inv_temp = (1.0 / float(temperature)) if temperature else 1.0
    y = y.astype(jnp.float32)
    w = w.astype(jnp.dtype(mm_dtype))
    b = b.astype(jnp.float32)
    seed = jnp.asarray(seed).astype(jnp.int32)
    ofs = (jax.lax.axis_index(axis_name) * v_shard).astype(jnp.int32)

    if n > rowchunk:
        toks = [
            fused_top_p_sample_sharded(
                y[s:s + rowchunk], w, b,
                seed + jnp.int32(104729 * (s // rowchunk + 1)),
                top_p, v_true=v_true, axis_name=axis_name,
                temperature=temperature, k_cands=k_cands,
                max_rounds=max_rounds, vblock=vblock, rowchunk=rowchunk,
                strategy=strategy, mm_dtype=mm_dtype)
            for s in range(0, n, rowchunk)
        ]
        return jnp.concatenate(toks)

    BIG = jnp.int32(1 << 30)
    owns_last = (ofs <= v_true - 1) & (v_true - 1 < ofs + v_shard)

    def merge_masses(lse, clog):
        local = _candidate_masses(y, w, b, lse, clog, v_true=v_true,
                                  k_cands=k_cands, inv_temp=inv_temp,
                                  vblock=vblock, col_ofs=ofs)
        return jax.lax.psum(local, axis_name)

    if strategy == "cdf":
        lse_s = _compute_lse(y, w, b, v_true=v_true, inv_temp=inv_temp,
                             vblock=vblock, col_ofs=ofs)
        lse = merge_lse(lse_s, axis_name)
        # softmax mass of all EARLIER shards = this shard's prefix origin
        mass_s = jnp.exp(lse_s - lse)                       # [n, 1]
        all_mass = jax.lax.all_gather(mass_s, axis_name)    # [nm, n, 1]
        nm = all_mass.shape[0]
        before = (jnp.arange(nm)[:, None, None]
                  < jax.lax.axis_index(axis_name))
        prefix = jnp.sum(jnp.where(before, all_mass, 0.0), axis=0)

        def draw(s):
            u = jax.random.uniform(jax.random.PRNGKey(s), (n, k_cands),
                                   minval=jnp.float32(1e-7), maxval=1.0)
            bi, bl, ll = _draw_candidates_cdf(
                y, w, b, lse, u, v_true=v_true, k_cands=k_cands,
                inv_temp=inv_temp, vblock=vblock, col_ofs=ofs, c0=prefix,
                raw=True)
            idx_f = jnp.where(bi >= 0, bi, BIG)
            idx_min = jax.lax.pmin(idx_f, axis_name)
            found = idx_min < BIG
            clog_hit = jax.lax.psum(
                jnp.where(idx_f == idx_min, bl, 0.0), axis_name)
            ll_g = jax.lax.psum(jnp.where(owns_last, ll, 0.0), axis_name)
            idx = jnp.where(found, idx_min, v_true - 1)
            clog = jnp.where(found, clog_hit, ll_g)
            return idx, merge_masses(lse, clog)
    else:
        def draw(s):
            # "expmin" shares the merge untouched: its bg output is the
            # identical Gumbel score (up to rounding), and all element
            # math is block-local, so the global-block-keyed stitching
            # property is preserved
            lse_s, idx_s, clog_s, bg_s = _pass_a_call(
                y, w, b, s, v_true=v_true, k_cands=k_cands,
                inv_temp=inv_temp, vblock=vblock, col_ofs=ofs,
                noise="race" if strategy == "expmin" else "log")
            lse = merge_lse(lse_s, axis_name)
            bg_max = jax.lax.pmax(bg_s, axis_name)
            idx_f = jnp.where(bg_s == bg_max, idx_s, BIG)
            idx = jax.lax.pmin(idx_f, axis_name)  # lowest id among ties
            clog = jax.lax.psum(jnp.where(idx_f == idx, clog_s, 0.0),
                                axis_name)
            return idx, merge_masses(lse, clog)

    return _accept_loop(draw, seed, top_p, max_rounds)
