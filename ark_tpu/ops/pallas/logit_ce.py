"""Pallas TPU kernel: fused large-vocabulary logits + cross-entropy.

The wd-articles hot path (BASELINE.json kernel target; SURVEY §7 step 7):
the decoder's output projection produces [B*L, V] logits with V ~ 59k.
Materializing them in HBM costs ~320 MB per pass (f32, reference config) and
the CE forward+backward touches that buffer several times. This kernel never
materializes the logits: it streams vocabulary blocks through VMEM with an
online max / sum-exp accumulator (flash-softmax style), and the custom-VJP
backward recomputes each logits block to form dx / dW / db directly.

  nll[i] = logsumexp_j(x_i . w_j + b_j) - (x_i . w_t + b_t),  t = target[i]

HBM traffic: forward reads x (N*D) + W (V*D) once, writes [N]; backward reads
them once more and writes dx + dW + db — versus the XLA path's extra O(N*V)
logits and dlogits round-trips.

Weights are taken in embedding layout [V, D] (the tied-head case: logits =
y @ emb.T + b, ark_tpu/models/decoders.py _head_apply), so no [D, V]
transpose is ever materialized. Requires N % 8 == 0, D % 128 == 0,
V % VBLOCK == 0 (use ``vocab_pad_multiple: 128``); callers check
``supported()`` and fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ark_tpu.ops.pallas.flash_lse import (
    NEG,
    flash_lse_final,
    flash_lse_init,
    flash_lse_update,
)

VBLOCK = 512  # vocabulary tile (lane-aligned)


# Rows per kernel invocation. Bounds the backward kernel's VMEM footprint
# (~11.2 KB/row at d=512, vblock=512: x + dx blocks, logits/probs/dlogits
# temporaries); empirically 1360 rows compiles at ~15.2 MB of the 16 MB
# scoped-vmem budget while 1536 rows overflows (17.1 MB). 1360 is also
# exactly the flagship wd-articles shape (batch 16 x 85 targets), so the
# headline config takes the single-call path. Chunks' dW/db gradients sum
# through the chunked custom-VJP calls.
NCHUNK = 1360


def supported(n, d, v, vblock=VBLOCK):
    return n % 8 == 0 and d % 128 == 0 and v % vblock == 0


def _pick_vblocks(n, v, vblock):
    """(fwd, bwd) vocab tiles. A 1024 tile amortizes per-block pipeline
    overhead (fwd -13% measured, docs/BENCH_NOTES.md), but both kernels'
    [rows, vblock] temporaries overflow the 16 MB scoped VMEM above ~1024
    rows (the fwd by 156 KB inside the train step's jvp at 1360 rows), so
    the full row chunk keeps the 512 tile."""
    big_ok = v % 1024 == 0 and n <= 1024
    fwd = 1024 if big_ok else vblock
    bwd = 1024 if big_ok else vblock
    return fwd, bwd


# ---------------------------------------------------------------------------
# Forward: online logsumexp + target logit gather
# ---------------------------------------------------------------------------

def _fwd_kernel(ofs_ref, x_ref, w_ref, b_ref, tgt_ref, nll_ref, lse_ref,
                m_scr, l_scr, t_scr, *, v_true, mm_dtype=jnp.float32):
    """Grid over vocab blocks j. w_ref block is [VBLOCK, D] (embedding rows).
    Scratch persists across the sequential TPU grid: running max m [N,1],
    running sum-exp l [N,1], target logit t [N,1].

    ``ofs_ref`` (SMEM scalar): this call's global column offset — 0 for a
    full-vocab call; shard_offset = axis_index('model') * V_shard when the
    head is vocab-sharded and each device streams only its W slice
    (fused_masked_cross_entropy's shard_vocab path). All column arithmetic
    (v_true masking, target hit) is done in GLOBAL column coordinates."""
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    vb = w_ref.shape[0]
    n = x_ref.shape[0]
    ofs = ofs_ref[0]

    @pl.when(j == 0)
    def _():
        flash_lse_init(m_scr, l_scr)
        t_scr[:] = jnp.zeros_like(t_scr)

    logits = jax.lax.dot_general(
        x_ref[:].astype(mm_dtype), w_ref[:].astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [N, VB]
    logits = logits + b_ref[0, :].reshape(1, vb)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1) + j * vb + ofs
    logits = jnp.where(cols_g < v_true, logits, NEG)  # mask vocab padding

    tgt = tgt_ref[:, 0].reshape(n, 1)
    local = tgt - j * vb - ofs
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1)
    hit = cols == local
    t_scr[:] += jnp.sum(jnp.where(hit, logits, 0.0), axis=1, keepdims=True)

    # the shared streaming-LSE spec (flash_lse.py) — bitwise the sampler's
    flash_lse_update(m_scr, l_scr, logits)

    @pl.when(j == nv - 1)
    def _():
        lse = flash_lse_final(m_scr, l_scr)
        lse_ref[:] = lse
        nll_ref[:] = lse - t_scr[:]


def _fwd_call(x, w, b, targets, vblock, v_true, mm_dtype=jnp.float32,
              col_ofs=0):
    n, d = x.shape
    v = w.shape[0]
    grid = (v // vblock,)
    ofs = jnp.asarray(col_ofs, jnp.int32).reshape(1)
    nll, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, v_true=v_true, mm_dtype=mm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
    )(ofs, x, w.reshape(v, d), b.reshape(1, v), targets.reshape(n, 1))
    return nll[:, 0], lse[:, 0]


# ---------------------------------------------------------------------------
# Backward: recompute block logits, form probs, accumulate dx / dW / db
# ---------------------------------------------------------------------------

def _bwd_kernel(ofs_ref, x_ref, w_ref, b_ref, tgt_ref, lse_ref, g1_ref,
                g2_ref, dx_ref, dw_ref, db_ref, *, v_true,
                mm_dtype=jnp.float32, combined=True):
    """``combined=True`` (the nll VJP): dlogits = (p - onehot) * g1 with
    p = exp(logits - lse) and g2 unused. ``combined=False`` (the (lse, t)
    VJP used by the vocab-sharded path): dlogits = g1 * p + g2 * onehot —
    independent cotangents g1 for the shard-local logsumexp and g2 for the
    target logit; the caller folds the cross-shard softmax weights into g1
    (fused_ce_lse_t)."""
    j = pl.program_id(0)
    vb = w_ref.shape[0]
    n = x_ref.shape[0]
    ofs = ofs_ref[0]

    @pl.when(j == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    logits = jax.lax.dot_general(
        x_ref[:].astype(mm_dtype), w_ref[:].astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + b_ref[0, :].reshape(1, vb)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1) + j * vb + ofs
    logits = jnp.where(cols_g < v_true, logits, -1e30)
    p = jnp.exp(logits - lse_ref[:])

    tgt = tgt_ref[:, 0].reshape(n, 1)
    local = tgt - j * vb - ofs
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1)
    # in-vocab guard: a (nonsensical) target pointing at a masked padding
    # column must carry zero gradient — the forward's where() pins that
    # logit to the -1e30 constant, so its cotangent is 0, exactly like the
    # XLA path's sliced logits
    onehot = ((cols == local) & (cols_g < v_true)).astype(jnp.float32)

    if combined:
        dlogits = (p - onehot) * g1_ref[:]            # [N, VB]
    else:
        dlogits = g1_ref[:] * p + g2_ref[:] * onehot
    dlog_mm = dlogits.astype(mm_dtype)
    dx_ref[:] += jnp.dot(dlog_mm, w_ref[:].astype(mm_dtype),
                         preferred_element_type=jnp.float32)
    # dW block (embedding layout [VB, D]) = dlogits^T @ x
    dw_ref[:] = jax.lax.dot_general(
        dlog_mm, x_ref[:].astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] = jnp.sum(dlogits, axis=0, keepdims=True)


def _bwd_call(x, w, b, targets, lse, g1, g2, vblock, v_true,
              mm_dtype=jnp.float32, col_ofs=0, combined=True):
    n, d = x.shape
    v = w.shape[0]
    grid = (v // vblock,)
    ofs = jnp.asarray(col_ofs, jnp.int32).reshape(1)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, v_true=v_true, mm_dtype=mm_dtype,
                          combined=combined),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((v, d), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ],
    )(ofs, x, w.reshape(v, d), b.reshape(1, v), targets.reshape(n, 1),
      lse.reshape(n, 1), g1.reshape(n, 1), g2.reshape(n, 1))
    return dx, dw, db[0]


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_ce_nll(x, w, b, targets, vblock=VBLOCK, v_true=None,
                 mm_dtype=jnp.float32, vblock_bwd=None):
    """Per-row NLL of ``targets`` under logits = x @ w.T + b.

    x [N, D] f32, w [V, D] f32 (embedding layout), b [V] f32,
    targets [N] int32 -> nll [N] f32. Differentiable wrt x, w, b.
    ``v_true``: true vocab size; columns >= v_true (embedding padding rows)
    are excluded from the softmax, matching the XLA path's logits slice.
    ``mm_dtype``: matmul input precision (f32 default; bf16 halves the MXU
    time with f32 accumulation — a perf mode, not bit-identical to f32).
    ``vblock_bwd``: backward vocab tile (defaults to ``vblock``; the bwd
    has a smaller VMEM budget than the fwd — see _pick_vblocks).
    """
    nll, _ = _fwd_call(x, w, b, targets, vblock, v_true or w.shape[0],
                       mm_dtype)
    return nll


def _fwd_rule(x, w, b, targets, vblock, v_true, mm_dtype, vblock_bwd):
    nll, lse = _fwd_call(x, w, b, targets, vblock, v_true or w.shape[0],
                         mm_dtype)
    return nll, (x, w, b, targets, lse)


def _bwd_rule(vblock, v_true, mm_dtype, vblock_bwd, res, g):
    x, w, b, targets, lse = res
    dx, dw, db = _bwd_call(x, w, b, targets, lse, g, g, vblock_bwd or vblock,
                           v_true or w.shape[0], mm_dtype, combined=True)
    return dx, dw, db, None


fused_ce_nll.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Vocab-sharded variant: per-shard (logsumexp, target-logit) with a VJP
# ---------------------------------------------------------------------------
# When the embedding/head is sharded over a 'model' mesh axis (the
# wd-articles north-star geometry, parallel/mesh.py param_shardings), each
# device holds V/n_model embedding rows. The fused kernel then runs PER
# SHARD over its local W slice and returns the two sufficient statistics of
# the row's softmax restricted to that slice:
#
#   lse_s = logsumexp over the shard's vocab columns
#   t_s   = the target logit if the target column lives on this shard, 0
#           otherwise (exactly one shard hits)
#
# The caller (fused_masked_cross_entropy's shard_vocab path) merges them
# with two scalar-per-row collectives over 'model':
#
#   nll = logsumexp_merge(lse_s) - psum(t_s)
#
# which is the same flash-logsumexp algebra the kernel runs across vocab
# BLOCKS, applied once more across SHARDS — no [N, V] logits, no head
# all-gather. Gradients flow through the merge by plain autodiff; this VJP
# supplies d(lse_s, t_s)/d(x, w_s, b_s):
#
#   dlogits = g_lse * softmax_local + g_t * onehot(target)
#
# (the merge's backward sets g_lse = g_nll * exp(lse_s - lse_global),
# making g_lse * softmax_local == g_nll * exp(logits - lse_global) — the
# exact global-softmax gradient, evaluated shard-locally).

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_ce_lse_t(x, w, b, targets, col_ofs, vblock=VBLOCK, v_true=None,
                   mm_dtype=jnp.float32, vblock_bwd=None):
    """Per-row (lse, target_logit) of this shard's vocab slice.

    x [N, D] f32, w [V_shard, D] f32 (embedding layout), b [V_shard] f32,
    targets [N] int32 GLOBAL ids, col_ofs int32 scalar = this shard's global
    column offset -> (lse [N], t [N]) f32. Differentiable wrt x, w, b.
    ``v_true`` is the GLOBAL true vocab size (padding columns masked)."""
    nll, lse = _fwd_call(x, w, b, targets, vblock, v_true, mm_dtype, col_ofs)
    return lse, lse - nll


def _lse_t_fwd(x, w, b, targets, col_ofs, vblock, v_true, mm_dtype,
               vblock_bwd):
    nll, lse = _fwd_call(x, w, b, targets, vblock, v_true, mm_dtype, col_ofs)
    return (lse, lse - nll), (x, w, b, targets, col_ofs, lse)


def _lse_t_bwd(vblock, v_true, mm_dtype, vblock_bwd, res, g):
    x, w, b, targets, col_ofs, lse = res
    g_lse, g_t = g
    dx, dw, db = _bwd_call(x, w, b, targets, lse, g_lse, g_t,
                           vblock_bwd or vblock, v_true, mm_dtype,
                           col_ofs=col_ofs, combined=False)
    return dx, dw, db, None, None


fused_ce_lse_t.defvjp(_lse_t_fwd, _lse_t_bwd)


def fused_ce_lse_t_rows(x, w, b, tgt, pad_id, v_true, col_ofs, vblock=VBLOCK,
                        mm_dtype=jnp.float32):
    """Row-chunked ``fused_ce_lse_t`` (same chunking policy/VMEM bound as
    fused_ce_nll_rows). Returns (lse [N], t [N])."""
    n, d = x.shape
    v = w.shape[0]
    if n <= NCHUNK:
        vb_f, vb_b = _pick_vblocks(n, v, vblock)
        return fused_ce_lse_t(x, w, b, tgt, col_ofs, vb_f, v_true, mm_dtype,
                              vb_b)
    vb_f, vb_b = _pick_vblocks(NCHUNK, v, vblock)
    lses, ts = [], []
    for start in range(0, n, NCHUNK):
        stop = min(start + NCHUNK, n)
        xc, tc = x[start:stop], tgt[start:stop]
        if stop - start < NCHUNK:
            padn = NCHUNK - (stop - start)
            xc = jnp.concatenate([xc, jnp.zeros((padn, d), x.dtype)])
            tc = jnp.concatenate([tc, jnp.full((padn,), pad_id, tc.dtype)])
        lse_c, t_c = fused_ce_lse_t(xc, w, b, tc, col_ofs, vb_f, v_true,
                                    mm_dtype, vb_b)
        lses.append(lse_c[:stop - start])
        ts.append(t_c[:stop - start])
    return jnp.concatenate(lses), jnp.concatenate(ts)


def fused_ce_nll_rows(x, w, b, tgt, pad_id, v_true, vblock=VBLOCK,
                      mm_dtype=jnp.float32):
    """Per-row NLL [N] via the fused kernel, row-chunked so each kernel's
    VMEM stays bounded (NCHUNK rows per call; the ragged tail is padded with
    PAD targets and sliced off). Differentiable wrt x, w, b."""
    n, d = x.shape
    v = w.shape[0]
    if n <= NCHUNK:
        vb_f, vb_b = _pick_vblocks(n, v, vblock)
        return fused_ce_nll(x, w, b, tgt, vb_f, v_true, mm_dtype, vb_b)
    vb_f, vb_b = _pick_vblocks(NCHUNK, v, vblock)
    chunks = []
    for start in range(0, n, NCHUNK):
        stop = min(start + NCHUNK, n)
        xc, tc = x[start:stop], tgt[start:stop]
        if stop - start < NCHUNK:
            padn = NCHUNK - (stop - start)
            xc = jnp.concatenate([xc, jnp.zeros((padn, d), x.dtype)])
            tc = jnp.concatenate([tc, jnp.full((padn,), pad_id, tc.dtype)])
        chunks.append(fused_ce_nll(xc, w, b, tc, vb_f, v_true,
                                   mm_dtype, vb_b)[:stop - start])
    return jnp.concatenate(chunks)


def _fused_ce_sums(y, w, b, targets, pad_id, v_true, vblock, mm_dtype,
                   row_cap=0):
    """(sum of non-PAD NLL, non-PAD count) over the rows of this shard.

    ``row_cap``: static upper bound on the number of non-PAD rows in this
    call (0 = no bound). The kernel's cost is linear in rows x vocab, and
    on the wd datasets ~40% of teacher-forcing rows are PAD (graphs are much
    shorter than the max-edges layout) — so rows are reordered live-first
    (stable argsort on the PAD mask) and only the first ``row_cap`` enter
    the kernel. EXACT math: every live row is within the cap by the
    caller's construction (ops/losses.compute_ce_row_cap — the max over
    actual batches), PAD rows contribute zero either way; only the f32
    summation order changes. The (live > cap) guard poisons the loss to
    +inf rather than silently dropping rows if a caller ever passes an
    invalid cap."""
    bsz, l, d = y.shape
    x = y.reshape(bsz * l, d).astype(jnp.float32)
    tgt = targets.reshape(-1).astype(jnp.int32)
    # bf16 matmul mode also STREAMS the head weights as bf16 — half the HBM
    # bytes and half the VMEM per vocab block, not just a cheaper MXU pass
    wf = w.astype(jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32)
    bf = b.astype(jnp.float32)
    n = x.shape[0]
    full_mask = (tgt != pad_id).astype(jnp.float32)
    guard = jnp.float32(0.0)
    if 0 < row_cap < n:
        order = jnp.argsort(tgt == pad_id, stable=True)  # live rows first
        x = x[order[:row_cap]]
        tgt = tgt[order[:row_cap]]
        n = row_cap
        guard = jnp.where(jnp.sum(full_mask) > row_cap, jnp.inf, 0.0)
    nll = fused_ce_nll_rows(x, wf, bf, tgt, pad_id, v_true, vblock, mm_dtype)
    mask = (tgt != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) + guard, jnp.sum(full_mask)


def _fused_ce_sums_sharded(y, w, b, targets, pad_id, v_true, vblock,
                           mm_dtype, row_cap=0, model_axis="model"):
    """Vocab-sharded (sum of non-PAD NLL, non-PAD count): runs INSIDE a
    shard_map whose specs put w/b's vocab dimension on ``model_axis``. Each
    shard streams only its V/n_model slice of the head; two per-row scalar
    collectives merge the shard statistics (see fused_ce_lse_t's header).
    Identical math to _fused_ce_sums — only the f32 summation grouping of
    the logsumexp differs (blocks-within-shard, then shards)."""
    bsz, l, d = y.shape
    x = y.reshape(bsz * l, d).astype(jnp.float32)
    tgt = targets.reshape(-1).astype(jnp.int32)
    wf = w.astype(jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32)
    bf = b.astype(jnp.float32)
    n = x.shape[0]
    full_mask = (tgt != pad_id).astype(jnp.float32)
    guard = jnp.float32(0.0)
    if 0 < row_cap < n:
        # targets are replicated along 'model', so every vocab shard
        # computes the same stable order — shard statistics stay aligned
        order = jnp.argsort(tgt == pad_id, stable=True)
        x = x[order[:row_cap]]
        tgt = tgt[order[:row_cap]]
        n = row_cap
        guard = jnp.where(jnp.sum(full_mask) > row_cap, jnp.inf, 0.0)
    ofs = (jax.lax.axis_index(model_axis) * w.shape[0]).astype(jnp.int32)
    lse_s, t_s = fused_ce_lse_t_rows(x, wf, bf, tgt, pad_id, v_true, ofs,
                                     vblock, mm_dtype)
    from ark_tpu.ops.collectives import merge_lse

    lse = merge_lse(lse_s, model_axis)
    t = jax.lax.psum(t_s, model_axis)
    nll = lse - t
    mask = (tgt != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) + guard, jnp.sum(full_mask)


def fused_masked_cross_entropy(y, w, b, targets, pad_id, v_true=None,
                               vblock=VBLOCK, mm_dtype=jnp.float32,
                               mesh=None, row_cap=0, shard_vocab=False):
    """Masked-mean CE over non-PAD targets via the fused kernel.

    y [B, L, D] hidden states; w [V, D] embedding-layout head weights;
    b [V]; targets [B, L]. Returns (ce_mean, n_tokens) — the exact semantics
    of ops.losses.masked_cross_entropy (torch ignore_index).

    With ``mesh`` (a Mesh with a 'data' axis of size > 1), the kernel runs
    under shard_map: each device computes its batch shard's (sum, count)
    locally — Mosaic custom calls are not GSPMD-partitionable, so this is
    what lets the kernel engage inside a sharded train step — and the
    masked mean is psum'd over 'data' (exactly the single-device value).

    With ``shard_vocab`` (mesh must also have a 'model' axis of size > 1
    and w/b must be vocab-sharded over it, parallel/mesh.param_shardings),
    each device additionally streams only its vocab slice of the head and
    the per-row softmax statistics merge over 'model'
    (_fused_ce_sums_sharded) — the kernel survives the north-star
    vocab-sharded wd-articles geometry instead of falling back to XLA."""
    from jax.sharding import PartitionSpec as P

    axes = {} if mesh is None else dict(mesh.shape)
    if shard_vocab and axes.get("model", 1) > 1:
        if "data" not in axes:
            raise ValueError("shard_vocab fused CE requires a 'data' mesh "
                             f"axis (got mesh axes {tuple(axes)})")
        if v_true is None:
            # per-shard w.shape[0] is NOT the global vocab size, so the
            # full-vocab default of fused_ce_nll can't apply here
            raise ValueError("shard_vocab fused CE requires v_true (the "
                             "GLOBAL true vocab size)")

        def local(y, w, b, targets):
            total, count = _fused_ce_sums_sharded(
                y, w, b, targets, pad_id, v_true, vblock, mm_dtype, row_cap)
            return (jax.lax.psum(total, "data"),
                    jax.lax.psum(count, "data"))

        total, count = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data", None, None), P("model", None), P("model"),
                      P("data", None)),
            out_specs=(P(), P()), check_vma=False)(y, w, b, targets)
    elif axes.get("data", 1) > 1:
        def local(y, w, b, targets):
            # row_cap is a per-shard bound here (callers pass
            # compute_ce_row_cap(..., n_shards=mesh data size))
            total, count = _fused_ce_sums(y, w, b, targets, pad_id, v_true,
                                          vblock, mm_dtype, row_cap)
            return (jax.lax.psum(total, "data"),
                    jax.lax.psum(count, "data"))

        total, count = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data", None, None), P(), P(), P("data", None)),
            out_specs=(P(), P()), check_vma=False)(y, w, b, targets)
    else:
        total, count = _fused_ce_sums(y, w, b, targets, pad_id, v_true,
                                      vblock, mm_dtype, row_cap)
    return total / jnp.maximum(count, 1.0), count
