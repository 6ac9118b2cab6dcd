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

def _fwd_kernel(x_ref, w_ref, b_ref, tgt_ref, nll_ref, lse_ref,
                m_scr, l_scr, t_scr, *, v_true, mm_dtype=jnp.float32):
    """Grid over vocab blocks j. w_ref block is [VBLOCK, D] (embedding rows).
    Scratch persists across the sequential TPU grid: running max m [N,1],
    running sum-exp l [N,1], target logit t [N,1]."""
    j = pl.program_id(0)
    nv = pl.num_programs(0)
    vb = w_ref.shape[0]
    n = x_ref.shape[0]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        t_scr[:] = jnp.zeros_like(t_scr)

    logits = jax.lax.dot_general(
        x_ref[:].astype(mm_dtype), w_ref[:].astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [N, VB]
    logits = logits + b_ref[0, :].reshape(1, vb)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1) + j * vb
    logits = jnp.where(cols_g < v_true, logits, -1e30)  # mask vocab padding

    tgt = tgt_ref[:, 0].reshape(n, 1)
    local = tgt - j * vb
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1)
    hit = cols == local
    t_scr[:] += jnp.sum(jnp.where(hit, logits, 0.0), axis=1, keepdims=True)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(j == nv - 1)
    def _():
        lse = m_scr[:] + jnp.log(l_scr[:])
        lse_ref[:] = lse
        nll_ref[:] = lse - t_scr[:]


def _fwd_call(x, w, b, targets, vblock, v_true, mm_dtype=jnp.float32):
    n, d = x.shape
    v = w.shape[0]
    grid = (v // vblock,)
    nll, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, v_true=v_true, mm_dtype=mm_dtype),
        grid=grid,
        in_specs=[
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
    )(x, w.reshape(v, d), b.reshape(1, v), targets.reshape(n, 1))
    return nll[:, 0], lse[:, 0]


# ---------------------------------------------------------------------------
# Backward: recompute block logits, form probs, accumulate dx / dW / db
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, w_ref, b_ref, tgt_ref, lse_ref, g_ref,
                dx_ref, dw_ref, db_ref, *, v_true, mm_dtype=jnp.float32):
    j = pl.program_id(0)
    vb = w_ref.shape[0]
    n = x_ref.shape[0]

    @pl.when(j == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    logits = jax.lax.dot_general(
        x_ref[:].astype(mm_dtype), w_ref[:].astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + b_ref[0, :].reshape(1, vb)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1) + j * vb
    logits = jnp.where(cols_g < v_true, logits, -1e30)
    p = jnp.exp(logits - lse_ref[:])

    tgt = tgt_ref[:, 0].reshape(n, 1)
    local = tgt - j * vb
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1)
    onehot = (cols == local).astype(jnp.float32)

    dlogits = (p - onehot) * g_ref[:]                 # [N, VB]
    dlog_mm = dlogits.astype(mm_dtype)
    dx_ref[:] += jnp.dot(dlog_mm, w_ref[:].astype(mm_dtype),
                         preferred_element_type=jnp.float32)
    # dW block (embedding layout [VB, D]) = dlogits^T @ x
    dw_ref[:] = jax.lax.dot_general(
        dlog_mm, x_ref[:].astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] = jnp.sum(dlogits, axis=0, keepdims=True)


def _bwd_call(x, w, b, targets, lse, g, vblock, v_true,
              mm_dtype=jnp.float32):
    n, d = x.shape
    v = w.shape[0]
    grid = (v // vblock,)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, v_true=v_true, mm_dtype=mm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vblock, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vblock), lambda j: (0, j), memory_space=pltpu.VMEM),
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
    )(x, w.reshape(v, d), b.reshape(1, v), targets.reshape(n, 1),
      lse.reshape(n, 1), g.reshape(n, 1))
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
    dx, dw, db = _bwd_call(x, w, b, targets, lse, g, vblock_bwd or vblock,
                           v_true or w.shape[0], mm_dtype)
    return dx, dw, db, None


fused_ce_nll.defvjp(_fwd_rule, _bwd_rule)


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


def fused_masked_cross_entropy(y, w, b, targets, pad_id, v_true=None,
                               vblock=VBLOCK, mm_dtype=jnp.float32,
                               mesh=None, row_cap=0):
    """Masked-mean CE over non-PAD targets via the fused kernel.

    y [B, L, D] hidden states; w [V, D] embedding-layout head weights;
    b [V]; targets [B, L]. Returns (ce_mean, n_tokens) — the exact semantics
    of ops.losses.masked_cross_entropy (torch ignore_index).

    With ``mesh`` (a Mesh with a 'data' axis of size > 1), the kernel runs
    under shard_map: each device computes its batch shard's (sum, count)
    locally — Mosaic custom calls are not GSPMD-partitionable, so this is
    what lets the kernel engage inside a sharded train step — and the
    masked mean is psum'd over 'data' (exactly the single-device value)."""
    if mesh is not None and dict(mesh.shape).get("data", 1) > 1:
        from jax.sharding import PartitionSpec as P

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
