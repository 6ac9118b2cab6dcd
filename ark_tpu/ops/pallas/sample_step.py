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
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        bg_scr[:] = jnp.full_like(bg_scr, NEG)
        bi_scr[:] = jnp.zeros_like(bi_scr)
        bl_scr[:] = jnp.full_like(bl_scr, NEG)

    logits = _block_logits(y_ref, w_ref, b_ref, inv_temp, j, v_true)

    # flash log-sum-exp
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new

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
        lse_ref[:] = m_scr[:] + jnp.log(l_scr[:])
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

    masses = pl.pallas_call(
        functools.partial(_pass_b_kernel, v_true=v_true, k_cands=k_cands,
                          inv_temp=inv_temp),
        grid=grid,
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
    return idx, masses


def fused_top_p_sample(y, w, b, seed, top_p, *, v_true=None, temperature=1.0,
                       k_cands=4, max_rounds=4, vblock=None):
    """One fused sampling step: y [B, D] f32 hidden states, w [V, D]
    embedding-layout head, b [V], seed int32 scalar -> token [B] int32
    drawn from the renormalized top-p nucleus of softmax(logits/T).

    Each round draws ``k_cands`` iid candidates and accepts the first
    in-nucleus one; rows with no acceptance retry with a fresh seed
    (P(retry) = (1-top_p)^k_cands per row). After ``max_rounds`` the last
    candidate is kept — P <= (1-top_p)^(k_cands*max_rounds) ~ 1e-16 at the
    defaults, the same residual-bias budget as the XLA rejection path."""
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
                               vblock=vblock)
            for s in range(0, n, ROWCHUNK)
        ]
        return jnp.concatenate(toks)

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
