"""Pallas TPU kernels: embedding-row gather (the BASELINE.json kernel target
"Pallas kernels for the embedding-gather").

Reference semantics: plain row indexing ``table[ids]`` — the encoder's
(h|r|t) embed+concat (/root/reference/kgvae/model/models.py:34-43, h/r/t
lookups concatenated to 3*d_model) and the decoders' token-embedding lookups
(models.py:116-142, 323-366). On TPU, XLA lowers these to a dynamic-gather;
these kernels express the same gather as explicit row DMAs so the lookup
never materializes intermediate one-hot/iota forms and the DMA schedule is
under our control.

Two schedules, selected by ``mode``:

  - ``"block"``  — one embedding row per grid step. The row id is scalar-
    prefetched into SMEM and consumed by the input BlockSpec's index_map, so
    Pallas's own pipeline double-buffers the row DMAs (and skips the fetch
    entirely when consecutive ids repeat — common for PAD runs).
    INTERPRET-ONLY: the (1, D) input block violates Mosaic's (8, 128)
    block-shape rule (the sublane dim must be a multiple of 8 or the whole
    array axis), and an arbitrary-row gather cannot use 8-row blocks — the
    round-5 hardware A/B errored at lowering. build_model coerces
    'block'/True to 'dma' on TPU (models/api.py).
  - ``"dma"``    — ``GCHUNK`` rows per grid step: the table stays in ANY/HBM
    and the kernel issues one async copy per token into VMEM scratch,
    amortizing per-grid-step overhead over GCHUNK rows (the round-1
    GRU lesson: per-step DMA management dominates at small blocks,
    docs/ROADMAP.md "Negative results"). Mosaic rejects sub-tile HBM
    slices ("Slice shape along dimension 0 must be aligned to tiling (8)",
    the round-5 hardware A/B), so each copy fetches the ALIGNED 8-row
    block containing the id and the kernel selects the row in-register
    with a one-hot contraction — 8x read amplification, but contiguous
    16 KB DMAs that pipeline, vs XLA's latency-bound scattered gather.

Both are bandwidth-bound (no FLOPs); the A/B vs XLA's gather is measured by
scripts/bench_embed_gather.py. Backward is the gather's transpose — a
scatter-add into the table — implemented with XLA's ``.at[ids].add(g)``
(segment-sum): a Pallas scatter would serialize grid steps on write-back
revisits, and the round-2 trace put the whole embedding-grad scatter at
~0.15 ms/step, so there is nothing material to win there.

``embed_triples_fused`` fuses the SAIL encoder's three lookups + concat into
one kernel writing ``[h_emb | r_emb | t_emb]`` rows directly (one dispatch,
no separate concat buffer).

Requires d_model % 128 == 0 (lane alignment; the fused variant writes
lane-slices at offsets 0 / d / 2d) and float32 tables; callers check
``supported()`` and fall back to XLA indexing otherwise. Out-of-range ids
are clamped, matching XLA gather's clip semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GCHUNK = 128  # rows per grid step in "dma" mode


def supported(d, dtype=jnp.float32, v=8):
    del v  # any row count: _pad8 tops sub-tile tables up to one 8-row tile
    return d % 128 == 0 and jnp.dtype(dtype) == jnp.float32


def _clamp(ids, v):
    return jnp.clip(ids.astype(jnp.int32), 0, v - 1)


# ---------------------------------------------------------------------------
# Single-table gather
# ---------------------------------------------------------------------------

def _row_kernel(ids_ref, tbl_ref, out_ref):
    del ids_ref  # consumed by the index_map
    out_ref[...] = tbl_ref[...]


def _gather_block(table, ids):
    n = ids.shape[0]
    _, d = table.shape
    return pl.pallas_call(
        _row_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, d), lambda i, ids: (ids[i], 0))],
            out_specs=pl.BlockSpec((1, d), lambda i, ids: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
    )(ids, table)


def _aligned_base(row, v):
    """Start of the 8-row tile-aligned block containing ``row`` (clamped so
    base + 8 <= v; v >= 8 — _pad8 guarantees it)."""
    return jnp.minimum((row // 8) * 8, v - 8)


def _pad8(table):
    """Top a sub-tile table up to one full 8-row tile (ids are clamped to
    the REAL row count before the kernel, so pad rows are never selected).
    Only tiny tables (e.g. syn-tipr's 5-relation table) pay the copy."""
    v = table.shape[0]
    if v >= 8:
        return table, v
    return jnp.pad(table, ((0, 8 - v), (0, 0))), 8


def _dma_kernel(ids_ref, tbl_ref, idv_ref, out_ref, scr, sems, *, v):
    i = pl.program_id(0)
    g = out_ref.shape[0]

    def copy(k):
        base = _aligned_base(ids_ref[i * g + k], v)
        return pltpu.make_async_copy(tbl_ref.at[pl.ds(base, 8), :],
                                     scr.at[k], sems.at[k])

    jax.lax.fori_loop(0, g, lambda k, c: (copy(k).start(), c)[1], 0)
    jax.lax.fori_loop(0, g, lambda k, c: (copy(k).wait(), c)[1], 0)
    # in-register row select: one-hot over the 8 fetched rows per token
    # (sub-tile HBM slices are illegal; see module docstring). The ids
    # come in TWICE — scalar-prefetch SMEM for the DMA bases above (SMEM
    # allows only scalar loads — the round-5 hardware A/B) and a VMEM
    # block here for the vectorized offset compute.
    rows = idv_ref[...][:, 0]
    off = rows - _aligned_base(rows, v)  # [g] in [0, 8)
    onehot = (off[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (g, 8), 1)).astype(scr.dtype)
    # broadcast-mul + sublane sum, NOT a dot: Mosaic cannot lower the
    # batched [g,8]x[g,8,d] contraction (TPU_DotDimensionNumbersAttr
    # parse error, the round-5 hardware A/B) and the 8-way reduce is
    # VPU work anyway
    out_ref[...] = jnp.sum(onehot[:, :, None] * scr[...], axis=1)


def _gather_dma(table, ids):
    n = ids.shape[0]
    table, v = _pad8(table)
    d = table.shape[1]
    n_pad = ((n + GCHUNK - 1) // GCHUNK) * GCHUNK
    ids_p = jnp.pad(ids, (0, n_pad - n)) if n_pad != n else ids
    out = pl.pallas_call(
        functools.partial(_dma_kernel, v=v),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // GCHUNK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((GCHUNK, 1), lambda i, ids: (i, 0))],
            out_specs=pl.BlockSpec((GCHUNK, d), lambda i, ids: (i, 0)),
            scratch_shapes=[pltpu.VMEM((GCHUNK, 8, d), table.dtype),
                            pltpu.SemaphoreType.DMA((GCHUNK,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), table.dtype),
    )(ids_p, table, ids_p[:, None])
    return out[:n] if n_pad != n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table, ids, mode="block"):
    """``table[ids]`` as a Pallas row-DMA gather.

    table [V, D] f32, ids int (any shape, clamped to [0, V-1]) ->
    [*ids.shape, D]. Differentiable wrt table (scatter-add transpose)."""
    return _gather_fwd(table, ids, mode)[0]


def _gather_fwd(table, ids, mode):
    v, d = table.shape
    flat = _clamp(ids.reshape(-1), v)
    fn = _gather_dma if mode == "dma" else _gather_block
    out = fn(table, flat).reshape(*ids.shape, d)
    return out, (flat, ids.shape, v)


def _gather_bwd(mode, res, g):
    flat, ids_shape, v = res
    d = g.shape[-1]
    dtable = jnp.zeros((v, d), g.dtype).at[flat].add(g.reshape(-1, d))
    return dtable, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)


# ---------------------------------------------------------------------------
# Fused (h|r|t) triple embedding for the SAIL encoders
# ---------------------------------------------------------------------------

def _triple_kernel(h_ref, r_ref, t_ref, e1_ref, re_ref, e2_ref, out_ref):
    del h_ref, r_ref, t_ref  # consumed by the index_maps
    d = e1_ref.shape[1]
    out_ref[0, :d] = e1_ref[0, :]
    out_ref[0, d:2 * d] = re_ref[0, :]
    out_ref[0, 2 * d:] = e2_ref[0, :]


def _triples_block(e_emb, r_emb, h, r, t):
    n = h.shape[0]
    d = e_emb.shape[1]
    return pl.pallas_call(
        _triple_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, d), lambda i, h, r, t: (h[i], 0)),
                pl.BlockSpec((1, d), lambda i, h, r, t: (r[i], 0)),
                pl.BlockSpec((1, d), lambda i, h, r, t: (t[i], 0)),
            ],
            out_specs=pl.BlockSpec((1, 3 * d), lambda i, h, r, t: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, 3 * d), e_emb.dtype),
    )(h, r, t, e_emb, r_emb, e_emb)


def _triple_dma_kernel(h_ref, r_ref, t_ref, e_ref, re_ref, hrt_ref, out_ref,
                       scr, sems, *, ne, nr):
    i = pl.program_id(0)
    g = out_ref.shape[0]
    d = e_ref.shape[1]

    def copies(k):
        j = i * g + k
        return (
            pltpu.make_async_copy(
                e_ref.at[pl.ds(_aligned_base(h_ref[j], ne), 8), :],
                scr.at[0, k], sems.at[0, k]),
            pltpu.make_async_copy(
                re_ref.at[pl.ds(_aligned_base(r_ref[j], nr), 8), :],
                scr.at[1, k], sems.at[1, k]),
            pltpu.make_async_copy(
                e_ref.at[pl.ds(_aligned_base(t_ref[j], ne), 8), :],
                scr.at[2, k], sems.at[2, k]),
        )

    def start(k, c):
        for dma in copies(k):
            dma.start()
        return c

    def wait(k, c):
        for dma in copies(k):
            dma.wait()
        return c

    jax.lax.fori_loop(0, g, start, 0)
    jax.lax.fori_loop(0, g, wait, 0)

    def select(slot, v):
        # ids arrive twice: SMEM scalars for the DMA bases, a VMEM
        # [g, 3] block here for the vectorized offset compute
        rows = hrt_ref[...][:, slot]
        off = rows - _aligned_base(rows, v)
        onehot = (off[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (g, 8), 1)).astype(scr.dtype)
        # mul + sublane sum (see _dma_kernel: Mosaic rejects the
        # batched dot form)
        return jnp.sum(onehot[:, :, None] * scr[slot], axis=1)

    out_ref[:, 0:d] = select(0, ne)
    out_ref[:, d:2 * d] = select(1, nr)
    out_ref[:, 2 * d:3 * d] = select(2, ne)


def _triples_dma(e_emb, r_emb, h, r, t):
    n = h.shape[0]
    e_emb, ne = _pad8(e_emb)
    r_emb, nr = _pad8(r_emb)
    d = e_emb.shape[1]
    n_pad = ((n + GCHUNK - 1) // GCHUNK) * GCHUNK
    if n_pad != n:
        pad = (0, n_pad - n)
        h, r, t = (jnp.pad(a, pad) for a in (h, r, t))
    out = pl.pallas_call(
        functools.partial(_triple_dma_kernel, ne=ne, nr=nr),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pad // GCHUNK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((GCHUNK, 3), lambda i, h, r, t: (i, 0))],
            out_specs=pl.BlockSpec((GCHUNK, 3 * d), lambda i, h, r, t: (i, 0)),
            scratch_shapes=[pltpu.VMEM((3, GCHUNK, 8, d), e_emb.dtype),
                            pltpu.SemaphoreType.DMA((3, GCHUNK))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3 * d), e_emb.dtype),
    )(h, r, t, e_emb, r_emb, jnp.stack([h, r, t], axis=-1))
    return out[:n] if n_pad != n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def embed_triples_fused(e_emb, r_emb, triples, mode="block"):
    """[e_emb[h] | r_emb[r] | e_emb[t]] in one kernel.

    e_emb [Ne, D] f32, r_emb [Nr, D] f32, triples [..., 3] int ->
    [..., 3*D]. Matches jnp.concatenate([e_emb[h], r_emb[r], e_emb[t]], -1)
    (encoders._embed_triples); differentiable wrt both tables."""
    return _triples_fwd(e_emb, r_emb, triples, mode)[0]


def _triples_fwd(e_emb, r_emb, triples, mode):
    ne, d = e_emb.shape
    nr = r_emb.shape[0]
    lead = triples.shape[:-1]
    flat = triples.reshape(-1, 3)
    h = _clamp(flat[:, 0], ne)
    r = _clamp(flat[:, 1], nr)
    t = _clamp(flat[:, 2], ne)
    fn = _triples_dma if mode == "dma" else _triples_block
    out = fn(e_emb, r_emb, h, r, t).reshape(*lead, 3 * d)
    return out, (h, r, t, ne, nr)


def _triples_bwd(mode, res, g):
    h, r, t, ne, nr = res
    d = g.shape[-1] // 3
    gf = g.reshape(-1, 3 * d)
    de = (jnp.zeros((ne, d), g.dtype).at[h].add(gf[:, :d])
          .at[t].add(gf[:, 2 * d:]))
    dr = jnp.zeros((nr, d), g.dtype).at[r].add(gf[:, d:2 * d])
    return de, dr, None


embed_triples_fused.defvjp(_triples_fwd, _triples_bwd)
