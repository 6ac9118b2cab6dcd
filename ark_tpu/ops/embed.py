"""Embedding-lookup dispatch: XLA gather vs the Pallas row-DMA kernels.

``take_rows`` / ``take_triples`` are drop-in equivalents of ``table[ids]``
and the encoders' (h|r|t) embed+concat (reference models.py:34-43); the
``use_pallas`` knob (config key ``use_pallas_embed``) selects the Pallas
schedule from ops/pallas/embed_gather.py:

  False      — XLA gather (default; measured adequate, docs/ROADMAP.md)
  True/"dma" — GCHUNK-rows-per-step async-copy kernel
  "block"    — one-row-per-grid-step scalar-prefetch kernel

Falls back to XLA indexing whenever the kernel's shape constraints
(d % 128 == 0, float32 table) don't hold, so enabling the knob is always
semantics-preserving (the kernels are bit-identical gathers; equivalence
tests in tests/test_embed_gather.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ark_tpu.ops.pallas import embed_gather


def _mode(use_pallas):
    if use_pallas in ("block", "dma"):
        return use_pallas
    return "dma" if use_pallas else None


def take_rows(table, ids, use_pallas=False):
    """table[ids] ([V, D] x int[...] -> [..., D])."""
    mode = _mode(use_pallas)
    if mode is None or not embed_gather.supported(table.shape[1], table.dtype,
                                                  table.shape[0]):
        return table[ids]
    return embed_gather.gather_rows(table, ids, mode)


def take_triples(e_emb, r_emb, triples, use_pallas=False, dtype=jnp.float32):
    """[e_emb[h] | r_emb[r] | e_emb[t]] ([..., 3] -> [..., 3D])."""
    mode = _mode(use_pallas)
    if (mode is None or e_emb.shape[1] != r_emb.shape[1]
            or not embed_gather.supported(e_emb.shape[1], e_emb.dtype,
                                          min(e_emb.shape[0],
                                              r_emb.shape[0]))
            or r_emb.dtype != e_emb.dtype):
        h = e_emb[triples[..., 0]]
        r = r_emb[triples[..., 1]]
        t = e_emb[triples[..., 2]]
        return jnp.concatenate([h, r, t], axis=-1).astype(dtype)
    return embed_gather.embed_triples_fused(e_emb, r_emb, triples,
                                            mode).astype(dtype)
