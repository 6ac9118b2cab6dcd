"""Fixed-shape array dataset + host-side batching.

Replaces the reference's ``GraphSeqDataset`` + torch ``DataLoader``
(kgvae/model/utils.py:112-146, train.py:351-408) with XLA-friendly
materialized arrays:

  - ``triples``  int32 [N, max_edges, 3]  (padded rows = (pad_eid, pad_rid, pad_eid))
  - ``seq``      int32 [N, seq_len]
  - ``n_edges``  int32 [N]

Per-graph triple-permutation augmentation is applied per batch, vectorized,
and only when ``not use_padding and permute`` — replicating the reference's
behavior where ``permute_triples`` is inert for padded (wd-*) datasets
(reference utils.py:133-134; SURVEY quirk Q-5). Non-padded datasets have a
constant edge count per graph (the reference's default torch collate would
otherwise fail), which makes the vectorization exact.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ark_tpu.data.tokenizer import SPECIAL_TOKENS, VocabLayout, canonicalize


@dataclasses.dataclass
class GraphSeqArrays:
    triples: np.ndarray   # int32 [N, max_edges, 3]
    seq: np.ndarray       # int32 [N, seq_len]
    n_edges: np.ndarray   # int32 [N]
    layout: VocabLayout
    permute: bool = False

    def __len__(self):
        return self.seq.shape[0]

    def subset(self, n: int) -> "GraphSeqArrays":
        """First-n prefix (posterior-bits evaluation contract:
        reference models.py:495-497 uses ``Subset(dataset, range(n))``)."""
        return GraphSeqArrays(
            triples=self.triples[:n],
            seq=self.seq[:n],
            n_edges=self.n_edges[:n],
            layout=self.layout,
            permute=False,
        )


def _build_seq(triples: np.ndarray, n_edges: np.ndarray, layout: VocabLayout) -> np.ndarray:
    """Vectorized triples_to_seq over [N, max_edges, 3] int triples."""
    n, k, _ = triples.shape
    seq = np.full((n, layout.seq_len), SPECIAL_TOKENS["PAD"], dtype=np.int32)
    seq[:, 0] = SPECIAL_TOKENS["BOS"]
    body = np.empty((n, k, 3), dtype=np.int32)
    body[:, :, 0] = triples[:, :, 0] + layout.ent_base
    body[:, :, 1] = triples[:, :, 1] + layout.rel_base
    body[:, :, 2] = triples[:, :, 2] + layout.ent_base
    body = body.reshape(n, 3 * k)
    # only first 3*n_edges[i] body tokens are real; rest overwritten below
    seq[:, 1:1 + 3 * k] = body
    eos_pos = 1 + 3 * n_edges
    cols = np.arange(layout.seq_len)[None, :]
    pad_mask = cols > eos_pos[:, None]
    seq[pad_mask] = SPECIAL_TOKENS["PAD"]
    seq[np.arange(n), eos_pos] = SPECIAL_TOKENS["EOS"]
    return seq


def encode_graphs(graphs, layout: VocabLayout, triple_order: str = "keep",
                  i2e=None, i2r=None, permute: bool = False) -> GraphSeqArrays:
    """Materialize a list of int-triple graphs into fixed-shape arrays."""
    graphs = [canonicalize(g, i2e, i2r, triple_order) for g in graphs]
    n = len(graphs)
    k = layout.max_edges
    pad_row = (
        (layout.pad_eid, layout.pad_rid, layout.pad_eid)
        if layout.use_padding else (0, 0, 0)
    )
    triples = np.empty((n, k, 3), dtype=np.int32)
    triples[:] = np.asarray(pad_row, dtype=np.int32)
    n_edges = np.empty((n,), dtype=np.int32)
    for i, g in enumerate(graphs):
        m = len(g)
        if m:
            triples[i, :m] = np.asarray(g, dtype=np.int32)
        n_edges[i] = m
    if not layout.use_padding and not np.all(n_edges == k):
        raise ValueError(
            "Non-padded dataset requires a constant edge count per graph "
            f"(got min={n_edges.min()}, max={n_edges.max()}, expected {k})."
        )
    seq = _build_seq(triples, n_edges, layout)
    return GraphSeqArrays(triples=triples, seq=seq, n_edges=n_edges,
                          layout=layout, permute=permute)


def _permute_batch(triples: np.ndarray, layout: VocabLayout,
                   rng: np.random.Generator):
    """Random per-graph permutation of the (constant-count) triples, with the
    sequence rebuilt from the permuted order (reference utils.py:131-146)."""
    b, k, _ = triples.shape
    order = np.argsort(rng.random((b, k)), axis=1)
    permuted = np.take_along_axis(triples, order[:, :, None], axis=1)
    n_edges = np.full((b,), k, dtype=np.int32)
    return permuted, _build_seq(permuted, n_edges, layout)


def batch_iterator(data: GraphSeqArrays, batch_size: int, shuffle: bool = False,
                   drop_last: bool = False, rng: np.random.Generator | None = None):
    """Yields (triples [B, k, 3], seq [B, L]) int32 numpy batches.

    Matches the reference loaders: train uses shuffle=config['shuffle_train']
    and drop_last=True; val/test use neither (train.py:351-408)."""
    n = len(data)
    idx = np.arange(n)
    if shuffle:
        assert rng is not None, "shuffle requires an rng"
        rng.shuffle(idx)
    do_permute = data.permute and not data.layout.use_padding
    if do_permute:
        assert rng is not None, "permutation augmentation requires an rng"
    stop = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, stop, batch_size):
        take = idx[start:start + batch_size]
        if take.size == 0:
            break
        triples = data.triples[take]
        if do_permute:
            triples, seq = _permute_batch(triples, data.layout, rng)
        else:
            seq = data.seq[take]
        yield triples, seq


def num_batches(data_len: int, batch_size: int, drop_last: bool = False) -> int:
    if drop_last:
        return data_len // batch_size
    return (data_len + batch_size - 1) // batch_size
