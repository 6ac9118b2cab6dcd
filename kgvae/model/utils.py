"""Compatibility re-exports of the reference's kgvae.model.utils surface
(tokenization + dataset helpers; reference utils.py:66-146)."""
from ark_tpu.data.tokenizer import (
    canonical_graph_string,
    canonicalize,
    ints_to_labels,
    seq_to_triples,
    triples_to_seq,
)
from ark_tpu.data.dataset import GraphSeqArrays as GraphSeqDataset
from ark_tpu.data.dataset import encode_graphs, batch_iterator

__all__ = [
    "canonical_graph_string", "canonicalize", "ints_to_labels",
    "seq_to_triples", "triples_to_seq", "GraphSeqDataset",
    "encode_graphs", "batch_iterator",
]
