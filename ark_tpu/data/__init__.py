from ark_tpu.data.loader import (
    DatasetDownloader,
    load_data_as_list,
    get_file_paths,
    parse_files_to_subgraphs,
    DATASET_NAMES,
)
from ark_tpu.data.tokenizer import (
    SPECIAL_TOKENS,
    ENT_BASE,
    triples_to_seq,
    seq_to_triples,
    ints_to_labels,
    canonicalize,
    canonical_graph_string,
    VocabLayout,
    build_vocab_layout,
)
from ark_tpu.data.dataset import GraphSeqArrays, encode_graphs, batch_iterator

__all__ = [
    "DatasetDownloader",
    "load_data_as_list",
    "get_file_paths",
    "parse_files_to_subgraphs",
    "DATASET_NAMES",
    "SPECIAL_TOKENS",
    "ENT_BASE",
    "triples_to_seq",
    "seq_to_triples",
    "ints_to_labels",
    "canonicalize",
    "canonical_graph_string",
    "VocabLayout",
    "build_vocab_layout",
    "GraphSeqArrays",
    "encode_graphs",
    "batch_iterator",
]
