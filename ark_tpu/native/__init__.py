from ark_tpu.native.engine import (
    native_available,
    verify_graphs_native,
    graph_hashes_native,
    NativeSemanticEvaluator,
)

__all__ = [
    "native_available",
    "verify_graphs_native",
    "graph_hashes_native",
    "NativeSemanticEvaluator",
]
