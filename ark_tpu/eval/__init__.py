from ark_tpu.eval.verifiers import (
    get_verifier,
    SynPathsVerifier,
    SynTypesVerifier,
    SynTIPRVerifier,
    WDMoviesVerifier,
    WDArticlesVerifier,
)
from ark_tpu.eval.compression import posterior_bits
from ark_tpu.eval.semantic import (
    SemanticEvaluator,
    post_process_data,
    run_semantic_evaluation,
)
__all__ = [
    "get_verifier",
    "SynPathsVerifier",
    "SynTypesVerifier",
    "SynTIPRVerifier",
    "WDMoviesVerifier",
    "WDArticlesVerifier",
    "SemanticEvaluator",
    "post_process_data",
    "run_semantic_evaluation",
    "posterior_bits",
]
