"""Compatibility re-exports of the reference's kgvae.model.verification
surface (verification.py:7-16, 124-137)."""
from ark_tpu.eval import get_verifier, run_semantic_evaluation
from ark_tpu.eval.verifiers import (
    SynPathsVerifier,
    SynTIPRVerifier,
    SynTypesVerifier,
    WDArticlesVerifier,
    WDMoviesVerifier,
)

__all__ = [
    "get_verifier", "run_semantic_evaluation", "SynPathsVerifier",
    "SynTIPRVerifier", "SynTypesVerifier", "WDArticlesVerifier",
    "WDMoviesVerifier",
]
