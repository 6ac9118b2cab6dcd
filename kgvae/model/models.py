"""Compatibility surface for the reference's kgvae.model.models
(models.py:144, 368): the SAIL and ARK families are built through the
functional ``build_model`` API; ``SAIL(config)`` / ``ARK(config)`` return
the corresponding ``ark_tpu.models.Model``."""
from ark_tpu.models import Model, build_model
from ark_tpu.models.api import kl_mean, kl_per_graph


def SAIL(config):
    mt = config.get("model_type", "SAIL")
    if mt not in ("SAIL", "t-SAIL"):
        raise NotImplementedError(f"Unknown model_type: {mt}")
    return build_model(config)


def ARK(config):
    mt = config.get("model_type", "ARK")
    if mt not in ("ARK", "t-ARK"):
        raise NotImplementedError(f"Unknown model_type: {mt}")
    return build_model(config)


__all__ = ["Model", "build_model", "SAIL", "ARK", "kl_mean", "kl_per_graph"]
