from ark_tpu.models.api import Model, build_model

__all__ = ["Model", "build_model"]
