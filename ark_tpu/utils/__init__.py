from ark_tpu.utils.config import load_config, apply_overrides, dump_effective_config
from ark_tpu.utils.logging import Run
from ark_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, to_numpy_tree

__all__ = [
    "load_config",
    "apply_overrides",
    "dump_effective_config",
    "Run",
    "save_checkpoint",
    "load_checkpoint",
    "to_numpy_tree",
]
