"""Checkpointing with the reference payload schema (train.py:576-585):

  {epoch, model_state_dict, optimizer_state_dict, scheduler_state_dict,
   val_loss, config, vocabs={e2i,i2e,r2i,i2r}, dataset_meta}

The vocabs embedded in the checkpoint are load-bearing for the conditioned
and interpolation experiments (SURVEY §5). Files keep the reference's ``.pt``
naming (``{dataset}_{model_type}_best_model.pt`` etc., train.py:587-618) but
are plain pickles of numpy pytrees (no torch dependency).

Unlike the reference — whose ``resume_from_checkpoint``/``checkpoint_path``
config keys are dead (SURVEY §5) — ``load_checkpoint`` + the trainer's resume
path make them functional.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def to_device_tree(tree):
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
                        tree)


def save_checkpoint(path: str, *, epoch: int, params, opt_state, scheduler_state,
                    val_loss: float, config: dict, vocabs: dict,
                    dataset_meta: dict, extras: dict | None = None) -> None:
    """``extras`` carries additive keys beyond the reference schema — the
    trainer stores the RNG stream (``rng_state``), ``best_comp_bits`` and
    ``best_val_loss`` so a resumed run's sampling randomness and 'objective'
    logging continue the uninterrupted trajectory."""
    payload = {
        "epoch": epoch,
        "model_state_dict": to_numpy_tree(params),
        "optimizer_state_dict": to_numpy_tree(opt_state),
        "scheduler_state_dict": scheduler_state,
        "val_loss": float(val_loss),
        "config": {k: v for k, v in config.items()},
        "vocabs": vocabs,
        "dataset_meta": dataset_meta,
        "format": "ark_tpu.pickle.v1",
    }
    if extras:
        payload.update(extras)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=4)


# Unpickling arbitrary files executes arbitrary code (torch.load in the
# reference has the same property). The loader below only reconstructs data:
# basic containers, numpy arrays/scalars, and optax's named-tuple optimizer
# states — anything else (os.system, builtins.eval gadgets, ...) is refused.
_SAFE_BUILTINS = {"complex", "set", "frozenset", "bytearray", "range",
                  "slice", "tuple", "list", "dict"}


class _SafeUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "builtins" and name in _SAFE_BUILTINS:
            return super().find_class(module, name)
        if module.split(".")[0] in ("numpy", "optax", "jax"):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint references {module}.{name}, which is not a known "
            f"data type — refusing to unpickle")


def load_checkpoint(path: str) -> dict:
    """Load an ark_tpu checkpoint — or, transparently, a legacy torch ``.pt``
    payload from the reference trainer (conditioned.py:16-25 /
    interpolation.py:140-141 semantics incl. ``module.``-prefix stripping;
    see utils/torch_interop.py). All checkpoint-consuming CLIs therefore
    accept reference checkpoints unchanged."""
    from ark_tpu.utils.torch_interop import (is_torch_checkpoint,
                                             load_torch_checkpoint)

    if is_torch_checkpoint(path):
        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return _SafeUnpickler(f).load()
