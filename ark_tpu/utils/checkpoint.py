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
                    dataset_meta: dict) -> None:
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
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=4)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
