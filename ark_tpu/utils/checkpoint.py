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

import os
import pickle
import queue
import sys
import threading

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
    # atomic: a crash/preemption mid-write can never leave a truncated
    # checkpoint where a good one stood
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


class AsyncCheckpointWriter:
    """Background checkpoint writer (``async_checkpointing: true``).

    ``save_checkpoint``'s dominant cost on a remote-TPU tunnel is the
    device→host fetch (params + Adam moments ≈ 3× the model's bytes, at
    tunnel latency/bandwidth); a single worker thread runs the fetch and
    the pickle write while the main thread dispatches the next epoch's
    device work. Safe because JAX arrays are immutable — the submitted
    state stays valid (and alive on device, bounded to roughly one extra
    state's worth of HBM until fetched).

    Writes are serialized in submission order by the one worker, so
    repeated saves to ``*_best_model.pt`` never interleave, and each
    write is atomic (save_checkpoint's tmp + os.replace). Call
    ``drain()`` before reading checkpoints or exiting; it re-raises the
    first worker failure so a bad disk isn't silent."""

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._err: BaseException | None = None
        self._t = threading.Thread(target=self._work, daemon=True,
                                   name="ark-tpu-ckpt-writer")
        self._t.start()

    def _work(self):
        while True:
            job = self._q.get()
            if job is None:
                self._q.task_done()
                return
            path, kwargs = job
            try:
                save_checkpoint(path, **kwargs)
            except BaseException as e:  # surfaced at drain()
                if self._err is None:
                    self._err = e
                print(f"[ark_tpu] async checkpoint write to {path} "
                      f"failed: {e}", file=sys.stderr, flush=True)
            finally:
                self._q.task_done()

    def submit(self, path: str, **kwargs) -> None:
        self._q.put((path, kwargs))

    def drain(self) -> None:
        """Block until every submitted write hit disk; re-raise the first
        failure."""
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def close(self) -> None:
        self.drain()
        self._q.put(None)
        self._t.join(timeout=60)


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
