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


class _LeafSpec:
    """Placeholder for a sharded-out array inside a sharded checkpoint's
    metadata pickle: keeps the pytree structure (dicts / optax named
    tuples) intact while the bytes live in the per-process shard files."""

    def __init__(self, shape, dtype):
        self.shape = tuple(int(s) for s in shape)
        self.dtype = str(dtype)


def save_checkpoint_sharded(path: str, *, epoch: int, params, opt_state,
                            scheduler_state, val_loss: float, config: dict,
                            vocabs: dict, dataset_meta: dict,
                            extras: dict | None = None) -> None:
    """Multi-host sharded save (``checkpoint_sharded: true``): EVERY process
    calls this; each writes only its locally-addressable array shards
    (``{path}.shards/proc{k}.pkl``), then the primary writes the ``.pt``
    metadata with the same reference payload schema — array leaves replaced
    by :class:`_LeafSpec` placeholders. No cross-host all-gather, no full
    state through host 0: per host the save moves 1/n_hosts of the bytes,
    which is the point at pod scale (params + Adam moments ≈ 3x model
    size). ``load_checkpoint`` reassembles transparently.

    Synchronous by design: the inter-process barrier between shard writes
    and the metadata write is a collective and must run on the main thread
    in program order (async_checkpointing is ignored for sharded saves —
    the local-shard fetch it would overlap is already 1/n the cost).

    Replicated leaves are written once (by whichever process owns the
    replica-0 shard). Crash safety matches the dense path's atomic
    os.replace: shards land in a FRESH per-save subdirectory
    (``.shards/e{epoch}-{nonce}/`` — the nonce makes re-saves of the same
    (path, epoch) from different training trajectories distinct, so a
    crash mid-resave can never mix shard sets) and the metadata — written
    last, atomically — is what flips the checkpoint to the new version;
    a crash mid-save leaves the previous version fully loadable;
    superseded subdirectories are pruned after the metadata lands. Every
    file also carries the epoch and the loader refuses mismatches
    (defense in depth).

    Requires a filesystem all hosts share (NFS / GCS-fuse on pod
    slices); the primary verifies every process's shard file is visible
    before publishing metadata and fails fast otherwise."""
    import uuid

    import jax
    from ark_tpu.parallel import multihost as mh

    shard_root = f"{path}.shards"
    # all processes must agree on the fresh subdir name: primary mints it
    subdir = mh.broadcast_str(f"e{int(epoch)}-{uuid.uuid4().hex[:8]}")
    shard_dir = os.path.join(shard_root, subdir)
    mh.primary_first(lambda: os.makedirs(shard_dir, exist_ok=True),
                     "ckpt_shard_dir")

    def local_shards(tree):
        specs, shards = {}, {}
        def visit(p, x):
            key = jax.tree_util.keystr(p)
            if isinstance(x, jax.Array):
                specs[key] = _LeafSpec(x.shape, x.dtype)
                shards[key] = [
                    (tuple((s.start, s.stop) for s, dim
                           in zip(_norm_index(sh.index, x.shape), x.shape)),
                     np.asarray(sh.data))
                    for sh in x.addressable_shards if sh.replica_id == 0]
                return specs[key]
            return np.asarray(x)  # host-side leaf: inline into metadata
        spec_tree = jax.tree_util.tree_map_with_path(visit, tree)
        return spec_tree, shards

    params_spec, params_shards = local_shards(params)
    opt_spec, opt_shards = local_shards(opt_state)
    pid = jax.process_index()
    shard_payload = {"epoch": int(epoch),
                     "model_state_dict": params_shards,
                     "optimizer_state_dict": opt_shards}
    tmp = os.path.join(shard_dir, f"proc{pid}.pkl.tmp.{os.getpid()}")
    with open(tmp, "wb") as f:
        pickle.dump(shard_payload, f, protocol=4)
    os.replace(tmp, os.path.join(shard_dir, f"proc{pid}.pkl"))
    mh.sync("ckpt_shards_written")  # all shards on disk before metadata
    if not mh.is_primary():
        return
    n_procs = int(jax.process_count())
    missing = [i for i in range(n_procs)
               if not os.path.exists(os.path.join(shard_dir, f"proc{i}.pkl"))]
    if missing:
        raise RuntimeError(
            f"sharded checkpoint save to {path}: shard files from "
            f"processes {missing} are not visible to the primary — "
            "checkpoint_sharded requires a filesystem all hosts share "
            "(NFS / GCS-fuse); use the default gathered save otherwise")
    payload = {
        "epoch": int(epoch),
        "model_state_dict": params_spec,
        "optimizer_state_dict": opt_spec,
        "scheduler_state_dict": scheduler_state,
        "val_loss": float(val_loss),
        "config": {k: v for k, v in config.items()},
        "vocabs": vocabs,
        "dataset_meta": dataset_meta,
        "format": "ark_tpu.sharded.v1",
        "shard_dir": os.path.join(os.path.basename(shard_root), subdir),
        "n_shard_files": n_procs,
    }
    if extras:
        payload.update(extras)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)
    # the metadata now points at this save's subdir; prune superseded
    # versions (dirs) and any stray files
    import shutil

    for d in os.listdir(shard_root):
        if d == subdir:
            continue
        stale = os.path.join(shard_root, d)
        if os.path.isdir(stale):
            shutil.rmtree(stale, ignore_errors=True)
        else:
            try:
                os.remove(stale)
            except OSError:
                pass


def _norm_index(index, shape):
    """A shard's ``index`` is a tuple of slices into the global array;
    normalize Nones to concrete bounds."""
    out = []
    for sl, dim in zip(index, shape):
        out.append(slice(sl.start or 0,
                         dim if sl.stop is None else sl.stop))
    return tuple(out)


def _assemble_sharded(payload: dict, path: str) -> dict:
    """Reassemble full numpy arrays from the per-process shard files."""
    import jax

    shard_dir = os.path.join(os.path.dirname(os.path.abspath(path)),
                             payload["shard_dir"])
    filled: dict[str, np.ndarray] = {}
    covered: dict[str, int] = {}
    specs: dict[str, _LeafSpec] = {}
    for tree_key in ("model_state_dict", "optimizer_state_dict"):
        def collect(p, x, tree_key=tree_key):
            if isinstance(x, _LeafSpec):
                specs[tree_key + jax.tree_util.keystr(p)] = x
            return x
        jax.tree_util.tree_map_with_path(
            collect, payload[tree_key],
            is_leaf=lambda x: isinstance(x, _LeafSpec))
    for k, spec in specs.items():
        filled[k] = np.zeros(spec.shape, spec.dtype)
        covered[k] = 0
    for i in range(int(payload["n_shard_files"])):
        fp = os.path.join(shard_dir, f"proc{i}.pkl")
        with open(fp, "rb") as f:
            part = _SafeUnpickler(f).load()
        if int(part["epoch"]) != int(payload["epoch"]):
            raise ValueError(
                f"sharded checkpoint {path} is torn: metadata epoch "
                f"{payload['epoch']} but {fp} holds epoch {part['epoch']}")
        for tree_key in ("model_state_dict", "optimizer_state_dict"):
            for key, pieces in part[tree_key].items():
                full_key = tree_key + key
                if full_key not in filled:
                    continue
                for bounds, data in pieces:
                    idx = tuple(slice(b[0], b[1]) for b in bounds)
                    filled[full_key][idx] = data
                    covered[full_key] += data.size
    short = [k for k, n in covered.items()
             if n < int(np.prod(specs[k].shape))]
    if short:
        raise ValueError(f"sharded checkpoint {path} is missing regions "
                         f"for: {short[:5]}")

    def materialize(tree_key, tree):
        def fill(p, x):
            if isinstance(x, _LeafSpec):
                return filled[tree_key + jax.tree_util.keystr(p)]
            return x
        return jax.tree_util.tree_map_with_path(
            fill, tree, is_leaf=lambda x: isinstance(x, _LeafSpec))

    out = dict(payload)
    out["model_state_dict"] = materialize("model_state_dict",
                                          payload["model_state_dict"])
    out["optimizer_state_dict"] = materialize(
        "optimizer_state_dict", payload["optimizer_state_dict"])
    return out


class AsyncCheckpointWriter:
    """Background checkpoint writer (``async_checkpointing: true``).

    ``save_checkpoint``'s dominant cost on a remote-TPU tunnel is the
    device→host fetch (params + Adam moments ≈ 3× the model's bytes, at
    tunnel latency/bandwidth); a single worker thread runs the fetch and
    the pickle write while the main thread dispatches the next epoch's
    device work. The CALLER must submit buffers that no later computation
    donates — the trainer snapshots device copies first (jnp.copy per
    leaf), because its train step donates the live state and a donated
    buffer dies under the fetch ("Array has been deleted"). The copies
    cost roughly one extra state's worth of HBM until fetched.

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
            try:
                if callable(job):
                    job()  # e.g. a retention prune, ordered after writes
                else:
                    path, kwargs = job
                    save_checkpoint(path, **kwargs)
            except BaseException as e:  # surfaced at drain()
                if self._err is None:
                    self._err = e
                what = "task" if callable(job) else f"write to {job[0]}"
                print(f"[ark_tpu] async checkpoint {what} failed: {e}",
                      file=sys.stderr, flush=True)
            finally:
                self._q.task_done()

    def submit(self, path: str, **kwargs) -> None:
        self._q.put((path, kwargs))

    def submit_task(self, fn) -> None:
        """Run ``fn`` on the writer thread AFTER every previously submitted
        write has landed (queue order) — e.g. pruning old checkpoints,
        which must see the just-written files on disk."""
        self._q.put(fn)

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
        if module == __name__ and name == "_LeafSpec":
            # sharded-checkpoint metadata placeholder (pure data)
            return _LeafSpec
        # ml_dtypes supplies numpy's bfloat16 scalar type — present in any
        # checkpoint saved under the TPU bf16 first-moment default
        if module.split(".")[0] in ("numpy", "optax", "jax", "ml_dtypes"):
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
        payload = _SafeUnpickler(f).load()
    if payload.get("format") == "ark_tpu.sharded.v1":
        # multi-host sharded save: reassemble the full arrays from the
        # per-process shard files (save_checkpoint_sharded)
        payload = _assemble_sharded(payload, path)
    return payload
