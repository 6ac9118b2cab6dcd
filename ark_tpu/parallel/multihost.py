"""Multi-host (multi-process) execution support.

A v5e pod slice beyond 4 chips spans several hosts, each running one
process that owns its local chips; JAX's multi-controller model then makes
``jax.devices()`` global and every jitted program SPMD across hosts, with
collectives riding ICI. The reference has no distributed machinery at all
(SURVEY §2 rows P-1..P-3) — this module is the TPU-native scale-out layer
on top of ``parallel/mesh.py``'s single-controller mesh: the SAME trainer
(`train/loop.py`), step functions, Pallas kernels and samplers run
unmodified; only the host-side edges change (who fetches, who writes, who
logs).

The rules this module encodes (the jax multi-process contract):
  - every process executes the SAME Python control flow (so collectives
    are issued in the same order everywhere);
  - host inputs are fed identically by all processes and placed with
    ``jax.device_put(x, NamedSharding(global_mesh, ...))`` — each process
    contributes its addressable shards (data/loader.py loads the full,
    deterministic dataset on every host, so this holds by construction);
  - values are only pulled to host via :func:`fetch`, which is local for
    fully-replicated/addressable arrays and a *collective* otherwise —
    therefore every process must call it (never gate a fetch on
    ``is_primary``);
  - side effects (checkpoint writes, metric logging, figure dumps) happen
    on the primary process only.

Launch: one process per host with

    ARK_TPU_COORDINATOR=host0:8476 ARK_TPU_NUM_PROCESSES=4 \
    ARK_TPU_PROCESS_ID=$i python -m ark_tpu.experiments.train --config ...

On Cloud TPU pod slices the three variables are optional —
``jax.distributed.initialize()`` auto-detects the slice topology — set
``ARK_TPU_MULTIHOST=1`` to request that. Tested end to end with two CPU
processes x 4 virtual devices (tests/test_multihost.py): identical loss
trajectory to the single-process 8-device mesh, primary-only checkpoint,
bitwise-equal saved params.
"""

from __future__ import annotations

import os

import numpy as np


def initialize_from_env() -> bool:
    """``jax.distributed.initialize`` from ARK_TPU_* env vars (or the Cloud
    TPU auto-detect when just ``ARK_TPU_MULTIHOST=1`` is set). Must run
    before first backend use. Returns True if distributed mode was
    initialized. Safe to call twice (second call is a no-op)."""
    coord = os.environ.get("ARK_TPU_COORDINATOR")
    auto = os.environ.get("ARK_TPU_MULTIHOST")
    if not coord and not auto:
        return False
    import jax

    if _already_initialized():
        return True
    if coord:
        missing = [v for v in ("ARK_TPU_NUM_PROCESSES", "ARK_TPU_PROCESS_ID")
                   if v not in os.environ]
        if missing:
            raise ValueError(
                f"ARK_TPU_COORDINATOR={coord} is set but {missing} "
                "is/are not — a multi-host launch needs all three "
                "(ARK_TPU_COORDINATOR, ARK_TPU_NUM_PROCESSES, "
                "ARK_TPU_PROCESS_ID), or just ARK_TPU_MULTIHOST=1 on "
                "Cloud TPU pod slices")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["ARK_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["ARK_TPU_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    return True


def _already_initialized() -> bool:
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoints, logging,
    figures). Single-process runs are always primary."""
    import jax

    return jax.process_index() == 0


def fetch(x):
    """Host numpy value of ``x`` from every process.

    Local (no communication) for numpy inputs and for jax Arrays that are
    fully addressable (single process) or fully replicated (each host
    already holds a complete copy). For cross-host *sharded* arrays this
    is a COLLECTIVE all-gather — every process must call it, in the same
    order, or the job deadlocks; that is exactly the trainer's structure
    (identical control flow on all hosts)."""
    import jax

    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable or x.is_fully_replicated:
        return np.asarray(x)
    from jax.sharding import NamedSharding

    sh = x.sharding
    if isinstance(sh, NamedSharding):
        # replicate on device (XLA all-gather over ICI), then read the
        # local copy; the jitted identity is cached PER MESH (jit caches
        # key on function identity — a fresh lambda per call would
        # re-trace every fetch)
        return np.asarray(_replicator(sh.mesh)(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


_REPL_CACHE: dict = {}


def _replicator(mesh):
    fn = _REPL_CACHE.get(mesh)
    if fn is None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))
        _REPL_CACHE[mesh] = fn
    return fn


def any_flag(local: bool) -> bool:
    """Collective OR of a host-side boolean (no-op single-process).

    EVERY process must call this at the same point — it is how
    process-local signals (SIGTERM preemption) become a job-wide
    decision without breaking the identical-control-flow contract."""
    import jax

    if jax.process_count() <= 1:
        return bool(local)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1 if local else 0], np.int32))
    return bool(np.asarray(flags).max())


def fetch_tree(tree):
    """:func:`fetch` over a pytree (checkpoint state: params + opt state).
    Collective for any cross-host-sharded leaf — call from the MAIN thread
    on every process (never from a background writer thread, where
    interleaving with training collectives could differ across hosts)."""
    import jax

    return jax.tree.map(fetch, tree)


def broadcast_str(s: str, max_len: int = 128) -> str:
    """Every process returns the PRIMARY's string (no-op single-process).
    Used to agree on host-side identifiers that one process generates —
    the run id (a uuid, or wandb's id, minted on the primary) that names
    the run directory all processes' sharded-checkpoint writes share."""
    import jax

    if jax.process_count() <= 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    b = s.encode()[:max_len]
    buf[: len(b)] = np.frombuffer(b, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode()


def sync(name: str = "ark_tpu") -> None:
    """Barrier across processes (no-op single-process)."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def primary_first(fn, name: str = "primary_first"):
    """Run ``fn`` on the primary process, barrier, then on the others.

    For idempotent host side effects every process needs but only one may
    create — dataset materialization (data/loader.ensure_dataset writes
    files on a filesystem the hosts may share) being the trainer's case:
    the non-primary call then sees the files already in place."""
    if is_primary():
        out = fn()
        sync(name)
        return out
    sync(name)
    return fn()
