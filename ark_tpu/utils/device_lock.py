"""Cross-process TPU device lock.

Exactly ONE process may hold this environment's TPU at a time (the axon
tunnel serves a single client; a second concurrent job hangs or corrupts
both runs — CLAUDE.md "Environment gotchas"). Every TPU-using entrypoint
(bench.py, the train/evaluate/generate/serve CLIs, the measurement
scripts) therefore takes an advisory ``flock`` on a shared lockfile before
first touching the backend, so queued measurement scripts, interactive
runs, and the driver's round-end bench serialize automatically instead of
colliding — no coordination between their shells required.

The lock is advisory and self-releasing: the kernel drops a flock when the
holder exits (including SIGKILL), so a crashed run can never wedge the
queue. CPU-only runs (tests, dryruns) skip it entirely — the gate is the
jax *priority* platform, read from config without dialing the tunnel.

Knobs: ``ARK_TPU_DEVICE_LOCK=0`` disables; ``ARK_TPU_DEVICE_LOCK_TIMEOUT``
bounds the wait in seconds (default: wait forever, logging every minute);
``ARK_TPU_DEVICE_LOCK_FILE`` moves the lockfile (default
``/tmp/ark_tpu_device.lock``).
"""

from __future__ import annotations

import os
import sys
import time

_DEFAULT_LOCKFILE = "/tmp/ark_tpu_device.lock"
_HELD = []  # keep acquired handles alive for the process lifetime


def tpu_is_priority_platform() -> bool:
    """True if jax would initialize a TPU backend first (i.e. this process
    is about to dial the tunnel). Reads config only — never touches the
    backend. The PRIORITY platform is what matters: this environment boots
    ``jax_platforms='axon,cpu'``, and only a leading 'cpu' keeps jax off
    the tunnel (see __graft_entry__.dryrun_multichip's guard)."""
    try:
        import jax

        plats = jax.config.jax_platforms
    except Exception:
        plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        # unset = jax autodetects and prefers any attached accelerator
        return True
    first = str(plats).split(",")[0].strip().lower()
    return first not in ("cpu",)


def acquire_device_lock(timeout: float | None = None, poll: float = 1.0,
                        tag: str = "") -> bool:
    """Block until this process holds the exclusive TPU lock.

    Returns True once held (kept for the process lifetime), False if
    disabled via env or not applicable (CPU priority platform). Raises
    TimeoutError when a timeout (argument or env) expires first.
    """
    if _HELD:
        # re-entrant: this process already holds the lock (a second flock
        # on a fresh file description would deadlock against ourselves)
        return True
    if os.environ.get("ARK_TPU_DEVICE_LOCK", "1") == "0":
        return False
    if not tpu_is_priority_platform():
        return False
    try:
        import fcntl
    except ImportError:  # non-POSIX: nothing to serialize against
        return False
    if timeout is None:
        env_t = os.environ.get("ARK_TPU_DEVICE_LOCK_TIMEOUT")
        timeout = float(env_t) if env_t else None
    path = os.environ.get("ARK_TPU_DEVICE_LOCK_FILE", _DEFAULT_LOCKFILE)
    f = open(path, "a+")
    t0 = time.monotonic()
    last_note = t0
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            now = time.monotonic()
            if timeout is not None and now - t0 >= timeout:
                f.close()
                raise TimeoutError(
                    f"TPU device lock {path} still held after {timeout:.0f}s")
            if now - last_note >= 60.0:
                print(f"[device-lock{tag and ' ' + tag}] waiting for {path} "
                      f"({now - t0:.0f}s; another TPU job is running)",
                      file=sys.stderr, flush=True)
                last_note = now
            time.sleep(poll)
    try:
        f.seek(0)
        f.truncate()
        f.write(f"pid={os.getpid()} tag={tag} t={time.time():.0f}\n")
        f.flush()
    except OSError:
        pass  # lock content is informational only
    _HELD.append(f)
    return True
