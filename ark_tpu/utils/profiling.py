"""Profiling / tracing hooks (SURVEY §5: the reference has none — only tqdm
bars; the TPU build adds jax.profiler traces + per-step timing).

Enable by setting ``profile_dir`` in the experiment config (or
ARK_TPU_PROFILE_DIR in the environment): the trainer wraps each epoch in a
``jax.profiler`` trace the first ``profile_epochs`` epochs and logs
wall-clock per phase. View with TensorBoard or xprof.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def maybe_trace(config: dict, epoch: int):
    profile_dir = config.get("profile_dir") or os.environ.get(
        "ARK_TPU_PROFILE_DIR")
    n = int(config.get("profile_epochs", 2))
    if not profile_dir or epoch >= n:
        yield
        return
    import jax

    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield


class PhaseTimer:
    """Accumulates wall-clock per named phase; logged as timing/<phase>_s."""

    def __init__(self):
        self.totals = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def metrics(self, reset=True):
        out = {f"timing/{k}_s": round(v, 4) for k, v in self.totals.items()}
        if reset:
            self.totals = {}
        return out
