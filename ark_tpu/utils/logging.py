"""Experiment tracking: W&B when importable, local JSONL otherwise.

The reference logs through wandb exclusively (train.py:261-283; metric-name
surface in SURVEY §5). This Run wrapper preserves the wandb call pattern
(init kwargs, ``.config`` overrides, ``run.id``-named checkpoint dirs,
``log``/``finish``) and degrades to a JSONL file (``metrics.jsonl`` in the
run directory) plus stdout when wandb is unavailable — this environment has
no wandb and no network egress.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class Run:
    def __init__(self, project: str = "submission", name: str | None = None,
                 entity: str | None = None, config: dict | None = None,
                 anonymous: str = "allow", enabled: bool = True):
        """``enabled=False`` (non-primary processes of a multi-host run,
        parallel/multihost.py): no wandb, no file, ``log`` drops records —
        side effects belong to the primary process only."""
        self._wandb = None
        self._file = None
        self._buffer = []
        self._step = 0
        self._enabled = enabled
        self.config = dict(config or {})
        if not enabled:
            import jax

            self.id = f"proc{jax.process_index()}"
            return
        try:
            if os.environ.get("ARK_TPU_DISABLE_WANDB"):
                raise ImportError
            import wandb  # noqa: F401

            kwargs = dict(project=project, config=config, name=name,
                          anonymous=anonymous)
            if entity:
                kwargs["entity"] = entity
            self._wandb = wandb
            self._run = wandb.init(**kwargs)
            self.id = self._run.id
            self.config = dict(wandb.config)
        except Exception:
            self.id = uuid.uuid4().hex[:8]

    def set_dir(self, run_dir: str) -> None:
        """JSONL mode: attach the metrics file once the run dir exists."""
        if not self._enabled:
            return
        if self._wandb is None:
            os.makedirs(run_dir, exist_ok=True)
            self._file = open(os.path.join(run_dir, "metrics.jsonl"), "a")
            for rec in self._buffer:
                self._file.write(json.dumps(rec) + "\n")
            self._buffer.clear()
            self._file.flush()

    def log(self, metrics: dict) -> None:
        if not self._enabled:
            return
        if self._wandb is not None:
            self._wandb.log(metrics)
            return
        rec = {"_step": self._step, "_time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._step += 1
        if self._file is None:
            self._buffer.append(rec)
        else:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        elif self._file is not None:
            self._file.close()
            self._file = None
