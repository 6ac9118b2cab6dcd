"""Training CLI — the reference public entry point
(``python -m kgvae.experiments.train --config configs/<name>.yaml``,
reference train.py:241-247; README.md:42). ``python -m
ark_tpu.experiments.train`` is the native spelling; the ``kgvae`` package
forwards here.

Unlike the reference's train.py (ARK/t-ARK only, train.py:441-444), this
trainer supports all four model types (the ablation trainer's superset
behavior — SURVEY quirk Q-6 resolved in favor of one trainer).
"""

from __future__ import annotations

import argparse
import os

from ark_tpu.train.loop import run_training
from ark_tpu.utils import Run, apply_overrides, dump_effective_config, load_config


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to config file")
    parser.add_argument("--wandb-project", type=str, default="submission",
                        help="Weights & Biases project name")
    parser.add_argument("--wandb-entity", type=str, default=None,
                        help="Weights & Biases entity")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints",
                        help="Directory to save checkpoints")
    return parser


def _enable_compilation_cache():
    """Persistent XLA compilation cache: big-vocab epoch-scan compiles take
    minutes through this environment's remote-TPU tunnel; caching makes
    repeat runs start in seconds. Opt out with ARK_TPU_NO_COMPILE_CACHE=1."""
    if os.environ.get("ARK_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   os.path.expanduser("~/.cache/ark_tpu_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        print(f"[ark_tpu] compilation cache unavailable: {e}")


def main(argv=None):
    _enable_compilation_cache()
    args = build_parser().parse_args(argv)
    config = load_config(args.config)
    # multi-host launch (one process per pod-slice host): ARK_TPU_COORDINATOR
    # / _NUM_PROCESSES / _PROCESS_ID env vars, or ARK_TPU_MULTIHOST=1 for the
    # Cloud TPU auto-detect. Must precede first backend use — after it,
    # jax.devices() is global and the auto-mesh spans all hosts.
    from ark_tpu.parallel import multihost as mh
    mh.initialize_from_env()
    # one TPU job at a time (no-op on the cpu platform: tests/dryruns):
    # queued measurement runs, interactive jobs, and the driver's bench
    # serialize on an advisory flock instead of colliding on the tunnel.
    # After argparse/config so --help and a bad --config fail fast instead
    # of blocking behind a multi-hour lock holder.
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="train")
    entity = args.wandb_entity or os.getenv("WANDB_ENTITY")
    # non-primary processes of a multi-host run own no side effects: their
    # Run drops records, writes no files, starts no wandb session. Sweep
    # overrides (which only the primary's wandb session could receive) are
    # therefore incompatible with multi-host — configs must be complete.
    run = Run(project=args.wandb_project,
              name=config.get("experiment_name", "ARK_experiment"),
              entity=entity, config=config, anonymous="allow",
              enabled=mh.is_primary())
    # sweep support: overrides flow back from the tracker config
    config = apply_overrides(config, run.config)
    config["learning_rate"] = float(config.get("learning_rate", 1e-3))
    if mh.process_count() > 1:
        # overrides reach only the primary's wandb session; a diverging
        # effective config would give the hosts different collective
        # schedules (silent deadlock) — fail fast instead
        import hashlib
        import json

        digest = hashlib.sha256(json.dumps(
            config, sort_keys=True, default=str).encode()).hexdigest()
        # collective decision: the primary's digest trivially matches its
        # own broadcast, so the raise must be job-wide (any_flag) or the
        # primary would sail past into the next collective and hang there
        if mh.any_flag(digest != mh.broadcast_str(digest)):
            raise ValueError(
                "effective config differs across processes (wandb sweep "
                "overrides are primary-only) — multi-host runs need a "
                "complete config file, not sweep-injected values")

    # all processes of a multi-host run share the primary's run dir
    # (sharded checkpoints write per-process files into it)
    run.id = mh.broadcast_str(run.id)
    run_dir = os.path.join(args.checkpoint_dir, run.id)
    if mh.is_primary():
        os.makedirs(run_dir, exist_ok=True)
        run.set_dir(run_dir)
        dump_effective_config(config, run_dir)

    final_metrics = run_training(config, run_dir, run)
    run.finish()
    print("\nTraining and evaluation completed!")
    return final_metrics


if __name__ == "__main__":
    main()
