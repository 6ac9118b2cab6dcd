"""Subprocess worker for tests/test_multihost.py: one process of a
two-process (multi-host-shaped) training job on the CPU backend.

Invoked with ARK_TPU_COORDINATOR / ARK_TPU_NUM_PROCESSES /
ARK_TPU_PROCESS_ID in the environment — the same launch contract
parallel/multihost.py documents for real pod slices — so the full env
path (initialize_from_env → global mesh → primary-gated side effects)
is what gets exercised, not a test-only shim.

Usage: python tests/_multihost_worker.py <config.yaml> <ckpt_dir> <out.json>
"""

import json
import sys

import jax

# this environment's sitecustomize imports jax with the axon platform
# first; the PRIORITY platform must be cpu or backend init dials the
# TPU tunnel (CLAUDE.md "Environment gotchas")
jax.config.update("jax_platforms", "cpu")


def main():
    cfg_path, ckpt_dir, out_path = sys.argv[1:4]
    import os

    # Asymmetric preemption injection for the regression test: on the
    # named process ONLY, set the process-local preemption flag at the top
    # of the named epoch (lr_for_epoch runs right there, after the
    # trainer's _PREEMPT.clear()). Without the collective any_flag, the
    # other process would march into the next epoch's collectives and the
    # job would deadlock.
    tp = os.environ.get("ARK_TPU_TEST_PREEMPT_PROC")
    if tp is not None and tp == os.environ.get("ARK_TPU_PROCESS_ID"):
        from ark_tpu.train import loop as _loop

        at_epoch = int(os.environ.get("ARK_TPU_TEST_PREEMPT_EPOCH", "1"))
        real_lr = _loop.lr_for_epoch

        def patched(config, epoch):
            if epoch >= at_epoch:
                _loop.request_preemption()
            return real_lr(config, epoch)

        _loop.lr_for_epoch = patched

    if cfg_path.startswith("eval:"):
        # evaluate-CLI mode: "eval:<checkpoint path>" (ckpt_dir unused)
        from ark_tpu.experiments.evaluate import main as eval_main

        final = eval_main(["--checkpoint", cfg_path[len("eval:"):],
                           "--split", "validation", "--num-samples", "32"])
    else:
        from ark_tpu.experiments.train import main as train_main

        final = train_main(["--config", cfg_path,
                            "--checkpoint-dir", ckpt_dir])
    with open(out_path, "w") as f:
        json.dump({k: (float(v) if isinstance(v, (int, float)) else v)
                   for k, v in final.items()}, f)


if __name__ == "__main__":
    main()
