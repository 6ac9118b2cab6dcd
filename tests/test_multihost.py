"""Multi-host (multi-process) execution: two CPU processes x 4 virtual
devices run the FULL training CLI over one global 8-device mesh
(parallel/multihost.py) and must agree with each other exactly and with
the single-process 8-device mesh run numerically.

This is the scale-out contract for pod slices (>4 chips on v5e spans
hosts): same trainer, same step functions, same kernels — only the
host-side edges change (primary-gated checkpoints/logging, collective
fetches). The reference has no distributed machinery at all (SURVEY §2
rows P-1..P-3); this layer is the TPU-native addition on top of the
GSPMD mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(cfg_path, tmp_path, small_datasets, tag, extra_env=None):
    """Launch the two-process job; return (finals, run_dir)."""
    port = _free_port()
    base_env = dict(
        os.environ,
        # PREPEND the repo (replacing PYTHONPATH would drop this
        # environment's .axon_site and unregister the TPU plugin)
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        ARK_TPU_DISABLE_WANDB="1",
        ARK_TPU_NO_COMPILE_CACHE="1",
        ARK_TPU_DATA_DIR=str(small_datasets),
        ARK_TPU_COORDINATOR=f"localhost:{port}",
        ARK_TPU_NUM_PROCESSES="2",
        **(extra_env or {}),
    )
    mh_dir = tmp_path / f"{tag}_ckpts"
    procs, outs, logs = [], [], []
    for i in range(2):
        out = tmp_path / f"{tag}_final_p{i}.json"
        outs.append(out)
        env = dict(base_env, ARK_TPU_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, cfg_path, str(mh_dir), str(out)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(stdout)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-4000:]}"
    finals = [json.loads(out.read_text()) for out in outs]
    run_dirs = os.listdir(mh_dir)
    assert len(run_dirs) == 1, run_dirs
    return finals, mh_dir / run_dirs[0]


def _config(tmp_path):
    # small but complete: exercises the epoch scan, eval, posterior_bits
    # (sharded per-row bits -> collective fetch), sampling + verification
    # (sharded token fetch), ZeRO-1 moments (cross-host-sharded checkpoint
    # state -> collective fetch_tree), and best/periodic checkpoint writes
    cfg = dict(
        model_type="ARK", d_model=32, d_latent=8, n_heads=2, n_layers=2,
        batch_size=32, learning_rate=1e-3, num_epochs=2, beta0=0.1,
        beta1=1.0, dataset="syn-paths", shuffle_train=False,
        use_padding=False, triple_order="keep", permute_triples=True,
        num_generated_latent_graphs=64, sample_frac=0.05, beam_width=2,
        lr_scheduler=True, save_every=2, resume_from_checkpoint=False,
        checkpoint_path="", verify_every=2, experiment_name="mh_test",
        use_test_for_final_eval=True, compression_log_every=2,
        sample_chunk=64, seed=0, shard_opt_state=True,
        handle_preemption=False, progress=False,
    )
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p), cfg


def test_two_process_training_matches_single_process(small_datasets,
                                                     tmp_path):
    cfg_path, cfg = _config(tmp_path)
    finals, run_dir = _run_pair(cfg_path, tmp_path, small_datasets, "mh")

    # every process executes the same program: results agree EXACTLY
    assert finals[0].keys() == finals[1].keys()
    for k in finals[0]:
        assert finals[0][k] == finals[1][k], (k, finals[0][k], finals[1][k])

    # side effects are primary-only: exactly one run dir, holding the
    # effective config, metrics.jsonl and the checkpoints
    assert (run_dir / "effective_config.yaml").exists()
    assert (run_dir / "metrics.jsonl").exists()
    best = run_dir / "syn-paths_ARK_best_model.pt"
    assert best.exists()

    # same numbers as the single-process 8-device mesh (this pytest
    # process, via conftest): identical HLO, different all-reduce
    # implementation (cross-process Gloo vs in-process), so compare with
    # a float tolerance rather than bitwise
    from ark_tpu.experiments.train import main as train_main

    sp_dir = tmp_path / "sp_ckpts"
    sp_final = train_main(["--config", cfg_path,
                           "--checkpoint-dir", str(sp_dir)])
    for k, v in sp_final.items():
        if "validity" in k or "novelty" in k:
            # token-level argmax/top-p boundaries may flip on ~1e-7 logit
            # differences; rates over 64 graphs move in 1/64 steps
            assert abs(finals[0][k] - float(v)) <= 0.1, (k, finals[0][k], v)
        else:
            np.testing.assert_allclose(finals[0][k], float(v), rtol=2e-3,
                                       atol=2e-4, err_msg=k)

    # checkpoint state round-trips: the collective fetch_tree assembled
    # full (unsharded) arrays equal to the single-process save
    from ark_tpu.utils import load_checkpoint

    mh_ckpt = load_checkpoint(str(best))
    sp_run = os.listdir(sp_dir)[0]
    sp_ckpt = load_checkpoint(
        os.path.join(sp_dir, sp_run, "syn-paths_ARK_best_model.pt"))
    assert mh_ckpt["epoch"] == sp_ckpt["epoch"]
    import jax

    flat_mh = jax.tree_util.tree_leaves(mh_ckpt["model_state_dict"])
    flat_sp = jax.tree_util.tree_leaves(sp_ckpt["model_state_dict"])
    assert len(flat_mh) == len(flat_sp)
    for a, b in zip(flat_mh, flat_sp):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
    # ZeRO-1 moments were cross-host sharded; the saved optimizer state
    # must still be complete, full-shape arrays
    flat_opt = jax.tree_util.tree_leaves(mh_ckpt["optimizer_state_dict"])
    flat_opt_sp = jax.tree_util.tree_leaves(sp_ckpt["optimizer_state_dict"])
    assert len(flat_opt) == len(flat_opt_sp)
    for a, b in zip(flat_opt, flat_opt_sp):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_two_process_vocab_sharded_geometry(small_datasets, tmp_path):
    """The north-star geometry ({'data': 4, 'model': 2}, BASELINE.json)
    with the 'model' axis spanning both processes: vocab-sharded
    embedding/head, sharded-logits CE, sharded generation scan and
    mesh-aware posterior_bits all run cross-host; the checkpoint's
    collective fetch reassembles the vocab-sharded leaves."""
    p = tmp_path / "config_tp.yaml"
    _, cfg = _config(tmp_path)
    cfg.update(mesh_axes={"data": 4, "model": 2}, shard_vocab=True,
               num_epochs=1, verify_every=1, compression_log_every=1,
               save_every=1, checkpoint_sharded=True)
    p.write_text(yaml.safe_dump(cfg))
    finals, run_dir = _run_pair(str(p), tmp_path, small_datasets, "tp")

    assert finals[0].keys() == finals[1].keys()
    for k in finals[0]:
        assert finals[0][k] == finals[1][k], (k, finals[0][k], finals[1][k])
    assert np.isfinite(finals[0]["final_test/loss"])
    assert np.isfinite(finals[0]["final_test/compression_bits"])

    # sharded checkpoint I/O across hosts: each process wrote its own
    # shard file, and loading reassembles full-shape vocab-sharded params
    from ark_tpu.utils import load_checkpoint

    best = run_dir / "syn-paths_ARK_best_model.pt"
    shard_root = best.parent / (best.name + ".shards")
    (sub,) = os.listdir(shard_root)  # one live version after pruning
    assert sorted(os.listdir(shard_root / sub)) == ["proc0.pkl",
                                                    "proc1.pkl"]
    ckpt = load_checkpoint(str(best))
    eff = ckpt["config"]  # carries the derived keys (vocab_size etc.)
    params = ckpt["model_state_dict"]
    v_padded = eff["vocab_size"] + (-eff["vocab_size"]) % eff[
        "vocab_pad_multiple"]
    assert params["tok_emb"].shape[0] == v_padded


def test_preemption_on_one_process_stops_the_whole_job(small_datasets,
                                                       tmp_path):
    """SIGTERM-style preemption hits ONE host; the collective any_flag in
    the epoch boundary must turn it into a job-wide stop. Without it,
    the preempted process would checkpoint and exit while the other
    entered the next epoch's collectives — a slice-wide deadlock (this
    test would time out)."""
    p = tmp_path / "config_pre.yaml"
    _, cfg = _config(tmp_path)
    cfg.update(num_epochs=4, verify_every=10, compression_log_every=10,
               save_every=10, handle_preemption=True)
    p.write_text(yaml.safe_dump(cfg))
    finals, run_dir = _run_pair(
        str(p), tmp_path, small_datasets, "pre",
        extra_env={"ARK_TPU_TEST_PREEMPT_PROC": "1",
                   "ARK_TPU_TEST_PREEMPT_EPOCH": "1"})
    # both processes agreed to stop at the same boundary (epoch 2 = the
    # first boundary after the flag set at the top of epoch index 1)
    assert finals[0] == finals[1]
    assert finals[0]["preempted_at_epoch"] == 2.0
    assert (run_dir / "syn-paths_ARK_preempt.pt").exists()


def test_two_process_evaluate_cli(small_datasets, tmp_path):
    """The evaluate CLI over a two-process global mesh: loss/compression/
    sampling agree exactly across processes, JSON printed by the primary
    only."""
    p = tmp_path / "config_ev.yaml"
    _, cfg = _config(tmp_path)
    cfg.update(num_epochs=1, verify_every=5, compression_log_every=5,
               save_every=5)
    p.write_text(yaml.safe_dump(cfg))
    finals, run_dir = _run_pair(str(p), tmp_path, small_datasets, "evtrain")
    best = run_dir / "syn-paths_ARK_best_model.pt"
    assert best.exists()

    evals, _ = _run_pair(f"eval:{best}", tmp_path, small_datasets, "evtrain")
    assert evals[0] == evals[1]
    assert np.isfinite(evals[0]["final_validation/loss"])
    assert np.isfinite(evals[0]["final_validation/compression_bits"])
