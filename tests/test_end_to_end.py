"""End-to-end trainer test: the full CLI path on a tiny syn-paths config —
train, validate, compression, sampling + verification, checkpointing,
resume (SURVEY §7 minimum end-to-end slice).
"""

import json
import os
import sys

import pytest
import yaml


def _tiny_config(tmp_path, **over):
    cfg = dict(
        model_type="ARK", d_model=32, d_latent=8, n_heads=2, n_layers=2,
        batch_size=32, learning_rate=1e-3, num_epochs=2, beta0=0.1, beta1=1.0,
        dataset="syn-paths", shuffle_train=False, use_padding=False,
        triple_order="keep", permute_triples=True,
        num_generated_latent_graphs=64, sample_frac=0.05, beam_width=2,
        lr_scheduler=True, save_every=2, resume_from_checkpoint=False,
        checkpoint_path="", verify_every=2, experiment_name="e2e_test",
        use_test_for_final_eval=True, compression_log_every=2,
        sample_chunk=64, seed=0,
    )
    cfg.update(over)
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


@pytest.mark.parametrize("model_type", ["ARK", "SAIL"])
def test_train_cli_end_to_end(small_datasets, tmp_path, model_type):
    from ark_tpu.experiments.train import main

    cfg_path = _tiny_config(tmp_path, model_type=model_type)
    ckpt_dir = str(tmp_path / "ckpts")
    final = main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir])

    # final metric surface (reference train.py:171-231)
    assert "final_test/loss" in final
    assert "final_test/compression_bits" in final
    key = ("final_test/latent_validity_rate" if model_type == "SAIL"
           else "final_test/validity_rate")
    assert 0.0 <= final[key] <= 1.0

    # run dir artifacts: effective config + metrics.jsonl + checkpoints
    runs = os.listdir(ckpt_dir)
    assert len(runs) == 1
    run_dir = os.path.join(ckpt_dir, runs[0])
    assert os.path.exists(os.path.join(run_dir, "effective_config.yaml"))
    metrics_file = os.path.join(run_dir, "metrics.jsonl")
    assert os.path.exists(metrics_file)
    logged_keys = set()
    with open(metrics_file) as f:
        for line in f:
            logged_keys.update(json.loads(line).keys())
    expected = {"objective", "epoch", "train/loss", "train/reconstruction_loss",
                "val/loss", "val/reconstruction_loss", "learning_rate",
                "val/compression_bits", "val/compression_kl_bits",
                "val/compression_edge_bits", "val/compression_entity_bits"}
    if model_type == "SAIL":
        expected |= {"train/kl_loss", "val/kl_loss",
                     "verification/latent_validity_rate",
                     "diversity/unique_graphs", "diversity/ratio"}
    else:
        expected |= {"verification/validity_rate",
                     "verification/novelty_rate",
                     "verification/valid_novelty_rate"}
    assert expected <= logged_keys, expected - logged_keys

    best = os.path.join(run_dir, f"syn-paths_{model_type}_best_model.pt")
    assert os.path.exists(best)
    periodic = os.path.join(run_dir,
                            f"syn-paths_{model_type}_checkpoint_epoch_2.pt")
    assert os.path.exists(periodic)

    # checkpoint payload schema (reference train.py:576-585)
    from ark_tpu.utils import load_checkpoint
    ckpt = load_checkpoint(best)
    for k in ["epoch", "model_state_dict", "optimizer_state_dict",
              "scheduler_state_dict", "val_loss", "config", "vocabs",
              "dataset_meta"]:
        assert k in ckpt, k
    assert set(ckpt["vocabs"]) == {"e2i", "i2e", "r2i", "i2r"}
    assert ckpt["dataset_meta"]["dataset"] == "syn-paths"


def test_track_best_validity_checkpoint(small_datasets, tmp_path):
    """Opt-in ``track_best_validity`` saves {dataset}_{model}_best_validity.pt
    at verification epochs (round-3 VERDICT item 7: docs/QUALITY.md shows
    best-val-loss and best-validity diverge by 10-50 points on wd-articles,
    so without this the empirically best model is often not on disk).
    Default OFF = reference behavior (train.py:564-618 saves only best-val
    + periodic)."""
    from ark_tpu.experiments.train import main
    from ark_tpu.utils import load_checkpoint

    # default off: no best_validity file
    cfg_off = _tiny_config(tmp_path, verify_every=1)
    d_off = str(tmp_path / "off")
    main(["--config", cfg_off, "--checkpoint-dir", d_off])
    run_off = os.path.join(d_off, os.listdir(d_off)[0])
    assert not os.path.exists(
        os.path.join(run_off, "syn-paths_ARK_best_validity.pt"))

    cfg = _tiny_config(tmp_path, verify_every=1, track_best_validity=True)
    ckpt_dir = str(tmp_path / "on")
    main(["--config", cfg, "--checkpoint-dir", ckpt_dir])
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    path = os.path.join(run_dir, "syn-paths_ARK_best_validity.pt")
    assert os.path.exists(path)
    ckpt = load_checkpoint(path)
    for k in ["epoch", "model_state_dict", "optimizer_state_dict",
              "val_loss", "config", "vocabs", "dataset_meta"]:
        assert k in ckpt, k
    # the tracked best is carried in extras for resume continuity
    assert ckpt["best_validity"] >= 0.0


def test_resume_from_checkpoint(small_datasets, tmp_path):
    from ark_tpu.experiments.train import main

    cfg_path = _tiny_config(tmp_path, num_epochs=2)
    ckpt_dir = str(tmp_path / "c1")
    main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir])
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    ckpt_path = os.path.join(run_dir, "syn-paths_ARK_checkpoint_epoch_2.pt")

    cfg_path2 = _tiny_config(tmp_path, num_epochs=4,
                             resume_from_checkpoint=True,
                             checkpoint_path=ckpt_path)
    ckpt_dir2 = str(tmp_path / "c2")
    final = main(["--config", cfg_path2, "--checkpoint-dir", ckpt_dir2])
    assert "final_test/loss" in final
    run_dir2 = os.path.join(ckpt_dir2, os.listdir(ckpt_dir2)[0])
    with open(os.path.join(run_dir2, "metrics.jsonl")) as f:
        epochs = [json.loads(l).get("epoch") for l in f]
    epochs = [e for e in epochs if e is not None]
    assert epochs == [3, 4]  # resumed after epoch 2


def test_resume_continues_rng_stream(small_datasets, tmp_path):
    """A 2-epoch run resumed to 4 epochs reproduces the uninterrupted
    4-epoch run's losses exactly — the checkpoint carries the RNG stream
    (permutation augmentation + dropout randomness), best_val_loss and
    best_comp_bits (ADVICE r1)."""
    from ark_tpu.experiments.train import main

    def losses(run_dir):
        out = {}
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            for line in f:
                d = json.loads(line)
                if "epoch" in d:
                    out[d["epoch"]] = (d["train/loss"], d["val/loss"])
        return out

    # constant lr: the cosine schedule's T_max=num_epochs would make the
    # 2-epoch producer's trajectory differ from the 4-epoch reference run
    cfg4 = _tiny_config(tmp_path, num_epochs=4, verify_every=10,
                        compression_log_every=10, lr_scheduler=False)
    d_full = str(tmp_path / "full")
    main(["--config", cfg4, "--checkpoint-dir", d_full])
    full = losses(os.path.join(d_full, os.listdir(d_full)[0]))

    cfg2 = _tiny_config(tmp_path, num_epochs=2, verify_every=10,
                        compression_log_every=10, lr_scheduler=False)
    d_a = str(tmp_path / "a")
    main(["--config", cfg2, "--checkpoint-dir", d_a])
    ckpt = os.path.join(d_a, os.listdir(d_a)[0],
                        "syn-paths_ARK_checkpoint_epoch_2.pt")
    cfg_res = _tiny_config(tmp_path, num_epochs=4, verify_every=10,
                           compression_log_every=10, lr_scheduler=False,
                           resume_from_checkpoint=True, checkpoint_path=ckpt)
    d_b = str(tmp_path / "b")
    main(["--config", cfg_res, "--checkpoint-dir", d_b])
    resumed = losses(os.path.join(d_b, os.listdir(d_b)[0]))

    for epoch in (3, 4):
        assert abs(full[epoch][0] - resumed[epoch][0]) < 1e-5, (
            epoch, full[epoch], resumed[epoch])
        assert abs(full[epoch][1] - resumed[epoch][1]) < 1e-5


def test_checkpoint_loader_refuses_code_execution(tmp_path):
    """load_checkpoint only reconstructs data — a pickle smuggling a callable
    (the os.system gadget) is refused instead of executed (ADVICE r1)."""
    import pickle

    import pytest as _pytest

    from ark_tpu.utils import load_checkpoint

    class Evil:
        def __reduce__(self):
            import os as _os
            return (_os.system, ("echo pwned",))

    p = tmp_path / "evil.pt"
    with open(p, "wb") as f:
        pickle.dump({"model_state_dict": Evil()}, f)
    with _pytest.raises(pickle.UnpicklingError):
        load_checkpoint(str(p))


def test_kgvae_compat_entrypoint(small_datasets, tmp_path):
    import subprocess

    cfg_path = _tiny_config(tmp_path, num_epochs=1, verify_every=5,
                            compression_log_every=5)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from kgvae.experiments.train import main;"
         f"main(['--config', {cfg_path!r}, '--checkpoint-dir', {str(tmp_path / 'kc')!r}])"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Training and evaluation completed!" in out.stdout


def test_train_cli_vocab_sharded_mesh(small_datasets, tmp_path):
    """Full CLI training on an explicit 2-D mesh (mesh_axes + shard_vocab):
    the trainer places params vocab-sharded, the epoch fns / compression /
    sampling all ride the mesh, and the run produces the same artifact
    surface as the single-device path."""
    from ark_tpu.experiments.train import main

    cfg_path = _tiny_config(tmp_path, num_epochs=2,
                            mesh_axes={"data": 2, "model": 2},
                            shard_vocab=True)
    ckpt_dir = str(tmp_path / "ckpts")
    final = main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir])
    assert "final_test/loss" in final
    assert 0.0 <= final["final_test/validity_rate"] <= 1.0
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    assert os.path.exists(
        os.path.join(run_dir, "syn-paths_ARK_best_model.pt"))


def test_train_cli_startup_guards(small_datasets, tmp_path):
    """Fail-at-startup policy (round-4 review findings): a train split
    smaller than one batch would scan ZERO batches and 'train' to NaN;
    a mesh without a 'data' axis would die minutes later inside the
    first-epoch GSPMD compile."""
    from ark_tpu.experiments.train import main

    cfg_path = _tiny_config(tmp_path, batch_size=10 ** 6)
    with pytest.raises(ValueError, match="no full batch"):
        main(["--config", cfg_path, "--checkpoint-dir", str(tmp_path / "a")])
    cfg_path = _tiny_config(tmp_path, mesh_axes={"model": 8})
    with pytest.raises(ValueError, match="'data' axis"):
        main(["--config", cfg_path, "--checkpoint-dir", str(tmp_path / "b")])


def test_resume_from_torch_checkpoint_gets_fresh_optimizer(small_datasets,
                                                           tmp_path):
    """Resuming from a reference-format torch checkpoint (which carries no
    convertible optimizer state, utils/torch_interop.py) must warn and
    re-initialize Adam instead of crashing inside optax at trace time
    (round-4 review finding)."""
    from ark_tpu.experiments.train import main
    from ark_tpu.experiments.export_torch import main as export_main

    cfg_path = _tiny_config(tmp_path, num_epochs=1)
    ckpt_dir = str(tmp_path / "ckpts")
    main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir])
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    src = os.path.join(run_dir, "syn-paths_ARK_best_model.pt")
    torch_pt = str(tmp_path / "reference_format.pt")
    export_main([src, torch_pt])

    cfg_path2 = _tiny_config(tmp_path, num_epochs=2,
                             resume_from_checkpoint=True,
                             checkpoint_path=torch_pt)
    with pytest.warns(UserWarning, match="no optimizer state"):
        final = main(["--config", cfg_path2, "--checkpoint-dir",
                      str(tmp_path / "resumed")])
    assert "final_test/loss" in final


def test_train_cli_mesh_fallback_drops_shard_vocab(small_datasets, tmp_path):
    """batch_size not divisible by the 'data' axis -> the promised
    single-device fallback must also drop shard_vocab, or SamplerBank's
    fail-fast (mesh=None + shard_vocab) turns the fallback into a startup
    crash (round-4 review finding)."""
    from ark_tpu.experiments.train import main

    cfg_path = _tiny_config(tmp_path, num_epochs=1, batch_size=30,
                            mesh_axes={"data": 4, "model": 2},
                            shard_vocab=True)
    ckpt_dir = str(tmp_path / "ckpts")
    with pytest.warns(UserWarning, match="training single-device"):
        final = main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir])
    assert "final_test/loss" in final


def test_sigterm_requests_preemption():
    """The SIGTERM handler flips the preemption event (what Cloud TPU
    sends on preemption/maintenance); no trainer needed."""
    import os
    import signal
    import time

    from ark_tpu.train import loop as L

    L._PREEMPT.clear()
    prev = signal.signal(signal.SIGTERM, L._sigterm_to_preempt)
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(200):  # handler runs at a bytecode boundary
            if L._PREEMPT.is_set():
                break
            time.sleep(0.01)
        assert L._PREEMPT.is_set()
    finally:
        signal.signal(signal.SIGTERM, prev)
        L._PREEMPT.clear()


def test_preemption_checkpoint_resume_bitwise(small_datasets, tmp_path,
                                              monkeypatch):
    """Preemption-safe training: a preempt request mid-run saves
    `{ds}_{model}_preempt.pt` at the epoch boundary and exits cleanly;
    resuming from it reproduces the uninterrupted run EXACTLY (params,
    Adam moments, and rng stream all round-trip)."""
    import os

    from ark_tpu.experiments.train import main
    from ark_tpu.train import loop as L
    from ark_tpu.utils.logging import Run

    # uninterrupted 4-epoch control
    cfg = _tiny_config(tmp_path, num_epochs=4, save_every=10,
                       verify_every=10, compression_log_every=10)
    control = main(["--config", cfg, "--checkpoint-dir",
                    str(tmp_path / "control")])

    # same run, preempted after epoch 2 (the log hook plays the SIGTERM
    # handler's role deterministically)
    orig_log = Run.log

    def log_then_preempt(self, metrics):
        orig_log(self, metrics)
        if metrics.get("epoch") == 2:
            L.request_preemption()

    monkeypatch.setattr(Run, "log", log_then_preempt)
    out = main(["--config", cfg, "--checkpoint-dir",
                str(tmp_path / "preempted")])
    monkeypatch.setattr(Run, "log", orig_log)
    assert out == {"preempted_at_epoch": 2.0}
    run_dir = os.path.join(str(tmp_path / "preempted"),
                           os.listdir(str(tmp_path / "preempted"))[0])
    ckpt = os.path.join(run_dir, "syn-paths_ARK_preempt.pt")
    assert os.path.exists(ckpt)

    # resume -> epochs 3..4 -> final metrics identical to the control
    cfg2 = _tiny_config(tmp_path, num_epochs=4, save_every=10,
                        verify_every=10, compression_log_every=10,
                        resume_from_checkpoint=True, checkpoint_path=ckpt)
    resumed = main(["--config", cfg2, "--checkpoint-dir",
                    str(tmp_path / "resumed")])
    assert resumed["final_test/loss"] == control["final_test/loss"]
    assert (resumed["final_test/compression_bits"]
            == control["final_test/compression_bits"])


def test_async_checkpointing_matches_sync(small_datasets, tmp_path):
    """async_checkpointing moves the state fetch + pickle write to a
    background thread; files, bytes, and metrics must be identical to the
    synchronous path (drained before the trainer returns)."""
    import os
    import pickle

    import numpy as np

    from ark_tpu.experiments.train import main

    cfg_s = _tiny_config(tmp_path, num_epochs=2)
    sync_final = main(["--config", cfg_s, "--checkpoint-dir",
                       str(tmp_path / "sync")])
    cfg_a = _tiny_config(tmp_path, num_epochs=2, async_checkpointing=True)
    async_final = main(["--config", cfg_a, "--checkpoint-dir",
                        str(tmp_path / "async")])
    assert async_final["final_test/loss"] == sync_final["final_test/loss"]

    def best_payload(root):
        run_dir = os.path.join(root, os.listdir(root)[0])
        p = os.path.join(run_dir, "syn-paths_ARK_best_model.pt")
        assert os.path.exists(p)
        assert not [f for f in os.listdir(run_dir) if ".tmp." in f]
        with open(p, "rb") as f:
            return pickle.load(f)

    a = best_payload(str(tmp_path / "async"))
    s = best_payload(str(tmp_path / "sync"))
    assert a["epoch"] == s["epoch"] and a["val_loss"] == s["val_loss"]
    import jax
    for xa, xs in zip(jax.tree.leaves(a["model_state_dict"]),
                      jax.tree.leaves(s["model_state_dict"])):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xs))


def test_async_checkpoint_writer_surfaces_errors(tmp_path):
    """A failed background write (bad directory) is loud at drain(), not
    silent data loss."""
    import pytest

    from ark_tpu.utils.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    w.submit(str(tmp_path / "no_such_dir" / "x.pt"), epoch=1, params={},
             opt_state={}, scheduler_state=None, val_loss=0.0, config={},
             vocabs={}, dataset_meta={})
    with pytest.raises(RuntimeError, match="async checkpoint"):
        w.drain()
    # the writer stays usable after a surfaced failure
    w.submit(str(tmp_path / "ok.pt"), epoch=1, params={}, opt_state={},
             scheduler_state=None, val_loss=0.0, config={}, vocabs={},
             dataset_meta={})
    w.close()
    assert (tmp_path / "ok.pt").exists()


def test_keep_checkpoints_prunes_periodic(small_datasets, tmp_path):
    """keep_checkpoints: N prunes periodic checkpoints beyond the newest N
    (and their shard dirs); best-model checkpoints are never pruned."""
    import glob

    from ark_tpu.experiments.train import main

    cfg_path = _tiny_config(tmp_path, num_epochs=6, save_every=2,
                            verify_every=10, compression_log_every=10,
                            keep_checkpoints=2, checkpoint_sharded=True)
    ckpt_dir = str(tmp_path / "ckpts_keep")
    main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir])
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    periodic = sorted(glob.glob(
        os.path.join(run_dir, "syn-paths_ARK_checkpoint_epoch_*.pt")))
    assert [os.path.basename(p) for p in periodic] == [
        "syn-paths_ARK_checkpoint_epoch_4.pt",
        "syn-paths_ARK_checkpoint_epoch_6.pt"]
    # shard dirs pruned alongside; survivors keep theirs
    assert not os.path.exists(
        os.path.join(run_dir, "syn-paths_ARK_checkpoint_epoch_2.pt.shards"))
    for p in periodic:
        assert os.path.isdir(p + ".shards")
    assert os.path.exists(
        os.path.join(run_dir, "syn-paths_ARK_best_model.pt"))


def test_keep_checkpoints_prunes_under_async_writer(small_datasets,
                                                    tmp_path):
    """Retention with async_checkpointing: prunes run on the writer thread
    AFTER queued saves land, so in-flight files are neither missed nor
    resurrected."""
    import glob

    from ark_tpu.experiments.train import main

    cfg_path = _tiny_config(tmp_path, num_epochs=6, save_every=2,
                            verify_every=10, compression_log_every=10,
                            keep_checkpoints=2, async_checkpointing=True)
    ckpt_dir = str(tmp_path / "ckpts_keep_async")
    main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir])
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    periodic = sorted(glob.glob(
        os.path.join(run_dir, "syn-paths_ARK_checkpoint_epoch_*.pt")))
    assert [os.path.basename(p) for p in periodic] == [
        "syn-paths_ARK_checkpoint_epoch_4.pt",
        "syn-paths_ARK_checkpoint_epoch_6.pt"]
