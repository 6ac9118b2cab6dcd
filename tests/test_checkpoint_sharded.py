"""Sharded checkpoint I/O (utils/checkpoint.save_checkpoint_sharded):
each process writes only its addressable array shards; load_checkpoint
reassembles full arrays with the reference payload schema intact.

Single-process legs here (8 virtual devices, sharded + replicated +
ZeRO-1-style layouts); the cross-host leg — two processes, each writing
its own shard file — runs in tests/test_multihost.py."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ark_tpu.parallel import make_mesh
from ark_tpu.utils.checkpoint import (load_checkpoint, save_checkpoint,
                                      save_checkpoint_sharded)


def _state(mesh):
    """params + optax Adam state with mixed layouts: replicated, 'data'-
    sharded (ZeRO-1-shaped), 2-D sharded, plus scalar count leaves."""
    params = {
        "w": jax.device_put(np.arange(64, dtype=np.float32).reshape(8, 8),
                            NamedSharding(mesh, P("data", None))),
        "emb": jax.device_put(
            np.arange(32 * 4, dtype=np.float32).reshape(32, 4),
            NamedSharding(mesh, P("data", None))),
        "b": jax.device_put(np.arange(8, dtype=np.float32),
                            NamedSharding(mesh, P())),
    }
    opt_state = optax.adam(1e-3).init(
        jax.tree.map(lambda x: np.asarray(x), params))
    return params, opt_state


def _meta():
    return dict(scheduler_state={"last_epoch": 3}, val_loss=1.5,
                config={"model_type": "ARK"}, vocabs={"e2i": {"a": 0}},
                dataset_meta={"dataset": "syn-paths"})


def test_sharded_roundtrip_matches_dense(tmp_path):
    mesh = make_mesh({"data": 8})
    params, opt_state = _state(mesh)
    dense, sharded = str(tmp_path / "d.pt"), str(tmp_path / "s.pt")
    save_checkpoint(dense, epoch=3, params=params, opt_state=opt_state,
                    extras={"best_val_loss": 1.5}, **_meta())
    save_checkpoint_sharded(sharded, epoch=3, params=params,
                            opt_state=opt_state,
                            extras={"best_val_loss": 1.5}, **_meta())
    assert os.path.isdir(sharded + ".shards")
    a, b = load_checkpoint(dense), load_checkpoint(sharded)
    # same payload schema (modulo the format markers)
    assert set(a) - {"format"} <= set(b)
    for k in ("epoch", "val_loss", "config", "vocabs", "dataset_meta",
              "scheduler_state_dict", "best_val_loss"):
        assert a[k] == b[k], k
    for tree_key in ("model_state_dict", "optimizer_state_dict"):
        la = jax.tree_util.tree_leaves(a[tree_key])
        lb = jax.tree_util.tree_leaves(b[tree_key])
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optax structure survives (resume needs the named tuples back)
    assert type(b["optimizer_state_dict"]).__name__ == type(
        a["optimizer_state_dict"]).__name__


def test_sharded_vocab_layout_roundtrip(tmp_path):
    mesh = make_mesh({"data": 4, "model": 2})
    w = np.arange(16 * 8, dtype=np.float32).reshape(16, 8)
    params = {
        "tok_emb": jax.device_put(w, NamedSharding(mesh, P("model", None))),
        "m2d": jax.device_put(w, NamedSharding(mesh, P("model", "data"))),
    }
    path = str(tmp_path / "v.pt")
    save_checkpoint_sharded(path, epoch=1, params=params, opt_state={},
                            **_meta())
    ck = load_checkpoint(path)
    np.testing.assert_array_equal(ck["model_state_dict"]["tok_emb"], w)
    np.testing.assert_array_equal(ck["model_state_dict"]["m2d"], w)


def test_torn_sharded_checkpoint_refused(tmp_path):
    mesh = make_mesh({"data": 8})
    params, opt_state = _state(mesh)
    path = str(tmp_path / "t.pt")
    save_checkpoint_sharded(path, epoch=1, params=params,
                            opt_state=opt_state, **_meta())
    # a shard file from a different save generation smuggled into the
    # published subdirectory: epoch stamps catch it
    save_checkpoint_sharded(str(tmp_path / "other.pt"), epoch=2,
                            params=params, opt_state=opt_state, **_meta())
    (other_sub,) = os.listdir(tmp_path / "other.pt.shards")
    (mine_sub,) = os.listdir(path + ".shards")
    os.replace(str(tmp_path / "other.pt.shards" / other_sub / "proc0.pkl"),
               os.path.join(path + ".shards", mine_sub, "proc0.pkl"))
    with pytest.raises(ValueError, match="torn"):
        load_checkpoint(path)


def test_resave_prunes_old_version_and_old_stays_loadable(tmp_path):
    """A crash mid-save must leave the previous checkpoint loadable: new
    shards land in a fresh e{epoch}/ subdir and only the atomic metadata
    write publishes them; superseded subdirs are pruned afterwards."""
    mesh = make_mesh({"data": 8})
    params, opt_state = _state(mesh)
    path = str(tmp_path / "c.pt")
    save_checkpoint_sharded(path, epoch=1, params=params,
                            opt_state=opt_state, **_meta())
    # simulate the crash window: epoch-2 shards written, no metadata yet
    # (write them by saving elsewhere and copying the subdir in)
    import shutil
    save_checkpoint_sharded(str(tmp_path / "o.pt"), epoch=2, params=params,
                            opt_state=opt_state, **_meta())
    (o_sub,) = os.listdir(tmp_path / "o.pt.shards")
    shutil.copytree(str(tmp_path / "o.pt.shards" / o_sub),
                    os.path.join(path + ".shards", o_sub))
    ck = load_checkpoint(path)  # old version intact
    assert ck["epoch"] == 1
    # completing the save prunes the old subdir and publishes the new one
    save_checkpoint_sharded(path, epoch=2, params=params,
                            opt_state=opt_state, **_meta())
    assert load_checkpoint(path)["epoch"] == 2
    subs = os.listdir(path + ".shards")
    assert len(subs) == 1 and subs[0].startswith("e2-")


def test_trainer_sharded_checkpoint_resume(small_datasets, tmp_path):
    """checkpoint_sharded: true through the trainer — saved files load and
    resume runs from them."""
    import yaml
    from ark_tpu.experiments.train import main as train_main

    cfg = dict(
        model_type="ARK", d_model=32, d_latent=8, n_heads=2, n_layers=2,
        batch_size=32, learning_rate=1e-3, num_epochs=2, beta0=0.1,
        beta1=1.0, dataset="syn-paths", shuffle_train=False,
        use_padding=False, triple_order="keep", permute_triples=True,
        num_generated_latent_graphs=32, sample_frac=0.05, beam_width=2,
        lr_scheduler=False, save_every=2, verify_every=5,
        compression_log_every=5, sample_chunk=32, seed=0,
        experiment_name="shard_ckpt", progress=False,
        checkpoint_sharded=True, shard_opt_state=True,
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    train_main(["--config", str(p), "--checkpoint-dir",
                str(tmp_path / "ck")])
    run_dir = os.path.join(tmp_path, "ck",
                           os.listdir(tmp_path / "ck")[0])
    best = os.path.join(run_dir, "syn-paths_ARK_best_model.pt")
    assert os.path.isdir(best + ".shards")
    ck = load_checkpoint(best)
    assert ck["config"]["model_type"] == "ARK"
    assert ck["optimizer_state_dict"] is not None

    cfg.update(resume_from_checkpoint=True, checkpoint_path=best,
               num_epochs=3)
    p2 = tmp_path / "cfg2.yaml"
    p2.write_text(yaml.safe_dump(cfg))
    final = train_main(["--config", str(p2), "--checkpoint-dir",
                        str(tmp_path / "ck2")])
    assert np.isfinite(final["final_validation/loss"])


def test_resume_across_mesh_geometries(small_datasets, tmp_path):
    """Checkpoints are geometry-portable: a sharded save from the
    {'data': 8} mesh resumes under {'data': 4, 'model': 2} + shard_vocab
    (and the loss trajectory matches continuing on the original
    geometry — the math is placement-independent)."""
    import yaml
    from ark_tpu.experiments.train import main as train_main

    base = dict(
        model_type="ARK", d_model=32, d_latent=8, n_heads=2, n_layers=2,
        batch_size=32, learning_rate=1e-3, num_epochs=2, beta0=0.1,
        beta1=1.0, dataset="syn-paths", shuffle_train=False,
        use_padding=False, triple_order="keep", permute_triples=True,
        num_generated_latent_graphs=32, sample_frac=0.05, beam_width=2,
        lr_scheduler=False, save_every=10, verify_every=10,
        compression_log_every=10, sample_chunk=32, seed=0,
        experiment_name="geo_resume", progress=False,
        checkpoint_sharded=True,
    )

    def run(cfg, tag):
        p = tmp_path / f"{tag}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        d = tmp_path / tag
        final = train_main(["--config", str(p), "--checkpoint-dir", str(d)])
        run_dir = os.path.join(d, os.listdir(d)[0])
        return final, run_dir

    _, rd = run(dict(base), "geo_a")
    best = os.path.join(rd, "syn-paths_ARK_best_model.pt")

    resume = dict(base, resume_from_checkpoint=True, checkpoint_path=best,
                  num_epochs=3)
    fin_same, _ = run(dict(resume), "geo_same")
    fin_cross, _ = run(dict(resume, mesh_axes={"data": 4, "model": 2},
                            shard_vocab=True, shard_opt_state=True),
                       "geo_cross")
    for k, v in fin_same.items():
        if isinstance(v, float) and np.isfinite(v) and "rate" not in k:
            np.testing.assert_allclose(fin_cross[k], v, rtol=2e-3,
                                       atol=2e-4, err_msg=k)
