"""Conditioned-generation and latent-interpolation experiment tests, driven
from a tiny trained wd-movies SAIL checkpoint.
"""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def wd_movies_sail_ckpt(small_datasets, tmp_path_factory):
    from ark_tpu.experiments.train import main

    tmp = tmp_path_factory.mktemp("wdm")
    cfg = dict(
        model_type="SAIL", d_model=16, d_latent=8, n_heads=2, n_layers=2,
        batch_size=32, learning_rate=1e-3, num_epochs=1, beta0=0.1, beta1=1.0,
        dataset="wd-movies", shuffle_train=False, use_padding=True,
        triple_order="keep", permute_triples=False,
        num_generated_latent_graphs=32, sample_frac=0.05, beam_width=2,
        lr_scheduler=True, save_every=5, resume_from_checkpoint=False,
        checkpoint_path="", verify_every=5, experiment_name="wdm_test",
        use_test_for_final_eval=False, compression_log_every=5,
        sample_chunk=32, seed=0,
    )
    cfg_path = tmp / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    ckpt_dir = str(tmp / "ckpts")
    main(["--config", str(cfg_path), "--checkpoint-dir", ckpt_dir])
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    return str(cfg_path), run_dir


def test_conditioned_generation(wd_movies_sail_ckpt, capsys):
    from ark_tpu.experiments.conditioned import main

    cfg_path, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    assert os.path.exists(ckpt)
    main(["--config", cfg_path, "--checkpoints", ckpt, "--num-samples", "3",
          "--seed", "1"])
    out = capsys.readouterr().out
    assert "===" in out

    # forcing semantics: the first triple's relation/tail are pinned
    from ark_tpu.experiments.conditioned import (
        build_from_checkpoint, conditional_generate, ids_for_condition,
        load_run_checkpoint, _layout_from_config)

    config, state, vocabs = load_run_checkpoint(ckpt)
    model, params, cfg, kind = build_from_checkpoint(config, state)
    rid, oid = ids_for_condition(vocabs, cfg, "has_director", "Tim Burton")
    layout = _layout_from_config(cfg)
    seqs = np.asarray(conditional_generate(model, kind, cfg, layout, params,
                                           rid, oid, 4, seed=0))
    assert (seqs[:, 2] == rid).all()
    assert (seqs[:, 3] == oid).all()


def test_interpolation_probes(wd_movies_sail_ckpt):
    from ark_tpu.experiments.interpolation import (
        LatentDecoder,
        jaccard,
        latent_flip_rate,
        latent_smoothness_score,
        load_model,
        smoothness_line_check,
    )

    cfg_path, run_dir = wd_movies_sail_ckpt
    model, params, config, path, vocabs, meta, layout = load_model(
        run_dir, "wd-movies", "SAIL")
    dec = LatentDecoder(model, params, layout)
    i2e, i2r = vocabs["i2e"], vocabs["i2r"]

    assert jaccard(set(), set()) == 1.0
    assert jaccard({1}, set()) == 0.0
    assert jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)

    local, glob = smoothness_line_check(dec, i2e, i2r, steps=2, epsilon=0.05,
                                        beam=2)
    assert 0.0 <= local <= 1.0 and 0.0 <= glob <= 1.0
    al, ag = latent_smoothness_score(dec, steps=2, epsilon=0.05, n_anchors=1,
                                     n_dirs=1, beam=1)
    assert 0.0 <= al <= 1.0 and 0.0 <= ag <= 1.0
    fr, basin = latent_flip_rate(dec, steps=3, epsilon=0.05, n_anchors=1,
                                 n_dirs=1, beam=1)
    assert 0.0 <= fr <= 1.0 and basin >= 1.0


def test_interpolation_figures(wd_movies_sail_ckpt, tmp_path):
    from ark_tpu.experiments.interpolation import (
        load_model,
        qualitative_latent_analysis_wd_movies,
    )

    cfg_path, run_dir = wd_movies_sail_ckpt
    model, params, config, path, vocabs, meta, layout = load_model(
        run_dir, "wd-movies", "SAIL")
    out_dir = str(tmp_path / "figures")
    qualitative_latent_analysis_wd_movies(model, params, layout, vocabs,
                                          output_dir=out_dir, n_samples=60)
    made = set(os.listdir(out_dir))
    assert "latent_tsne_movies.pdf" in made
    assert "latent_tsne_movies_top10.pdf" in made
    # interpolation figures require a disjoint genre pair; should exist on 60
    assert "latent_interpolation.pdf" in made
    assert "interpolation_sequence.pdf" in made


def test_evaluate_cli(wd_movies_sail_ckpt, capsys):
    from ark_tpu.experiments.evaluate import main

    cfg_path, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    out = main(["--checkpoint", ckpt, "--num-samples", "32"])
    assert "final_validation/compression_bits" in out
    assert 0.0 <= out["final_validation/latent_validity_rate"] <= 1.0
    assert out["diversity/unique_graphs"] >= 1
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    import json as _json
    assert _json.loads(printed)["checkpoint"] == ckpt


def test_eval_row_cap_ignores_inherited_value():
    """The fused-CE row cap is PER-SHARD: a checkpoint's stored
    ce_row_cap_eval (from the training shard count) must be recomputed for
    the evaluating process's mesh, never reused (round-4 review finding —
    a 2-shard cap evaluated single-device trips the kernel's inf-guard)."""
    from ark_tpu.experiments.evaluate import eval_row_cap
    from ark_tpu.ops.losses import compute_ce_row_cap

    class _Layout:
        special_tokens = {"PAD": 0}
        vocab_size = 59392

    seq = np.array([[1, 2, 0, 0], [1, 2, 3, 0],
                    [1, 0, 0, 0], [2, 3, 0, 0]] * 4, np.int32)
    w = np.ones((16,), np.float32)
    cfg = {"batch_size": 8, "ce_row_cap_eval": 1}  # poisoned inherited cap
    got = eval_row_cap(cfg, _Layout, seq, w, None)
    want = compute_ce_row_cap(seq, 0, 8, row_weights=w, n_shards=1)
    assert got == want
    assert got != 1


def test_inspect_checkpoint_cli(wd_movies_sail_ckpt, capsys):
    from ark_tpu.utils.inspect_checkpoint import main

    cfg_path, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    main([ckpt, "--params"])
    out = capsys.readouterr().out
    assert "ark_tpu.pickle.v1" in out
    assert "dataset:  wd-movies" in out
    assert "parameters" in out


def test_generate_cli(tmp_path, wd_movies_sail_ckpt):
    """Standalone serving CLI: checkpoint in, labeled graphs out, no
    dataset dependency (vocabs come from the checkpoint)."""
    import os
    from ark_tpu.experiments.generate import generate_graphs, main

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    graphs = generate_graphs(str(ckpt), num_samples=7, batch=4, seed=3)
    assert len(graphs) == 7
    for g in graphs:
        for h, r, t in g:
            assert isinstance(h, str) and isinstance(r, str)

    out = tmp_path / "graphs.jsonl"
    main(["--checkpoint", str(ckpt), "--num-samples", "5", "--batch", "4",
          "--format", "jsonl", "--output", str(out)])
    import json
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 5

    out2 = tmp_path / "graphs.tsv"
    main(["--checkpoint", str(ckpt), "--num-samples", "3", "--batch", "4",
          "--greedy", "--format", "tsv", "--output", str(out2)])
    body = open(out2).read()
    # 3 graph records = 3 trailing separators (graphs may be empty at this
    # tiny model's quality — the separator structure is the contract)
    assert body.count("\n") >= 3


def test_generate_cli_sharded_serving(wd_movies_sail_ckpt):
    """Multi-device serving in the generate CLI: the batch shards over the
    8-device virtual mesh ('auto' default — the plain test above already
    rides it) and --shard-vocab additionally splits the embedding/head over
    a 2-way 'model' axis. Same contract either way: labeled graphs out."""
    import os
    from ark_tpu.experiments.generate import generate_graphs

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    graphs = generate_graphs(str(ckpt), num_samples=9, batch=8, seed=3,
                             shard_vocab=True)
    assert len(graphs) == 9
    for g in graphs:
        for h, r, t in g:
            assert isinstance(h, str) and isinstance(r, str)
    # mesh=off still serves (single-device path)
    graphs_off = generate_graphs(str(ckpt), num_samples=4, batch=4, seed=3,
                                 mesh="off")
    assert len(graphs_off) == 4
    # --shard-vocab without a mesh (mesh=off, or one attached device) must
    # degrade to single-device serving, not crash on SamplerBank's
    # fail-fast check (round-4 review finding)
    graphs_sv = generate_graphs(str(ckpt), num_samples=4, batch=4, seed=3,
                                mesh="off", shard_vocab=True)
    assert len(graphs_sv) == 4


def _syn_paths_lm_ckpt(tmp_path):
    """Build a tiny syn-paths ARK checkpoint (fresh-init params) for the
    greedy-LM serving tests; returns its path. Needs the small_datasets
    fixture active in the calling test."""
    import jax
    from ark_tpu.models import build_model
    from ark_tpu.train.loop import DataBundle, derive_config
    from ark_tpu.utils.checkpoint import save_checkpoint

    cfg = dict(model_type="ARK", d_model=16, d_latent=8, n_heads=2,
               n_layers=1, batch_size=8, dataset="syn-paths",
               use_padding=False, dec_dropout=0.0)
    bundle = DataBundle(cfg)
    cfg = derive_config(cfg, bundle)
    model = build_model(cfg)
    params = model.init(jax.random.key(0))
    path = str(tmp_path / "syn-paths_ARK_best_model.pt")
    save_checkpoint(path, epoch=0, params=params, opt_state={},
                    scheduler_state={}, val_loss=1.0, config=cfg,
                    vocabs={"e2i": bundle.e2i, "i2e": bundle.i2e,
                            "r2i": bundle.r2i, "i2r": bundle.i2r},
                    dataset_meta={"dataset": "syn-paths"})
    return path


def test_generate_cli_greedy_lm_sharded(small_datasets, tmp_path):
    """The greedy LM serving path rides the serving mesh (round-4
    continuation): greedy decode over the 8-device mesh must produce the
    SAME graphs as mesh=off — argmax decode is deterministic, and GSPMD
    partitions the computation without changing it."""
    from ark_tpu.experiments.generate import generate_graphs

    path = _syn_paths_lm_ckpt(tmp_path)
    mesh_graphs = generate_graphs(path, num_samples=8, batch=8, greedy=True,
                                  seed=5)
    off_graphs = generate_graphs(path, num_samples=8, batch=8, greedy=True,
                                 seed=5, mesh="off")
    assert mesh_graphs == off_graphs
    assert len(mesh_graphs) == 8


# ---------------------------------------------------------------------------
# Serving daemon (ark_tpu.experiments.serve)
# ---------------------------------------------------------------------------

def _serve_session(ckpt, **kw):
    from ark_tpu.experiments.serve import ServeSession
    return ServeSession(str(ckpt), **kw)


def _run_serve(session, lines, depth=2, coalesce=True):
    import io as _io
    import json as _json
    from ark_tpu.experiments.serve import serve_loop

    inp = _io.StringIO("".join(l + "\n" for l in lines))
    out = _io.StringIO()
    serve_loop(inp, out, session, depth=depth, coalesce=coalesce)
    return [_json.loads(l) for l in out.getvalue().splitlines()]


def test_serve_daemon_matches_generate(wd_movies_sail_ckpt):
    """A request with an explicit seed returns exactly the graphs the
    generate CLI returns for --seed/--num-samples (same SamplerBank rng
    stream), and the daemon survives bad lines between good ones."""
    import json as _json
    import os
    from ark_tpu.experiments.generate import generate_graphs

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    want = generate_graphs(ckpt, num_samples=7, batch=4, seed=3)

    session = _serve_session(ckpt, batch=4)
    resps = _run_serve(session, [
        '{"cmd": "ping"}',
        'not json at all',
        '{"id": "a", "n": 7, "seed": 3}',
        '{"id": "b", "n": 0}',
        '{"cmd": "stats"}',
        '{"cmd": "shutdown"}',
        '{"id": "never", "n": 1}',
    ])
    assert resps[0] == {"ok": True}
    assert resps[1]["ok"] is False and "bad json" in resps[1]["error"]
    got = [[tuple(t) for t in g] for g in resps[2]["graphs"]]
    assert got == [[tuple(t) for t in g] for g in want]
    assert resps[2]["id"] == "a" and resps[2]["n"] == 7
    assert resps[3] == {"ok": False, "id": "b",
                        "error": "'n' must be a positive integer"}
    assert resps[4]["requests"] == 1 and resps[4]["graphs"] == 7
    assert resps[5]["shutdown"] is True
    assert len(resps) == 6  # nothing served after shutdown


def test_serve_pipelining_and_formats(wd_movies_sail_ckpt):
    """Pipeline depth changes scheduling, not results; formats and
    --verify behave as documented."""
    import os

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    lines = ['{"id": %d, "n": 5, "seed": %d}' % (i, i) for i in range(4)]

    def strip(resps):
        return [{k: v for k, v in r.items() if k not in ("ms", "host_ms")}
                for r in resps]

    serial = strip(_run_serve(_serve_session(ckpt, batch=4), lines, depth=1))
    piped = strip(_run_serve(_serve_session(ckpt, batch=4), lines, depth=3))
    assert serial == piped
    assert [r["id"] for r in piped] == [0, 1, 2, 3]

    # ints format + verify: int triples, validity fraction attached
    resps = _run_serve(
        _serve_session(ckpt, batch=4, fmt="ints", verify=True),
        ['{"n": 6, "seed": 1}'])
    (r,) = resps
    assert len(r["graphs"]) == 6
    for g in r["graphs"]:
        for h, rel, t in g:
            assert isinstance(h, int) and isinstance(rel, int)
    assert 0.0 <= r["valid_rate"] <= 1.0 and r["n_valid"] <= 6

    # format 'none' omits graphs entirely (latency probing)
    (r,) = _run_serve(_serve_session(ckpt, batch=4, fmt="none"),
                      ['{"n": 3, "seed": 1}'])
    assert "graphs" not in r and r["n"] == 3

    # seedless requests ride the daemon stream: same --seed, same draws
    # (this near-untrained SAIL decodes every z to an empty graph, so
    # distinctness is asserted on the stream advancing, not on outputs)
    import jax

    sess_a = _serve_session(ckpt, batch=4, seed=9)
    key0 = np.array(jax.random.key_data(sess_a._rng))
    a = strip(_run_serve(sess_a, ['{"n": 4}', '{"n": 4}']))
    b = strip(_run_serve(_serve_session(ckpt, batch=4, seed=9),
                         ['{"n": 4}', '{"n": 4}']))
    assert a == b
    assert not np.array_equal(np.array(jax.random.key_data(sess_a._rng)),
                              key0)


def test_serve_coalescing(wd_movies_sail_ckpt):
    """Dynamic batching: buffered small seedless requests share one device
    chunk (marked `coalesced`), responses stay per-request and in order,
    accounting counts every request, and seeded requests / commands are
    never merged."""
    import os

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")

    # 3 seedless requests totalling 6 <= batch 8 -> ONE coalesced record
    lines = ['{"id": 0, "n": 2}', '{"id": 1, "n": 2}', '{"id": 2, "n": 2}',
             '{"cmd": "stats"}']
    resps = _run_serve(_serve_session(ckpt, batch=8), lines)
    assert [r.get("id") for r in resps[:3]] == [0, 1, 2]
    assert all(r["coalesced"] == 3 and r["n"] == 2 and len(r["graphs"]) == 2
               for r in resps[:3])
    assert resps[3]["requests"] == 3 and resps[3]["graphs"] == 6

    # a seeded request in the middle is a barrier: it keeps its bitwise
    # contract (same graphs as a solo seeded run) and is never merged
    mixed = ['{"id": 0, "n": 2}', '{"id": 1, "n": 3, "seed": 7}',
             '{"id": 2, "n": 2}']
    resps = _run_serve(_serve_session(ckpt, batch=8), mixed)
    assert "coalesced" not in resps[1]
    (solo,) = _run_serve(_serve_session(ckpt, batch=8),
                         ['{"id": 9, "n": 3, "seed": 7}'])
    assert resps[1]["graphs"] == solo["graphs"]

    # totals above one chunk don't merge; --no-coalesce disables entirely
    resps = _run_serve(_serve_session(ckpt, batch=4),
                       ['{"id": 0, "n": 4}', '{"id": 1, "n": 4}'])
    assert all("coalesced" not in r for r in resps)
    resps = _run_serve(_serve_session(ckpt, batch=8),
                       ['{"id": 0, "n": 2}', '{"id": 1, "n": 2}'],
                       coalesce=False)
    assert all("coalesced" not in r for r in resps)

    # an invalid request inside a burst errors alone, neighbors still merge
    resps = _run_serve(_serve_session(ckpt, batch=8),
                       ['{"id": 0, "n": 2}', '{"id": 1, "n": 0}',
                        '{"id": 2, "n": 2}'])
    assert [r.get("id") for r in resps] == [0, 1, 2]
    assert resps[1]["ok"] is False and "positive" in resps[1]["error"]
    assert "graphs" in resps[0] and "graphs" in resps[2]


def test_serve_survives_finish_failure(wd_movies_sail_ckpt, monkeypatch):
    """A fetch/decode exception inside finish() emits an error line for
    that request and the daemon keeps serving (review hardening: finish
    is guarded like dispatch)."""
    import os
    from ark_tpu.experiments.serve import ServeSession

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    session = _serve_session(ckpt, batch=4)

    real_finish = ServeSession.finish
    calls = {"n": 0}

    def flaky_finish(self, rec):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("decode exploded")
        return real_finish(self, rec)

    monkeypatch.setattr(ServeSession, "finish", flaky_finish)
    resps = _run_serve(session, ['{"id": 1, "n": 4, "seed": 0}',
                                 '{"id": 2, "n": 4, "seed": 0}'])
    assert resps[0]["ok"] is False and resps[0]["id"] == 1
    assert "decode exploded" in resps[0]["error"]
    assert resps[1]["id"] == 2 and "graphs" in resps[1]


def test_serve_rejects_labels_without_vocabs(wd_movies_sail_ckpt, tmp_path):
    """--format labels / --verify need i2e/i2r: fail loudly at startup,
    not on the first request (review hardening)."""
    import os
    import pytest
    from ark_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    payload = load_checkpoint(ckpt)
    bad = str(tmp_path / "novocab.pt")
    save_checkpoint(bad, epoch=payload["epoch"],
                    params=payload["model_state_dict"],
                    opt_state={}, scheduler_state={},
                    val_loss=payload.get("val_loss", 1.0),
                    config=payload["config"], vocabs={},
                    dataset_meta=payload.get("dataset_meta", {}))
    with pytest.raises(ValueError, match="i2e"):
        _serve_session(bad)
    # ints/none formats stay serveable without vocabs
    (r,) = _run_serve(_serve_session(bad, fmt="none", batch=4),
                      ['{"n": 3, "seed": 1}'])
    assert r["n"] == 3


def test_serve_greedy_lm_cli(small_datasets, tmp_path, capsys):
    """Greedy LM serving through the full CLI (main): deterministic argmax
    decode, warmup accounting reset, stdout carries only protocol lines."""
    import json as _json
    from ark_tpu.experiments.serve import main

    ckpt = _syn_paths_lm_ckpt(tmp_path)
    req_file = tmp_path / "reqs.jsonl"
    req_file.write_text('{"id": 1, "n": 6, "seed": 5}\n'
                        '{"id": 2, "n": 6, "seed": 5}\n'
                        '{"cmd": "stats"}\n')
    out_file = tmp_path / "resp.jsonl"
    main(["--checkpoint", ckpt, "--greedy", "--batch", "8",
          "--warmup", "6", "--input", str(req_file),
          "--output", str(out_file)])
    resps = [_json.loads(l) for l in out_file.read_text().splitlines()]
    assert len(resps) == 3
    # greedy is deterministic: identical seeds, identical graphs
    assert resps[0]["graphs"] == resps[1]["graphs"]
    # warmup reset the counters: exactly the two real requests counted
    assert resps[2]["requests"] == 2 and resps[2]["graphs"] == 12
    err = capsys.readouterr().err
    assert "[serve] ready" in err and "warmed n=6" in err


def test_serve_trace_command(wd_movies_sail_ckpt, tmp_path):
    """{"cmd": "trace", "n": K}: a jax.profiler capture wraps the next K
    data requests and writes a viewable trace; request/response contract
    is unchanged."""
    import json as _json
    import os

    _, run_dir = wd_movies_sail_ckpt
    ckpt = os.path.join(run_dir, "wd-movies_SAIL_best_model.pt")
    tdir = str(tmp_path / "trace")
    session = _serve_session(ckpt, batch=4)
    resps = _run_serve(session, [
        _json.dumps({"cmd": "trace", "n": 1, "dir": tdir}),
        '{"id": "t1", "n": 3, "seed": 5}',
        '{"id": "t2", "n": 2}',
        '{"cmd": "shutdown"}',
    ])
    assert resps[0] == {"ok": True, "trace_dir": tdir, "n": 1}
    assert resps[1]["id"] == "t1" and len(resps[1]["graphs"]) == 3
    assert resps[2]["id"] == "t2" and len(resps[2]["graphs"]) == 2
    assert resps[3]["ok"] is True
    # trace files landed (plugins/profile/<ts>/... on every backend)
    found = [os.path.join(r, f) for r, _, fs in os.walk(tdir) for f in fs]
    assert found, f"no trace files under {tdir}"
