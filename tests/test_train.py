"""Training step tests: loss decreases, epoch-scan == per-batch stepping,
Adam and cosine schedule match torch semantics (reference train.py:449-457).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ark_tpu.data.tokenizer import build_vocab_layout
from ark_tpu.models import build_model
from ark_tpu.train import (
    beta_for_epoch,
    cosine_annealing_lr,
    create_train_state,
    make_epoch_fns,
    make_train_step,
)
from ark_tpu.train.state import adam_tx

LAYOUT = build_vocab_layout(20, 4, 3, 3, use_padding=False)
CFG = dict(model_type="ARK", d_model=16, d_latent=6, n_heads=2, n_layers=2,
           seq_len=LAYOUT.seq_len, vocab_size=LAYOUT.vocab_size,
           n_entities=LAYOUT.num_entities, n_relations=LAYOUT.num_relations,
           dec_dropout=0.0, batch_size=16, shuffle_train=False,
           permute_triples=False, learning_rate=1e-2, num_epochs=5)


def _toy_data(n=64):
    rng = np.random.default_rng(0)
    triples = rng.integers(0, 4, size=(n, 3, 3)).astype(np.int32)
    triples[:, :, 0] %= 20
    triples[:, :, 2] %= 20
    from ark_tpu.train.steps import build_seq_from_triples
    seq = np.asarray(build_seq_from_triples(
        jnp.asarray(triples), LAYOUT.ent_base, LAYOUT.rel_base, 1, 2))
    return jnp.asarray(triples), jnp.asarray(seq)


def test_train_step_decreases_loss():
    m = build_model(CFG)
    state = create_train_state(m, jax.random.key(0))
    step = make_train_step(m, pad_id=0)
    triples, seq = _toy_data(16)
    losses = []
    for i in range(30):
        state, metrics = step(state, triples, seq, jax.random.key(i), 1e-2, 1.0)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7


@pytest.mark.parametrize("mt", ["ARK", "SAIL"])
def test_epoch_scan_equals_batch_steps(mt):
    cfg = dict(CFG, model_type=mt)
    m = build_model(cfg)
    state_a = create_train_state(m, jax.random.key(0))
    state_b = create_train_state(m, jax.random.key(0))
    triples, seq = _toy_data(64)
    train_epoch, _ = make_epoch_fns(m, LAYOUT, cfg)
    rng = jax.random.key(7)
    state_a, metrics_a = train_epoch(state_a, triples, seq, rng, 1e-2, 1.0)

    # mirror the scan's rng chain in a host loop with single-batch steps
    step = make_train_step(m, pad_id=0)
    r, _ = jax.random.split(rng)
    ms = []
    for i in range(64 // 16):
        r, k_perm, k_drop = jax.random.split(r, 3)
        sl = slice(i * 16, (i + 1) * 16)
        state_b, met = step(state_b, triples[sl], seq[sl], k_drop, 1e-2, 1.0)
        ms.append(float(met["loss"]))
    np.testing.assert_allclose(float(metrics_a["loss"]), np.mean(ms),
                               rtol=1e-5, atol=1e-6)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)


def test_adam_matches_torch():
    w0 = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)
    x = np.random.default_rng(2).normal(size=(8, 4)).astype(np.float32)
    y = np.random.default_rng(3).normal(size=(8, 3)).astype(np.float32)
    lr = 1e-2

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr)
    for _ in range(5):
        opt.zero_grad()
        loss = ((torch.tensor(x) @ tw - torch.tensor(y)) ** 2).mean()
        loss.backward()
        opt.step()

    tx = adam_tx()
    params = jnp.asarray(w0)
    opt_state = tx.init(params)

    def loss_fn(w):
        return jnp.mean((jnp.asarray(x) @ w - jnp.asarray(y)) ** 2)

    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = params + jax.tree.map(lambda u: -lr * u, updates)

    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_cosine_schedule_matches_torch():
    base, eta_min, T = 1e-3, 1e-6, 10
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=T, eta_min=eta_min)
    for epoch in range(T):
        got = cosine_annealing_lr(base, epoch, T, eta_min)
        np.testing.assert_allclose(got, opt.param_groups[0]["lr"], rtol=1e-6)
        opt.step()
        sched.step()


def test_beta_annealing():
    cfg = dict(model_type="SAIL", beta0=0.1, beta1=1.0, num_epochs=10)
    assert beta_for_epoch(cfg, 0, annealed=True) == pytest.approx(0.1)
    assert beta_for_epoch(cfg, 5, annealed=True) == pytest.approx(0.55)
    assert beta_for_epoch(cfg, 0, annealed=False) == 1.0
    assert beta_for_epoch(dict(cfg, model_type="ARK"), 5, annealed=True) == 1.0


def test_bf16_adam_moments_track_f32(small_datasets):
    """adam_state_dtype='bfloat16' stores the moments in bf16 (f32 moment
    math) and its loss curve tracks the f32 optimizer closely."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ark_tpu.data import load_data_as_list
    from ark_tpu.data.dataset import encode_graphs
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model
    from ark_tpu.train import create_train_state, make_train_step

    train_g, _, _, (e2i, _), (r2i, _), (mn, mx), _ = \
        load_data_as_list("syn-paths")
    layout = build_vocab_layout(len(e2i), len(r2i), mn, mx, False)
    data = encode_graphs(train_g[:512], layout)
    base = dict(model_type="ARK", d_model=32, n_layers=2,
                seq_len=layout.seq_len, vocab_size=layout.vocab_size,
                n_entities=layout.num_entities,
                n_relations=layout.num_relations, dec_dropout=0.0,
                batch_size=32)

    def run(cfg):
        m = build_model(cfg)
        state = create_train_state(m, jax.random.key(0))
        step = make_train_step(m, pad_id=0, config=cfg)
        tri = jnp.zeros((32, layout.max_edges, 3), jnp.int32)
        losses = []
        for i in range(16):
            batch = jnp.asarray(data.seq[(i % 16) * 32:(i % 16) * 32 + 32])
            state, met = step(state, tri, batch, jax.random.key(i), 1e-3, 1.0)
            losses.append(float(met["loss"]))
        return losses, state

    l32, s32 = run(dict(base))
    l16, s16 = run(dict(base, adam_state_dtype="bfloat16"))
    assert s16.opt_state.mu["tok_emb"].dtype == jnp.bfloat16
    assert s32.opt_state.mu["tok_emb"].dtype == jnp.float32
    np.testing.assert_allclose(l16, l32, rtol=0.02, atol=0.02)

    # per-moment isolation knobs (round-5: the round-2 bf16 BOTH-moments
    # quality collapse was attributed to the SECOND moment; adam_m_dtype
    # halves the first-moment traffic while keeping exact f32 step sizes)
    lm16, sm16 = run(dict(base, adam_m_dtype="bfloat16"))
    assert sm16.opt_state.mu["tok_emb"].dtype == jnp.bfloat16
    assert sm16.opt_state.nu["tok_emb"].dtype == jnp.float32
    np.testing.assert_allclose(lm16, l32, rtol=0.02, atol=0.02)
    lv16, sv16 = run(dict(base, adam_v_dtype="bfloat16"))
    assert sv16.opt_state.mu["tok_emb"].dtype == jnp.float32
    assert sv16.opt_state.nu["tok_emb"].dtype == jnp.bfloat16
    np.testing.assert_allclose(lv16, l32, rtol=0.02, atol=0.02)
    # explicit m/v dtypes override state_dtype for their moment
    _, sb = run(dict(base, adam_state_dtype="bfloat16",
                     adam_v_dtype="float32"))
    assert sb.opt_state.mu["tok_emb"].dtype == jnp.bfloat16
    assert sb.opt_state.nu["tok_emb"].dtype == jnp.float32


def test_resolve_adam_dtypes_auto_default(monkeypatch):
    """Round-5 gated default: unset Adam dtype knobs resolve to a bf16
    FIRST moment on accelerator backends only (the 15-epoch wd-articles
    validity gate held the f32 line — runs_r5/ab/TABLE.md stage E); CPU
    stays the f32 torch-parity configuration, explicit float32 wins on
    TPU, and use_fused_adam suppresses the auto default so the fused
    optimizer A/B paths keep their f32 moments."""
    import jax
    import jax.numpy as jnp
    from ark_tpu.train.state import resolve_adam_dtypes

    f32, bf16 = jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)
    # this suite runs on the cpu backend: auto keeps f32 moments
    assert resolve_adam_dtypes({}) == (f32, f32)
    assert resolve_adam_dtypes(None) == (f32, f32)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_adam_dtypes({}) == (bf16, f32)
    assert resolve_adam_dtypes({"adam_m_dtype": "float32"}) == (f32, f32)
    assert resolve_adam_dtypes({"adam_v_dtype": "bfloat16"}) == (f32, bf16)
    assert resolve_adam_dtypes({"adam_state_dtype": "bfloat16"}) == (bf16, bf16)
    assert resolve_adam_dtypes({"use_fused_adam": True}) == (f32, f32)
    assert resolve_adam_dtypes({"use_fused_adam": "xla"}) == (f32, f32)


def test_resume_casts_moments_to_resolved_dtype(tmp_path, small_datasets):
    """A checkpoint written under one backend's moment dtypes must resume
    under THIS run's resolved dtypes (the TPU auto bf16-m default means
    cross-backend resumes see a dtype change; the epoch scan's carry dtype
    must match the optimizer's stored dtype or tracing fails)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ark_tpu.train.loop import run_training
    from ark_tpu.utils.checkpoint import load_checkpoint
    from ark_tpu.utils.logging import Run

    cfg = dict(model_type="ARK", dataset="syn-paths", d_model=32,
               n_layers=1, batch_size=32, num_epochs=1, learning_rate=1e-3,
               lr_scheduler=False, seed=0, sample_frac=0.03125,
               verify_every=100, compression_log_every=100, save_every=100,
               num_generated_latent_graphs=8, use_padding=True,
               experiment_name="resume_cast")
    d1 = tmp_path / "a"
    d1.mkdir()
    run_training(dict(cfg), str(d1), Run(enabled=False))
    ck = str(next(d1.glob("*best_model.pt")))
    payload = load_checkpoint(ck)
    # simulate a checkpoint written under the TPU auto default: bf16 mu
    payload["optimizer_state_dict"] = jax.tree.map(
        lambda x: (x.astype(np.float32).astype(jnp.bfloat16)
                   if getattr(x, "dtype", None) == np.float32 else x),
        payload["optimizer_state_dict"])
    ck2 = str(tmp_path / "bf16m.pt")
    import pickle
    with open(ck2, "wb") as f:
        pickle.dump(payload, f)
    # resuming on cpu (auto = f32 moments) must retrace cleanly: the
    # restored bf16 moments are cast to this backend's resolved f32
    d2 = tmp_path / "b"
    d2.mkdir()
    run_training(dict(cfg, num_epochs=2, resume_from_checkpoint=True,
                      checkpoint_path=ck2), str(d2), Run(enabled=False))


def test_bench_flops_model_sanity():
    """bench.py's analytic FLOPs helpers (round-3 VERDICT item 3): the
    closed forms must match a hand count at a small geometry, and the
    wd-articles-scale ratios must show the head dominating (the round-2
    trace's CE-dominated step)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    class Layout:
        seq_len = 86
        vocab_size = 58806

    cfg = dict(model_type="ARK", d_model=512, n_layers=3,
               vocab_pad_multiple=1024)
    # GRU: 3 layers x 3 gates x 2 matvecs x (2*512*512 FLOPs)
    assert bench.model_flops_per_token(cfg, Layout) == 3 * 12 * 512 * 512
    v_pad = 59392  # 58806 padded to 1024
    assert bench.head_flops_per_row(cfg, Layout) == 2 * 512 * v_pad
    # train: 3x forward; head on capped rows only
    cfg["ce_row_cap"] = 768
    tokens = bench.BATCH * 85
    want = 3 * (tokens * 3 * 12 * 512 * 512 + 768 * 2 * 512 * v_pad)
    assert bench.train_flops_per_step(cfg, Layout) == want
    # sampling: gumbel = 2 head passes, cdf = 3
    g = bench.sample_flops_per_graph(cfg, Layout, "gumbel")
    c = bench.sample_flops_per_graph(cfg, Layout, "cdf")
    assert c > g
    assert g == 85 * (3 * 12 * 512 * 512 + 2 * 2 * 512 * v_pad)
    # transformer trunk: per layer 8D^2 + 4*D*d_ff + 4*L*D
    cfg_t = dict(cfg, model_type="t-ARK")
    d = 512
    assert bench.model_flops_per_token(cfg_t, Layout) == \
        3 * (8 * d * d + 4 * d * 2048 + 4 * 85 * d)
