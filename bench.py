#!/usr/bin/env python
"""Headline benchmark: wd-articles training + sampling throughput per chip.

Target (BASELINE.json north star): >=10x graphs/sec/chip on wd-articles
training and sampling vs the PyTorch reference. The reference publishes no
numbers (BASELINE.md), so the baseline is measured: a freshly-written torch
mirror of the reference's decoder-only GRU model (DecoderOnlyGRU semantics,
reference models.py:323-345) run on this host's CPU — the only torch device
available here — with the reference's own training/sampling procedure
(per-batch step; full-prefix re-encode per sampling token, models.py:429).
The baseline measurement is cached in .bench_baseline.json.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "graphs/sec/chip", "vs_baseline": N, ...}
"""

import json
import os
import sys
import time

os.environ.setdefault("ARK_TPU_DATA_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".ark_tpu_data"))

import numpy as np

BATCH = 16           # reference config batch size (configs/autoreg_wd-articles.yaml)
TRAIN_STEPS = 256    # timed steps per measurement
SAMPLE_BATCH = int(os.environ.get("ARK_TPU_BENCH_SAMPLE_BATCH", "512"))
SAMPLE_TOTAL = int(os.environ.get("ARK_TPU_BENCH_SAMPLE_TOTAL", "8192"))
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")
DTYPE = os.environ.get("ARK_TPU_BENCH_DTYPE", "float32")
# "ARK" (GRU, the headline) or "t-ARK" (transformer; round-3 VERDICT item 4)
MODEL = os.environ.get("ARK_TPU_BENCH_MODEL", "ARK")

# MXU peak for MFU accounting. This environment's chip is a TPU v5e
# (docs/BENCH_NOTES.md round-1 header): 197 TFLOP/s bf16. f32-typed matmuls
# also run the MXU at the bf16 rate under JAX's DEFAULT precision (bf16
# multiplicands, f32 accumulation) — the round-2 trace measured the CE bwd
# matmuls at 166 TF/s effective, 84% of THIS number — so one peak serves
# both bench dtypes.
PEAK_TFLOPS = {"TPU v5e": 197.0}.get(
    os.environ.get("ARK_TPU_BENCH_CHIP", "TPU v5e"), 197.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def probe_backend(timeout_s=180):
    """Fail fast when the TPU tunnel is unreachable. jax.devices() on the
    axon platform retries PJRT init in a sleep loop FOREVER when the
    tunnel is down (observed >12 h in round 4) — a bench invocation must
    not hang the driver's round-end pipeline. The probe runs in a
    subprocess (the parent must not poison its own jax state on timeout)
    and succeeds when the child's default backend answers — i.e. exactly
    the backend the bench itself would use (this environment's
    sitecustomize pins the child to the axon platform regardless of env
    vars, so the probe genuinely exercises the tunnel)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _vocab_padded(cfg, layout):
    mult = int(cfg.get("vocab_pad_multiple", 1))
    return -(-layout.vocab_size // mult) * mult


def model_flops_per_token(cfg, layout):
    """Analytic forward FLOPs per token, decoder trunk only (no head):
    2 FLOPs per MAC, elementwise ops ignored (<1%). ARK: n_layers GRU
    cells, 3 gates x (x@W + h@U) = 6 DxD matvecs. t-ARK: per layer qkv
    in_proj (6D^2) + out_proj (2D^2) + 2-layer MLP (4*D*d_ff) + attention
    score/value matmuls (4*L*D per token at context length L)."""
    d = int(cfg["d_model"])
    nl = int(cfg["n_layers"])
    if cfg.get("model_type", "ARK") in ("ARK", "SAIL"):
        return nl * 12 * d * d
    d_ff = 2048  # torch nn.TransformerEncoderLayer default (models/layers.py)
    l_ctx = layout.seq_len - 1
    return nl * (8 * d * d + 4 * d * d_ff + 4 * l_ctx * d)


def head_flops_per_row(cfg, layout):
    """One [1, D] x [D, Vp] logits row: 2*D*Vp FLOPs."""
    return 2 * int(cfg["d_model"]) * _vocab_padded(cfg, layout)


def train_flops_per_step(cfg, layout):
    """Analytic FLOPs of one optimizer step at batch BATCH: forward +
    backward (= 2x forward) over the trunk on every token plus the fused
    logits+CE head on the live (non-PAD-capped) rows; Adam is HBM-bound
    and excluded. Reconciles with the round-2 trace: the head matmuls are
    ~97% of these FLOPs at wd-articles scale (docs/BENCH_NOTES.md)."""
    tokens = BATCH * (layout.seq_len - 1)
    rows_head = int(cfg.get("ce_row_cap") or tokens)
    fwd = tokens * model_flops_per_token(cfg, layout) \
        + rows_head * head_flops_per_row(cfg, layout)
    return 3 * fwd


def sample_flops_per_graph(cfg, layout, strategy):
    """Analytic FLOPs to generate one graph: L-1 token steps, each one
    trunk step + the fused sampler's passes over the head (gumbel: pass A
    + pass B = 2 reads of W; cdf: +1 LSE pass); retry rounds are ~1e-4 of
    steps and ignored."""
    passes = 3 if strategy == "cdf" else 2
    per_step = model_flops_per_token(cfg, layout) \
        + passes * head_flops_per_row(cfg, layout)
    return (layout.seq_len - 1) * per_step


def build_setup():
    import jax
    import jax.numpy as jnp
    import yaml

    from ark_tpu.experiments.train import _enable_compilation_cache
    _enable_compilation_cache()

    from ark_tpu.train.loop import DataBundle, derive_config
    from ark_tpu.models import build_model

    cfg = yaml.safe_load(open(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "configs", "autoreg_wd-articles.yaml")))
    cfg["learning_rate"] = float(cfg["learning_rate"])
    cfg["compute_dtype"] = DTYPE
    if MODEL != "ARK":
        # t-ARK mode (round-3 VERDICT item 4): same wd-articles batch-16
        # geometry, transformer decoder (reference DecoderOnlyTransformer,
        # models.py:349-366)
        cfg["model_type"] = MODEL
    cfg["vocab_pad_multiple"] = 1024
    # fastest measured variant (see docs/BENCH_NOTES.md): fused Pallas
    # logits+CE (bit-matches the XLA path; A/B'd loss-identical) and the
    # Pallas GRU in "auto" mode — at bench's small per-shard batch that
    # selects the bf16-weight stack kernel, which perturbs the loss ~1e-4
    # vs the f32 path (gru_stack.py header; A/B'd quality-neutral).
    # "perlayer" is the bit-exact kernel if exactness is wanted.
    cfg["use_fused_ce"] = os.environ.get("ARK_TPU_BENCH_FUSED", "1") == "1"
    _adam = os.environ.get("ARK_TPU_BENCH_ADAM_DTYPE", "")
    if _adam:
        cfg["adam_state_dtype"] = _adam
    # per-moment isolation knobs (round 5): bf16 mu keeps exact f32 step
    # sizes (the round-2 bf16-BOTH-moments quality collapse was attributed
    # to nu); each is quality-gated by its own 15-epoch validity run
    _madam = os.environ.get("ARK_TPU_BENCH_ADAM_M_DTYPE", "")
    if _madam:
        cfg["adam_m_dtype"] = _madam
    _vadam = os.environ.get("ARK_TPU_BENCH_ADAM_V_DTYPE", "")
    if _vadam:
        cfg["adam_v_dtype"] = _vadam
    _fadam = os.environ.get("ARK_TPU_BENCH_FADAM", "")
    if _fadam:
        # "1"/"0" toggle the Pallas kernel; "xla" selects the one-tree_map
        # A/B variant (docs/BENCH_NOTES.md round-3 table)
        cfg["use_fused_adam"] = {"1": True, "0": False}.get(_fadam, _fadam)
    _pgru = os.environ.get("ARK_TPU_BENCH_PGRU", "auto")
    # "auto"/"stack"/"perlayer" select a kernel family; "1" (legacy) is the
    # bit-exact per-layer kernel; "0" is the lax.scan reference
    cfg["use_pallas_gru"] = {"1": True, "0": False}.get(_pgru, _pgru)
    bundle = DataBundle(cfg)
    cfg = derive_config(cfg, bundle)
    model = build_model(cfg)
    return cfg, bundle, model


def measure_tpu(cfg, bundle, model):
    import jax
    import jax.numpy as jnp

    from ark_tpu.train import create_train_state, make_epoch_fns
    from ark_tpu.sample import make_sampler

    layout = bundle.layout
    state = create_train_state(model, jax.random.key(0))
    # sampling-only A/B runs (queue scripts) skip the train measurement;
    # the train fields then report 0 and the headline JSON line is only
    # meaningful for its sample_* fields
    skip_train = os.environ.get("ARK_TPU_BENCH_SKIP_TRAIN", "0") == "1"
    n = TRAIN_STEPS * BATCH
    triples = jnp.asarray(bundle.train.triples[:n])
    seq = jnp.asarray(bundle.train.seq[:n])
    if os.environ.get("ARK_TPU_BENCH_ROWCAP", "1") == "1":
        from ark_tpu.ops.losses import compute_ce_row_cap
        cfg["ce_row_cap"] = compute_ce_row_cap(
            np.asarray(seq), layout.special_tokens["PAD"], BATCH)
        log(f"[bench] fused-CE live-row cap: {cfg['ce_row_cap']} "
            f"of {BATCH * (layout.seq_len - 1)} rows/batch")
    train_epoch, _ = make_epoch_fns(model, layout, cfg)

    if skip_train:
        log("[bench] ARK_TPU_BENCH_SKIP_TRAIN=1: skipping train measurement")
        train_gps = train_tflops = train_mfu = 0.0
        return _measure_sampling(cfg, layout, model, state,
                                 train_gps, train_tflops, train_mfu)

    log("[bench] compiling + warmup train epoch ...")
    t0 = time.time()
    state, met = train_epoch(state, triples, seq, jax.random.key(1), 1e-4, 1.0)
    warm_loss = float(met["loss"])  # host fetch = real sync
    log(f"[bench] train compile+warmup {time.time()-t0:.1f}s loss={warm_loss:.3f}")

    times = []
    for r in range(3):
        t0 = time.time()
        state, met = train_epoch(state, triples, seq, jax.random.key(2 + r),
                                 1e-4, 1.0)
        loss = float(met["loss"])
        times.append(time.time() - t0)
    dt = sorted(times)[1]  # median of 3 (tunnel jitter)
    train_gps = n / dt
    train_tflops = train_flops_per_step(cfg, layout) * TRAIN_STEPS / dt / 1e12
    train_mfu = train_tflops / PEAK_TFLOPS
    log(f"[bench] train: {dt:.2f}s for {TRAIN_STEPS} steps x {BATCH} "
        f"-> {train_gps:.0f} graphs/s (loss {loss:.3f}) "
        f"| {train_tflops:.1f} TFLOP/s = {train_mfu:.1%} MFU "
        f"(analytic FLOPs, v5e bf16 peak {PEAK_TFLOPS:.0f})")

    return _measure_sampling(cfg, layout, model, state,
                             train_gps, train_tflops, train_mfu)


def _measure_sampling(cfg, layout, model, state, train_gps, train_tflops,
                      train_mfu):
    import jax
    import jax.numpy as jnp

    # train-side A/B runs (optimizer dtype knobs) skip the sampling
    # measurement — the big-vocab sampler compile costs minutes through
    # the tunnel and its number is unaffected by train-only knobs
    if os.environ.get("ARK_TPU_BENCH_SKIP_SAMPLE", "0") == "1":
        log("[bench] ARK_TPU_BENCH_SKIP_SAMPLE=1: skipping sample "
            "measurement")
        perf = {"train_tflops": round(train_tflops, 1),
                "train_mfu": round(train_mfu, 3),
                "sample_tflops": 0.0, "sample_mfu": 0.0,
                "peak_tflops": PEAK_TFLOPS}
        return train_gps, 0.0, 0.0, perf

    # optional reduced-precision decode path (params stay f32)
    sample_dtype = os.environ.get("ARK_TPU_BENCH_SAMPLE_DTYPE", "")
    scfg = dict(cfg, sample_chunk=SAMPLE_BATCH)
    if sample_dtype and sample_dtype != DTYPE:
        scfg["sample_dtype"] = sample_dtype
    _sstrat = os.environ.get("ARK_TPU_BENCH_SAMPLE_STRATEGY", "")
    if _sstrat:
        # fused-kernel candidate strategy: "gumbel" | "expmin" | "cdf"
        scfg["fused_sample_strategy"] = _sstrat
    _swd = os.environ.get("ARK_TPU_BENCH_SAMPLE_WDTYPE", "")
    if _swd:
        # bf16 head streaming inside the fused sampling kernels
        scfg["fused_sample_dtype"] = _swd
    _svb = os.environ.get("ARK_TPU_BENCH_SAMPLE_VBLOCK", "")
    if _svb:
        # fused-kernel vocab tile width (bigger tiles amortize per-block
        # overhead; VMEM bounds vblock x rowchunk)
        scfg["fused_sample_vblock"] = int(_svb)
    _src = os.environ.get("ARK_TPU_BENCH_SAMPLE_ROWCHUNK", "")
    if _src:
        scfg["fused_sample_rowchunk"] = int(_src)
    _skc = os.environ.get("ARK_TPU_BENCH_SAMPLE_KCANDS", "")
    if _skc:
        # candidates per acceptance round (fewer = less pass-A noise work,
        # higher retry probability)
        scfg["fused_sample_kcands"] = int(_skc)
    _seg = os.environ.get("ARK_TPU_BENCH_ATTN_SEG", "")
    if _seg:
        # prefix-windowed KV attention segments for transformer decode
        # ('auto' = 3 for txf decoders, 0/1 = off, N = that many segments)
        scfg["attn_window_segments"] = _seg if _seg == "auto" else int(_seg)
    # the production sampling path (SamplerBank.sample_sequences): all chunks
    # of the request run on-device in one dispatch (lax.scan over chunks),
    # one host fetch per call — the measured number is device-bound, not
    # axon-dispatch-bound (round-2 VERDICT item 1)
    from ark_tpu.train.loop import SamplerBank
    bank = SamplerBank(model, layout, scfg)
    log("[bench] compiling + warmup sampler "
        f"({SAMPLE_TOTAL // SAMPLE_BATCH} chunks x {SAMPLE_BATCH}) ...")
    t0 = time.time()
    _ = int(bank.sample_sequences(state.params, jax.random.key(3),
                                  SAMPLE_TOTAL).sum())
    log(f"[bench] sample compile+warmup {time.time()-t0:.1f}s")
    t0 = time.time()
    reps = 4
    for i in range(reps):
        out = bank.sample_sequences(state.params, jax.random.key(10 + i),
                                    SAMPLE_TOTAL)
    dt = (time.time() - t0) / reps
    sample_req_gps = SAMPLE_TOTAL / dt
    log(f"[bench] sample (serial requests): {dt*1000:.0f} ms/{SAMPLE_TOTAL} "
        f"({SAMPLE_TOTAL // SAMPLE_BATCH} x {SAMPLE_BATCH}) "
        f"-> {sample_req_gps:.0f} graphs/s")
    # pipelined serving: all requests dispatched up front (jax async
    # dispatch), fetches overlap device compute — the sustained-throughput
    # number a server with >=2 outstanding requests sees; tokens are
    # bitwise the serial path's (same per-request rng)
    t0 = time.time()
    outs = [bank.sample_sequences_device(state.params, jax.random.key(10 + i),
                                         SAMPLE_TOTAL) for i in range(reps)]
    outs = [np.asarray(o) for o in outs]
    dt = (time.time() - t0) / reps
    sample_gps = SAMPLE_TOTAL / dt
    strategy = scfg.get("fused_sample_strategy", "auto")
    strategy = "gumbel" if strategy == "auto" else strategy
    sample_tflops = sample_gps * sample_flops_per_graph(cfg, layout,
                                                        strategy) / 1e12
    sample_mfu = sample_tflops / PEAK_TFLOPS
    log(f"[bench] sample (pipelined x{reps}): {dt*1000:.0f} ms/{SAMPLE_TOTAL} "
        f"-> {sample_gps:.0f} graphs/s | {sample_tflops:.1f} TFLOP/s = "
        f"{sample_mfu:.1%} MFU (analytic FLOPs, {strategy} strategy)")
    perf = {
        "train_tflops": round(train_tflops, 1),
        "train_mfu": round(train_mfu, 3),
        "sample_tflops": round(sample_tflops, 1),
        "sample_mfu": round(sample_mfu, 3),
        "peak_tflops": PEAK_TFLOPS,
    }
    return train_gps, sample_gps, sample_req_gps, perf


def measure_torch_baseline(cfg, bundle):
    """Reference-procedure torch baseline on CPU (cached per model family)."""
    cache = (BASELINE_CACHE if MODEL == "ARK"
             else BASELINE_CACHE.replace(".json", f".{MODEL}.json"))
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    import torch
    import torch.nn.functional as F

    layout = bundle.layout
    V, L, D, NL = layout.vocab_size, layout.seq_len, cfg["d_model"], cfg["n_layers"]

    class GRULM(torch.nn.Module):
        """Decoder-only GRU LM with the reference's architecture shape
        (token+position embeddings, multi-layer GRU, tied output head)."""

        def __init__(self):
            super().__init__()
            self.tok = torch.nn.Embedding(V, D)
            self.pos = torch.nn.Embedding(L, D)
            self.gru = torch.nn.GRU(D, D, num_layers=NL, batch_first=True,
                                    dropout=0.1)
            self.out = torch.nn.Linear(D, V)
            self.out.weight = self.tok.weight

        def forward(self, s):
            x = self.tok(s) + self.pos(torch.arange(s.shape[1]))[None]
            y, _ = self.gru(x)
            return self.out(y)

    class TxfLM(torch.nn.Module):
        """Decoder-only transformer LM with the reference's architecture
        shape (DecoderOnlyTransformer, models.py:349-366: TransformerEncoder
        + causal mask, torch-default dim_feedforward=2048, tied head)."""

        def __init__(self):
            super().__init__()
            self.tok = torch.nn.Embedding(V, D)
            self.pos = torch.nn.Embedding(L, D)
            layer = torch.nn.TransformerEncoderLayer(
                D, cfg.get("n_heads", 8), batch_first=True)
            self.enc = torch.nn.TransformerEncoder(layer, NL)
            self.out = torch.nn.Linear(D, V)
            self.out.weight = self.tok.weight

        def forward(self, s):
            x = self.tok(s) + self.pos(torch.arange(s.shape[1]))[None]
            mask = torch.nn.Transformer.generate_square_subsequent_mask(
                s.shape[1])
            y = self.enc(x, mask=mask)
            return self.out(y)

    model = GRULM() if MODEL == "ARK" else TxfLM()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    seq = torch.tensor(np.asarray(bundle.train.seq[:BATCH], np.int64))

    log("[bench] torch-CPU baseline: train steps ...")
    steps = 3
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        logits = model(seq[:, :-1])
        loss = F.cross_entropy(logits.reshape(-1, V), seq[:, 1:].reshape(-1),
                               ignore_index=0)
        loss.backward()
        opt.step()
    train_gps = BATCH * steps / (time.time() - t0)
    log(f"[bench] torch train: {train_gps:.1f} graphs/s")

    log("[bench] torch-CPU baseline: sampling (reference full-prefix loop) ...")
    model.eval()
    B = 50  # the reference's sampling chunk size (train.py:516)
    # The reference re-encodes the full prefix every step (models.py:429), so
    # per-step cost grows linearly in prefix length p and the full generation
    # is ~quadratic in L. Running all L-1 steps on one CPU core takes tens of
    # minutes; instead measure per-step time at several prefix lengths, fit
    # t(p) = a*p + c, and integrate over p = 1..L-1.
    with torch.no_grad():
        probe_ps, probe_ts = [], []
        for p in (4, 8, 12):
            s = torch.full((B, p), 1, dtype=torch.long)
            t0 = time.time()
            logits = model(s)[:, -1]
            probs = torch.softmax(logits, dim=-1)
            _ = torch.multinomial(probs, 1)
            probe_ps.append(p)
            probe_ts.append(time.time() - t0)
        a, c = np.polyfit(probe_ps, probe_ts, 1)
        total = sum(max(a * p + c, 0.0) for p in range(1, L))
        sample_gps = B / total
    log(f"[bench] torch sample (extrapolated from per-step fit): "
        f"{sample_gps:.2f} graphs/s")

    result = {"train_graphs_per_sec": train_gps,
              "sample_graphs_per_sec": sample_gps,
              "device": "cpu", "batch": BATCH, "model": MODEL}
    with open(cache, "w") as f:
        json.dump(result, f)
    return result


def main():
    # one TPU job at a time: serialize against queued measurement scripts /
    # interactive runs via the advisory flock (self-releasing on exit).
    # Bounded wait — a bench invocation must report, not stall a pipeline
    # behind a multi-hour training run (override: ARK_TPU_DEVICE_LOCK_TIMEOUT)
    from ark_tpu.utils.device_lock import acquire_device_lock
    try:
        acquire_device_lock(
            timeout=float(os.environ.get("ARK_TPU_DEVICE_LOCK_TIMEOUT")
                          or 3600), tag="bench")
    except TimeoutError as e:
        print(json.dumps({
            "metric": "wd_articles_train_graphs_per_sec_chip", "value": 0,
            "unit": "graphs/sec/chip", "vs_baseline": 0,
            "error": f"TPU busy: {e} — no measurement taken",
        }), flush=True)
        return 1
    if not probe_backend():
        # one parseable line either way (the driver records stdout)
        print(json.dumps({
            "metric": "wd_articles_train_graphs_per_sec_chip", "value": 0,
            "unit": "graphs/sec/chip", "vs_baseline": 0,
            "error": "jax backend unreachable (TPU tunnel down; "
                     "jax.devices() did not answer within the probe "
                     "timeout) — no measurement taken",
        }), flush=True)
        return 1
    cfg, bundle, model = build_setup()
    baseline = measure_torch_baseline(cfg, bundle)
    train_gps, sample_gps, sample_req_gps, perf = measure_tpu(cfg, bundle,
                                                              model)
    metric = ("wd_articles_train_graphs_per_sec_chip" if MODEL == "ARK" else
              f"wd_articles_{MODEL.replace('-', '_')}"
              "_train_graphs_per_sec_chip")
    result = {
        "metric": metric,
        "value": round(train_gps, 1),
        "unit": "graphs/sec/chip",
        "vs_baseline": round(train_gps / baseline["train_graphs_per_sec"], 2),
        "sample_graphs_per_sec_chip": round(sample_gps, 1),
        # the headline is pipelined x4 as of round 3 (fetches overlap device
        # compute); earlier rounds' lines under the same key were serial
        "sample_mode": "pipelined_x4",
        "sample_single_request_graphs_per_sec": round(sample_req_gps, 1),
        "sample_vs_baseline": round(
            sample_gps / baseline["sample_graphs_per_sec"], 2),
        "baseline": "torch-cpu reference procedure (see bench.py docstring)",
        "dtype": DTYPE,
        "batch": BATCH,
        # analytic-FLOPs utilization (round-3 VERDICT item 3): one auditable
        # MFU figure next to graphs/s; docs/BENCH_NOTES.md reconciles these
        # with the round-2 trace's per-kernel roofline shares
        **perf,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    sys.exit(main())
