"""The unified training run: data -> model -> compiled epoch scans ->
periodic sampling + semantic verification -> compression eval ->
checkpoints -> metrics.

This is the TPU-native superset of the reference's two trainers (SURVEY
quirk Q-6): ``kgvae.experiments.train`` (ARK/t-ARK only, train.py:427-444)
and ``kgvae.experiments.ablation_study`` (adds SAIL/t-SAIL with β-annealed
ELBO). One trainer supports all four model types. Deliberate fixes, flagged
per SURVEY §2:
  - Q-1: posterior_bits runs only every ``compression_log_every`` epochs
    (the reference's train.py computes it every epoch and only logs it
    periodically; the ablation trainer gates correctly).
  - Q-7: β is annealed for SAIL/t-SAIL (ablation trainer behavior).
  - resume_from_checkpoint / checkpoint_path are functional (dead keys in
    the reference).

W&B metric names follow the reference surface exactly (SURVEY §5).
"""

from __future__ import annotations

import functools
import math
import os
import signal
import sys
import threading
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ark_tpu.data.dataset import encode_graphs
from ark_tpu.data.loader import ensure_dataset, load_data_as_list
from ark_tpu.data.tokenizer import (
    build_vocab_layout,
    canonical_graph_string,
    ints_to_labels,
    seqs_to_triples_batch,
)
from ark_tpu.eval import get_verifier, posterior_bits, run_semantic_evaluation
from ark_tpu.models import build_model
from ark_tpu.parallel import multihost as mh
from ark_tpu.sample import make_sampler
from ark_tpu.train.state import (
    TrainState,
    beta_for_epoch,
    create_train_state,
    lr_for_epoch,
)
from ark_tpu.train.steps import make_epoch_fns
from ark_tpu.utils.checkpoint import (AsyncCheckpointWriter, load_checkpoint,
                                      save_checkpoint,
                                      save_checkpoint_sharded, to_device_tree)
from ark_tpu.utils.profiling import PhaseTimer, maybe_trace


# ---------------------------------------------------------------------------
# Data preparation
# ---------------------------------------------------------------------------

class DataBundle:
    def __init__(self, config):
        name = config["dataset"]
        # multi-host: hosts may share a filesystem — only the primary
        # materializes missing dataset files, the rest wait (idempotent
        # either way; no-op barrier single-process)
        mh.primary_first(lambda: ensure_dataset(name), "ensure_dataset")
        (train_g, val_g, test_g, (e2i, i2e), (r2i, i2r),
         (min_edges, max_edges), _) = load_data_as_list(name)
        use_padding = config.get("use_padding", name.startswith("wd-"))
        layout = build_vocab_layout(len(e2i), len(r2i), min_edges, max_edges,
                                    use_padding)
        order = config.get("triple_order", "keep")
        permute = config.get("permute_triples", False)
        enc = lambda graphs, perm: encode_graphs(
            graphs, layout, triple_order=order, i2e=i2e, i2r=i2r, permute=perm)
        self.train = enc(train_g, permute)
        self.val = enc(val_g, permute)
        self.test = enc(test_g, permute)
        self.train_g, self.val_g, self.test_g = train_g, val_g, test_g
        self.e2i, self.i2e, self.r2i, self.i2r = e2i, i2e, r2i, i2r
        self.layout = layout
        self.name = name

    def device_train(self):
        return jnp.asarray(self.train.triples), jnp.asarray(self.train.seq)

    def host_eval(self, split, batch_size):
        """Pad split to a multiple of batch_size; returns (triples, seq,
        row_weights) NUMPY arrays — host-side consumers (the startup
        row-cap computation) must not round-trip the splits through the
        ~30 ms-latency device tunnel just to fetch them straight back."""
        data = getattr(self, split)
        n = len(data)
        m = max(1, math.ceil(n / batch_size)) * batch_size
        triples = np.zeros((m,) + data.triples.shape[1:], data.triples.dtype)
        seq = np.zeros((m,) + data.seq.shape[1:], data.seq.dtype)
        w = np.zeros((m,), np.float32)
        triples[:n] = data.triples
        seq[:n] = data.seq
        w[:n] = 1.0
        return triples, seq, w

    def device_eval(self, split, batch_size):
        """``host_eval`` placed on device."""
        triples, seq, w = self.host_eval(split, batch_size)
        return jnp.asarray(triples), jnp.asarray(seq), jnp.asarray(w)


def derive_config(config: dict, bundle: DataBundle) -> dict:
    """Reference train.py:427-438: mutate config with dataset-derived keys."""
    layout = bundle.layout
    config.update({
        "n_entities": layout.num_entities,
        "n_relations": layout.num_relations,
        "pad_eid": layout.pad_eid,
        "pad_rid": layout.pad_rid,
        "seq_len": layout.seq_len,
        "vocab_size": layout.vocab_size,
        "special_tokens": layout.special_tokens,
        "ENT_BASE": layout.ent_base,
        "REL_BASE": layout.rel_base,
        "max_edges": layout.max_edges,
        "min_edges": layout.min_edges,
        "use_padding": layout.use_padding,
    })
    return config


# ---------------------------------------------------------------------------
# Sampling + semantic verification (hot loop #2, SURVEY §3.3)
# ---------------------------------------------------------------------------

class SamplerBank:
    """Caches compiled samplers across epochs (jit caches key on function
    identity, so the sampler must be built once per run)."""

    def __init__(self, model, layout, config, chunk=512, mesh=None,
                 shard_vocab=False):
        self.model = model
        self.layout = layout
        self.config = config
        # vocab-sharded head params -> the fused sampling kernel streams
        # per-shard head slices with cross-shard merges (sample/samplers.py)
        self.shard_vocab = bool(shard_vocab)
        if self.shard_vocab and (mesh is None
                                 or "data" not in dict(mesh.shape)):
            # fail at construction (training/serving startup), not at the
            # first sampling call: the sharded fused sampler's shard_map
            # specs require a 'data' axis (size 1 is fine)
            raise ValueError("shard_vocab sampling requires a mesh with a "
                             "'data' axis (got "
                             f"{None if mesh is None else dict(mesh.shape)})")
        # fail at construction (training startup), not at the first
        # sampling eval epochs later — config files bypass CLI guards
        strat = str(config.get("fused_sample_strategy", "auto"))
        if strat not in ("auto", "gumbel", "expmin", "cdf"):
            raise ValueError("fused_sample_strategy must be 'auto', "
                             f"'gumbel', 'expmin' or 'cdf', got {strat!r}")
        sdt = config.get("fused_sample_dtype")
        if sdt is not None and str(sdt) not in ("float32", "bfloat16"):
            raise ValueError("fused_sample_dtype must be float32 or "
                             f"bfloat16, got {sdt!r}")
        for key, mult in (("fused_sample_vblock", 128),
                          ("fused_sample_rowchunk", 8)):
            val = config.get(key)
            if val is not None and (int(val) <= 0 or int(val) % mult):
                raise ValueError(f"{key} must be a positive multiple of "
                                 f"{mult}, got {val!r}")
        kc = config.get("fused_sample_kcands")
        if kc is not None and not 2 <= int(kc) <= 8:
            raise ValueError("fused_sample_kcands must be in [2, 8], "
                             f"got {kc!r}")
        self.chunk = int(config.get("sample_chunk", chunk))
        self.mesh = mesh
        if mesh is not None:
            # the generation batch must divide the data axis
            nd = dict(mesh.shape).get("data", 1)
            self.chunk = ((self.chunk + nd - 1) // nd) * nd
        # optional reduced-precision decode path (params stay f32; the
        # per-step logits matmul runs in sample_dtype with f32 accumulation)
        sd = config.get("sample_dtype")
        if sd and str(sd) != str(config.get("compute_dtype", "float32")):
            from ark_tpu.models import build_model
            self.model = build_model(dict(config, compute_dtype=str(sd)),
                                     mesh=mesh)
        self._lm_sampler = None
        self._lm_multi = None
        self._latent_sampler = None
        self._latent_multi = None

    def sample_sequences(self, params, rng, target_n):
        """LM (ARK family) stochastic sampling, reference call surface
        train.py:513-532: sample=True, temperature/top_p(0.9 default)/top_k.

        All chunks run in ONE device dispatch (an on-device loop over
        chunks) with a single host fetch — through the axon tunnel each
        dispatch costs ~30-40 ms, which round 2's per-chunk host loop paid
        target_n/chunk times (docs/BENCH_NOTES.md sampler trace). The
        per-chunk rng splits mirror the host loop exactly, so the sampled
        tokens are bitwise identical to a chunk-at-a-time fetch.

        The chunk count is a DYNAMIC loop bound (lax.fori_loop into a
        buffer sized to the next power-of-two bucket), so a serving
        process cycling request sizes compiles at most log2(max_chunks)
        variants — not one per distinct target_n (round-3 VERDICT item 8);
        tokens for any given target_n are unchanged (same per-chunk rng
        stream, same sampler)."""
        return mh.fetch(
            self.sample_sequences_device(params, rng, target_n))

    def sample_sequences_device(self, params, rng, target_n):
        """``sample_sequences`` without the host fetch: returns the device
        array (jax async dispatch queues the work and returns immediately).
        Serving pipelining hook — dispatch request i+1 before fetching
        request i and the per-request tunnel fetch (~100+ ms through axon)
        overlaps device compute; tokens are bitwise those of
        ``sample_sequences`` with the same rng."""
        if self._lm_sampler is None:
            self._lm_sampler = make_sampler(
                self.model, self.layout, sample=True,
                temperature=self.config.get("temperature", 1.0),
                top_p=self.config.get("top_p", 0.9),
                top_k=self.config.get("top_k", 0), mesh=self.mesh,
                fused_strategy=self.config.get("fused_sample_strategy",
                                               "auto"),
                fused_mm_dtype=self.config.get("fused_sample_dtype"),
                fused_vblock=self.config.get("fused_sample_vblock"),
                fused_rowchunk=self.config.get("fused_sample_rowchunk"),
                fused_k_cands=self.config.get("fused_sample_kcands"),
                shard_vocab=self.shard_vocab)
            base, chunk = self._lm_sampler, self.chunk
            seq_len = self.layout.seq_len

            @functools.partial(jax.jit, static_argnums=(3,))
            def multi(params, rng, n_chunks, max_chunks):
                out = jnp.zeros((max_chunks, chunk, seq_len), jnp.int32)

                def body(i, carry):
                    r, out = carry
                    r, k = jax.random.split(r)
                    seqs = base(params, k, chunk)
                    return r, jax.lax.dynamic_update_index_in_dim(
                        out, seqs, i, 0)

                _, out = jax.lax.fori_loop(0, n_chunks, body, (rng, out))
                return out.reshape(max_chunks * chunk, -1)

            self._lm_multi = multi
        n_chunks = -(-target_n // self.chunk)
        if n_chunks == 1:
            rng, k = jax.random.split(rng)
            return self._lm_sampler(params, k, self.chunk)[:target_n]
        max_chunks = 1 << (n_chunks - 1).bit_length()  # pow2 bucket
        return self._lm_multi(params, rng, jnp.int32(n_chunks),
                              max_chunks)[:target_n]

    def sample_latent_sequences(self, params, rng, target_n):
        """SAIL family: z ~ N(0, I) -> greedy decode (beam=1, the reference's
        training-time evaluation path, ablation_study.py:682-720). Same
        one-dispatch chunk scan as sample_sequences."""
        return mh.fetch(
            self.sample_latent_sequences_device(params, rng, target_n))

    def sample_latent_sequences_device(self, params, rng, target_n):
        """``sample_latent_sequences`` without the host fetch (the VAE twin
        of ``sample_sequences_device``): returns the device array so a
        serving loop can pipeline dispatch against the per-request tunnel
        fetch. Same rng splits — tokens are bitwise the fetched variant's."""
        if self._latent_sampler is None:
            self._latent_sampler = make_sampler(self.model, self.layout,
                                                sample=False, mesh=self.mesh)
            base, chunk = self._latent_sampler, self.chunk
            d_latent = self.config["d_latent"]
            seq_len = self.layout.seq_len

            @functools.partial(jax.jit, static_argnums=(3,))
            def multi(params, rng, n_chunks, max_chunks):
                out = jnp.zeros((max_chunks, chunk, seq_len), jnp.int32)

                def body(i, carry):
                    r, out = carry
                    r, kz, ks = jax.random.split(r, 3)
                    z = jax.random.normal(kz, (chunk, d_latent))
                    seqs = base(params, ks, z)
                    return r, jax.lax.dynamic_update_index_in_dim(
                        out, seqs, i, 0)

                _, out = jax.lax.fori_loop(0, n_chunks, body, (rng, out))
                return out.reshape(max_chunks * chunk, -1)

            self._latent_multi = multi
        n_chunks = -(-target_n // self.chunk)
        if n_chunks == 1:
            rng, kz, ks = jax.random.split(rng, 3)
            z = jax.random.normal(kz, (self.chunk, self.config["d_latent"]))
            return self._latent_sampler(params, ks, z)[:target_n]
        max_chunks = 1 << (n_chunks - 1).bit_length()  # pow2 bucket
        return self._latent_multi(params, rng, jnp.int32(n_chunks),
                                  max_chunks)[:target_n]


def sample_and_evaluate(model, params, bundle, config, rng, target_n,
                        sampler_bank, title):
    """Generate target_n graphs, run semantic evaluation; returns
    (results dict with percentage keys, int graphs)."""
    layout = bundle.layout
    if model.kind == "lm":
        seqs = sampler_bank.sample_sequences(params, rng, target_n)
    else:
        seqs = sampler_bank.sample_latent_sequences(params, rng, target_n)
    graphs = seqs_to_triples_batch(seqs, layout.special_tokens,
                                   layout.ent_base, layout.rel_base)
    labels = ints_to_labels(graphs[:5], bundle.i2e, bundle.i2r, verbose=False)
    print(f"\nExample graphs ({title}):")
    for k in range(len(labels)):
        print(f"[{k}] {labels[k]}")
    # native (C++) evaluation engine when available; pure-Python otherwise —
    # exact agreement enforced by tests/test_native_verifier.py
    use_native = not os.environ.get("ARK_TPU_NO_NATIVE")
    if use_native:
        from ark_tpu.native import NativeSemanticEvaluator, native_available
        use_native = native_available()
    if use_native:
        sem = NativeSemanticEvaluator(bundle.name, graphs, bundle.train_g,
                                      bundle.e2i, bundle.r2i)
        print(f"\nSemantic evaluation – {title}:")
        sem.print_results()
    else:
        all_labels = ints_to_labels(graphs, bundle.i2e, bundle.i2r)
        verifier = get_verifier(bundle.name)
        sem = run_semantic_evaluation(all_labels, bundle.train_g, bundle.i2e,
                                      bundle.i2r, verifier, title=title)
    return sem.organized_results["results"], graphs


# ---------------------------------------------------------------------------
# The training run
# ---------------------------------------------------------------------------

# Preemption safety (TPU-native addition; the reference has no analogue —
# a preempted torch run just dies, reference train.py:564-618 saves only
# best/periodic). Cloud TPU VMs receive SIGTERM on preemption/maintenance;
# the trainer checkpoints at the next epoch boundary (the whole epoch is
# ONE compiled device dispatch and cannot be interrupted mid-flight) and
# exits cleanly. Resume via resume_from_checkpoint/checkpoint_path restores
# params, Adam moments, and the exact RNG stream. Disable with
# ``handle_preemption: false``.
_PREEMPT = threading.Event()


def request_preemption() -> None:
    """Ask a running trainer to checkpoint and stop at the next epoch
    boundary (what the SIGTERM handler calls; callable directly by
    embedding code/tests)."""
    _PREEMPT.set()


def _sigterm_to_preempt(signum, frame):
    print("[ark_tpu] SIGTERM received — will checkpoint and exit at the "
          "epoch boundary", file=sys.stderr, flush=True)
    _PREEMPT.set()


def run_training(config: dict, checkpoint_dir: str, run) -> dict:
    """Executes the full reference training protocol; returns final metrics."""
    model_type = config.get("model_type", "ARK")
    config["model_type"] = model_type
    is_vae = model_type in ("SAIL", "t-SAIL")

    if config.get("use_test_for_final_eval", False):
        warnings.warn(
            "Test set evaluation ENABLED! Only use for final evaluation, "
            "NOT for hyperparameter tuning!", UserWarning, stacklevel=2)

    bundle = DataBundle(config)
    config = derive_config(config, bundle)
    # Pad the embedding/head vocab dimension to a lane-aligned multiple by
    # default (TPU tiling + the fused kernels' divisibility; logits are
    # sliced back so the math matches the unpadded model — models/api.py).
    # Big vocabs pad to 1024 (serves both the fused-CE 512 tiles and the
    # fused sampler's preferred 1024 tile, ops/pallas/sample_step.pick_vblock
    # — <=1023 pad rows is noise at 59k vocab); small vocabs stay at 128
    # (padding syn-paths' 55-token vocab to 1024 would 8x the head matmul).
    # Recorded into the saved config so checkpoints round-trip exactly.
    config.setdefault("vocab_pad_multiple",
                      1024 if bundle.layout.vocab_size >= 8192 else 128)
    layout = bundle.layout
    if len(bundle.train) < int(config["batch_size"]):
        # the epoch scan drops the last partial batch (reference DataLoader
        # drop_last semantics): a split smaller than one batch would scan
        # ZERO batches and "train" to NaN metrics without ever erroring
        raise ValueError(
            f"train split has {len(bundle.train)} graphs < batch_size "
            f"{config['batch_size']} — no full batch to train on; lower "
            "batch_size")
    print(f"Dataset: {bundle.name}")
    print(f"Entities: {layout.num_entities}, Relations: {layout.num_relations}, "
          f"vocab: {layout.vocab_size}, seq_len: {layout.seq_len}")

    # -------- device mesh: auto data-parallel over all local devices -------
    # (the reference has no distributed machinery, SURVEY §2 rows P-1..P-3;
    # this is the TPU-native addition: one GSPMD-partitioned program, batch
    # over 'data', optionally vocab over 'model' with shard_vocab: true)
    mesh = None
    shard_vocab = False
    n_dev = jax.device_count()
    if n_dev > 1 and str(config.get("mesh", "auto")) != "off":
        from ark_tpu.parallel import make_mesh
        axes = dict(config.get("mesh_axes") or {"data": n_dev})
        shard_vocab = bool(config.get("shard_vocab", False)) and "model" in axes
        if "data" not in axes:
            # fail at startup, not at the first-epoch compile minutes in:
            # the trainer's batch/state sharding constraints build
            # P('data', ...) specs, and the vocab-sharded kernels' shard_map
            # specs / per-data-shard seed decorrelation also require the
            # axis (size 1 is fine)
            raise ValueError(
                "mesh_axes requires a 'data' axis (use e.g. "
                f"{{'data': 1, 'model': {axes.get('model')}}}); got {axes}")
        if int(config["batch_size"]) % int(axes.get("data", 1)) == 0:
            mesh = make_mesh(axes)
            print(f"Device mesh: {axes} over {n_dev} devices"
                  + (" (vocab-sharded embedding/head)" if shard_vocab else ""))
        else:
            # the single-device fallback must drop shard_vocab too, or
            # SamplerBank's fail-fast check (mesh=None + shard_vocab) turns
            # the promised fallback into a startup crash
            shard_vocab = False
            warnings.warn(
                f"batch_size {config['batch_size']} not divisible by the "
                f"'data' mesh axis {axes.get('data')}; training single-device",
                UserWarning, stacklevel=2)

    model = build_model(config, mesh=mesh)
    print(f"Using model: {model_type}")
    rng = jax.random.key(int(config.get("seed", 0)))
    rng, k_init = jax.random.split(rng)
    state = create_train_state(model, k_init)

    start_epoch = 0
    best_val_loss = float("inf")
    best_validity = float("-inf")
    resumed_comp_bits = 1e12
    # functional resume (reference declares but never reads these keys)
    if config.get("resume_from_checkpoint") and config.get("checkpoint_path"):
        path = config["checkpoint_path"]
        if os.path.exists(path):
            ckpt = load_checkpoint(path)
            if ckpt.get("optimizer_state_dict") is None:
                # reference torch checkpoints carry no convertible
                # optimizer state (utils/torch_interop.py): resume the
                # weights with FRESH Adam moments rather than crashing at
                # first-epoch trace time inside optax
                warnings.warn(
                    f"{path} has no optimizer state (torch-format "
                    "checkpoint?); resuming weights with a fresh "
                    "optimizer", UserWarning, stacklevel=2)
                from ark_tpu.train.state import adam_tx, resolve_adam_dtypes
                params = to_device_tree(ckpt["model_state_dict"])
                state = TrainState(params, adam_tx(
                    None, *resolve_adam_dtypes(config)).init(params))
            else:
                from ark_tpu.train.state import adam_tx, resolve_adam_dtypes
                params = to_device_tree(ckpt["model_state_dict"])
                # moment dtypes follow THIS run's resolved config, not the
                # checkpoint's (the TPU auto bf16-m default means a ckpt
                # written on one backend may carry different moment dtypes
                # than this backend resolves to; the epoch scan's carry
                # dtype must match the optimizer's stored dtype)
                tmpl = adam_tx(None, *resolve_adam_dtypes(config)).init(params)
                opt = jax.tree.map(
                    lambda t, x: jnp.asarray(x, t.dtype), tmpl,
                    to_device_tree(ckpt["optimizer_state_dict"]))
                state = TrainState(params, opt)
            # bare torch state_dicts may carry no epoch (torch_interop
            # fills None) — resume from 0 rather than int(None) crashing
            start_epoch = int(ckpt.get("epoch") or 0)
            best_val_loss = float(ckpt.get("best_val_loss",
                                           ckpt.get("val_loss", float("inf"))))
            resumed_comp_bits = float(ckpt.get("best_comp_bits", 1e12))
            best_validity = float(ckpt.get("best_validity", float("-inf")))
            if ckpt.get("rng_state") is not None:
                # continue the exact RNG stream (sampling/augmentation/z
                # draws match an uninterrupted run)
                rng = jax.random.wrap_key_data(jnp.asarray(ckpt["rng_state"]))
            print(f"Resumed from {path} at epoch {start_epoch}")

    if mesh is not None:
        from ark_tpu.parallel import place_state, replicate
        shard_opt = bool(config.get("shard_opt_state", False))
        state = place_state(state, mesh, shard_vocab, shard_opt=shard_opt)
        if shard_opt:
            print("ZeRO-1: Adam moments sharded over the 'data' axis "
                  "(shard_opt_state: true)")

        def _repl(arrs):
            return replicate(arrs, mesh)
    else:
        def _repl(arrs):
            return arrs

    # static live-row bounds for the fused-CE row-skipping path
    # (ops/losses.compute_ce_row_cap): on padded datasets ~40% of
    # teacher-forcing rows are PAD; the kernel never sees them. Exact —
    # the bound is the max over the actual (deterministic) batches.
    if "ce_row_cap" not in config:
        from ark_tpu.ops.losses import compute_ce_row_cap

        n_shards = 1 if mesh is None else dict(mesh.shape).get("data", 1)
        pad = layout.special_tokens["PAD"]
        config["ce_row_cap"] = compute_ce_row_cap(
            bundle.train.seq, pad, config["batch_size"],
            shuffle=bool(config.get("shuffle_train", False)),
            n_shards=n_shards)
        # the same eval_epoch_fn serves the per-epoch val pass AND the
        # final evaluation (test split) — bound over both
        caps = []
        for split in ("val", "test"):
            # host_eval, NOT device_eval: the cap is pure numpy — pushing
            # both splits through the tunnel to fetch them right back
            # wasted two multi-MB round-trips per startup
            _, eseq, ew = bundle.host_eval(split, config["batch_size"])
            caps.append(compute_ce_row_cap(eseq, pad,
                                           config["batch_size"],
                                           row_weights=ew,
                                           n_shards=n_shards))
        config["ce_row_cap_eval"] = 0 if 0 in caps else max(caps)

    train_epoch_fn, eval_epoch_fn = make_epoch_fns(model, layout, config,
                                                   mesh=mesh,
                                                   shard_vocab=shard_vocab)
    if mesh is not None:
        # host arrays straight onto the mesh: device_put(numpy, global
        # sharding) is the one placement that also works when the mesh
        # spans processes (multi-host) — a local jnp.asarray first would
        # commit to one device and not transfer out
        train_triples, train_seq = _repl((bundle.train.triples,
                                          bundle.train.seq))
        val_triples, val_seq, val_w = _repl(
            bundle.host_eval("val", config["batch_size"]))
    else:
        train_triples, train_seq = bundle.device_train()
        val_triples, val_seq, val_w = bundle.device_eval(
            "val", config["batch_size"])
    sampler_bank = SamplerBank(model, layout, config, mesh=mesh,
                               shard_vocab=shard_vocab)

    best_comp_bits = resumed_comp_bits
    run.log({"objective": best_comp_bits})

    num_epochs = int(config["num_epochs"])
    verify_every = int(config.get("verify_every", 10))
    save_every = int(config.get("save_every", 10))
    comp_every = int(config.get("compression_log_every", 5))
    sample_frac = float(config.get("sample_frac", 0.1))
    # the reference defaults 1000 for ARK/t-ARK but 10000 for the VAE
    # family at BOTH periodic and final verification (ablation_study.py:
    # 255,299,641,684 — the family branches read different defaults)
    target_n = int(config.get("num_generated_latent_graphs",
                              10000 if model.kind == "vae" else 1000))

    timer = PhaseTimer()
    vocabs = {"e2i": bundle.e2i, "i2e": bundle.i2e,
              "r2i": bundle.r2i, "i2r": bundle.i2r}
    dataset_meta = {"dataset": bundle.name, "n_entities": len(bundle.i2e),
                    "n_relations": len(bundle.i2r)}

    # async_checkpointing (default off): the device→host state fetch —
    # the dominant save cost through a remote-TPU tunnel — runs on a
    # background writer thread, overlapping the next epoch's device
    # compute (utils/checkpoint.AsyncCheckpointWriter; same files, same
    # bytes, drained before the trainer returns)
    ckpt_writer = (AsyncCheckpointWriter()
                   if config.get("async_checkpointing", False) else None)

    # checkpoint_sharded (default off): each host writes only its
    # addressable shards + the primary writes metadata — no cross-host
    # all-gather, no full state through host 0 (the save cost that grows
    # with pod size; utils/checkpoint.save_checkpoint_sharded). Collective
    # barriers inside → synchronous by design (async_checkpointing would
    # add nothing: the local-shard fetch is already 1/n_hosts the bytes).
    ckpt_sharded = bool(config.get("checkpoint_sharded", False))
    if ckpt_sharded and ckpt_writer is not None:
        warnings.warn("checkpoint_sharded ignores async_checkpointing "
                      "(sharded saves are synchronous by design)",
                      UserWarning, stacklevel=2)

    def _ckpt(path, epoch, val_loss):
        sched_state = ({"last_epoch": epoch}
                       if config.get("lr_scheduler", False) else None)
        if ckpt_sharded:
            save_checkpoint_sharded(
                path, epoch=epoch, params=state.params,
                opt_state=state.opt_state, scheduler_state=sched_state,
                val_loss=val_loss, config=config, vocabs=vocabs,
                dataset_meta=dataset_meta,
                extras={
                    "rng_state": np.asarray(jax.random.key_data(rng)),
                    "best_comp_bits": float(best_comp_bits),
                    "best_val_loss": float(best_val_loss),
                    "best_validity": float(best_validity),
                })
            return
        params_v, opt_v = state.params, state.opt_state
        if mh.process_count() > 1:
            # multi-host: fetching cross-host-sharded state (ZeRO-1 /
            # vocab-sharded leaves) is a COLLECTIVE — run it on the main
            # thread of EVERY process (identical call order), then only
            # the primary touches disk. Single-process runs keep the
            # device arrays so the async writer overlaps the fetch.
            params_v = mh.fetch_tree(params_v)
            opt_v = mh.fetch_tree(opt_v)
            if not mh.is_primary():
                return
        kwargs = dict(epoch=epoch, params=params_v,
                      opt_state=opt_v, scheduler_state=sched_state,
                      val_loss=val_loss, config=config, vocabs=vocabs,
                      dataset_meta=dataset_meta,
                      extras={
                          # resume continuity (ADVICE r1): the post-split
                          # rng of the NEXT epoch, best-so-far objective
                          "rng_state": np.asarray(jax.random.key_data(rng)),
                          "best_comp_bits": float(best_comp_bits),
                          "best_val_loss": float(best_val_loss),
                          "best_validity": float(best_validity),
                      })
        if ckpt_writer is not None:
            # the NEXT epoch's train step DONATES the state buffers
            # (steps.py jit donate_argnums), which deletes them under the
            # background writer's feet — a fetch that loses the race dies
            # with "Array has been deleted". Snapshot device copies (an
            # async HBM copy, ~3x model bytes, dispatched without blocking
            # the host): copies are never donated, so the overlapped fetch
            # is race-free.
            kwargs["params"] = jax.tree.map(jnp.copy, kwargs["params"])
            kwargs["opt_state"] = jax.tree.map(jnp.copy,
                                               kwargs["opt_state"])
            ckpt_writer.submit(path, **kwargs)
        else:
            save_checkpoint(path, **kwargs)

    preempt_safe = bool(config.get("handle_preemption", True))
    # wall-clock budget (default off): jobs on time-boxed reservations
    # checkpoint and exit cleanly via the same preemption path instead of
    # being killed mid-run. Host clocks differ — the job-wide stop
    # decision is the collective any_flag below.
    run_budget_s = float(config.get("max_run_seconds", 0) or 0)
    t_start = time.monotonic()  # a duration: immune to NTP clock steps
    _sig_installed = False
    _sig_prev = None
    if preempt_safe:
        _PREEMPT.clear()
        try:
            _sig_prev = signal.signal(signal.SIGTERM, _sigterm_to_preempt)
            _sig_installed = True
        except ValueError:
            pass  # not the main thread: request_preemption() still works

    def _restore_sigterm():
        nonlocal _sig_installed
        if _sig_installed:
            signal.signal(signal.SIGTERM,
                          _sig_prev if _sig_prev is not None else signal.SIG_DFL)
            _sig_installed = False

    # tqdm progress over epochs (reference train.py:42,91 wraps its batch
    # loop; here a whole epoch is ONE device dispatch, so the epoch is the
    # natural progress unit). "auto" shows the bar only on a tty so logs
    # stay clean; config key `progress: true|false|auto`.
    prog = None
    _p = config.get("progress", "auto")
    if _p is True or (_p == "auto" and sys.stderr.isatty()):
        try:
            from tqdm import tqdm
            prog = tqdm(total=num_epochs, initial=start_epoch, unit="ep",
                        desc=f"{config['dataset']} {config['model_type']}",
                        dynamic_ncols=True)
        except ImportError:
            prog = None

    for epoch in range(start_epoch, num_epochs):
        print(f"\nEpoch {epoch + 1}/{num_epochs}")
        lr = lr_for_epoch(config, epoch)
        b = beta_for_epoch(config, epoch, annealed=is_vae)

        rng, k_train, k_val, k_comp, k_sample = jax.random.split(rng, 5)
        with maybe_trace(config, epoch), timer.phase("train_epoch"):
            state, train_m = train_epoch_fn(state, train_triples, train_seq,
                                            k_train, lr, b)
            train_m = {k: float(mh.fetch(v)) for k, v in train_m.items()}
        with timer.phase("validate"):
            val_m = eval_epoch_fn(state.params, val_triples, val_seq, val_w,
                                  k_val, b)
            val_m = {k: float(mh.fetch(v)) for k, v in val_m.items()}
        train_loss = float(train_m["loss"])
        train_recon = float(train_m["reconstruction_loss"])
        train_kl = float(train_m["kl_loss"])
        val_loss = float(val_m["loss"])
        val_recon = float(val_m["reconstruction_loss"])
        val_kl = float(val_m["kl_loss"])

        do_comp = (epoch + 1) % comp_every == 0
        if do_comp:
            with timer.phase("compression"):
                stats = posterior_bits(model, state.params, bundle.val, layout,
                                       sample_frac=sample_frac, rng=k_comp,
                                       mesh=mesh, shard_vocab=shard_vocab)
            print("\n[Posterior Compression on Validation Set]")
            print(f" Avg total bits: {stats['avg_total_bits']:.2f}")
            print(f" Avg AR bits:    {stats['avg_ar_bits']:.2f}")
            run.log({
                "val/compression_bits": stats["avg_total_bits"],
                "val/compression_kl_bits": stats["avg_kl_bits"],
                "val/compression_edge_bits": stats["avg_ar_bits"],
                "val/compression_entity_bits": stats["avg_ar_bits"],
            })
            vcb = float(stats["avg_total_bits"])
            if math.isfinite(vcb) and vcb < best_comp_bits:
                best_comp_bits = vcb
        run.log({"objective": best_comp_bits})

        log_dict = {
            "epoch": epoch + 1,
            "train/loss": train_loss,
            "train/reconstruction_loss": train_recon,
            "val/loss": val_loss,
            "val/reconstruction_loss": val_recon,
            "learning_rate": lr,
        }
        if is_vae:
            log_dict["train/kl_loss"] = train_kl
            log_dict["val/kl_loss"] = val_kl

        if (epoch + 1) % verify_every == 0:
            title = ("graphs from random latent" if is_vae
                     else "decoder-only samples")
            with timer.phase("sample_verify"):
                res, graphs = sample_and_evaluate(model, state.params, bundle,
                                                  config, k_sample, target_n,
                                                  sampler_bank, title)
            prefix = "latent_" if is_vae else ""
            run.log({
                f"verification/{prefix}validity_rate": res.get("semantics", 0.0) / 100.0,
                f"verification/{prefix}novelty_rate": res.get("novel", 0.0) / 100.0,
                f"verification/{prefix}valid_novelty_rate": res.get("novel_semantics", 0.0) / 100.0,
            })
            # opt-in best-VALIDITY checkpoint (deliberate extension, default
            # off = reference behavior, which saves only best-val-loss +
            # periodic, reference train.py:564-618): docs/QUALITY.md shows
            # best-val-loss and best-validity diverge by 10-50 points on
            # wd-articles (val loss bottoms at epoch 1-6, semantic validity
            # peaks ~epoch 25), so without this the empirically best model
            # is only on disk if save_every happens to align.
            if config.get("track_best_validity", False):
                validity = float(res.get("semantics", 0.0))
                if validity > best_validity:
                    best_validity = validity
                    _ckpt(os.path.join(
                        checkpoint_dir,
                        f"{bundle.name}_{model_type}_best_validity.pt"),
                        epoch + 1, val_loss)
                    print(f"Saved best-validity model "
                          f"({validity:.2f}% valid at epoch {epoch + 1})")
            if is_vae:
                uniq = {canonical_graph_string(g) for g in graphs}
                run.log({"diversity/unique_graphs": len(uniq),
                         "diversity/ratio": len(uniq) / max(1, len(graphs))})
            print(f"Verification — validity: {res.get('semantics', 0.0):.2f}% | "
                  f"novelty: {res.get('novel', 0.0):.2f}% | "
                  f"valid&novel: {res.get('novel_semantics', 0.0):.2f}%")

        log_dict.update(timer.metrics())
        run.log(log_dict)
        if is_vae:
            print(f"Train Loss: {train_loss:.4f} (Recon: {train_recon:.4f}, KL: {train_kl:.4f})")
            print(f"Val   Loss: {val_loss:.4f} (Recon: {val_recon:.4f}, KL: {val_kl:.4f})")
        else:
            print(f"Train Loss: {train_loss:.4f} (Recon: {train_recon:.4f})")
            print(f"Val   Loss: {val_loss:.4f} (Recon: {val_recon:.4f})")

        if val_loss < best_val_loss:
            best_val_loss = val_loss
            _ckpt(os.path.join(checkpoint_dir,
                               f"{bundle.name}_{model_type}_best_model.pt"),
                  epoch + 1, val_loss)
            print(f"Saved best model with validation loss: {val_loss:.4f}")
        if (epoch + 1) % save_every == 0:
            _ckpt(os.path.join(
                checkpoint_dir,
                f"{bundle.name}_{model_type}_checkpoint_epoch_{epoch + 1}.pt"),
                epoch + 1, val_loss)
            # keep_checkpoints: N (default 0 = keep all, reference
            # behavior): prune periodic checkpoints beyond the newest N —
            # a week-long run at save_every 10 otherwise accumulates
            # hundreds of multi-GB files. best/best-validity/preempt
            # checkpoints are never pruned. Under async_checkpointing the
            # prune runs on the writer thread AFTER the queued saves land
            # (a glob on the main thread would miss in-flight files and
            # could delete one a queued save is about to re-create).
            keep = int(config.get("keep_checkpoints", 0) or 0)
            if keep > 0 and mh.is_primary():
                def _prune(keep=keep):
                    import glob
                    import re
                    import shutil

                    pat = os.path.join(
                        checkpoint_dir,
                        f"{bundle.name}_{model_type}_checkpoint_epoch_*.pt")
                    def _ep(p):
                        mobj = re.search(r"_epoch_(\d+)\.pt$", p)
                        return int(mobj.group(1)) if mobj else -1
                    for old in sorted(glob.glob(pat), key=_ep)[:-keep]:
                        try:
                            os.remove(old)
                        except OSError:
                            pass
                        shutil.rmtree(old + ".shards", ignore_errors=True)
                if ckpt_writer is not None and not ckpt_sharded:
                    ckpt_writer.submit_task(_prune)
                else:
                    _prune()
        # preemption (SIGTERM) and the wall-clock budget are PROCESS-LOCAL
        # signals; in a multi-host run the stop decision must be job-wide
        # or the stopping process would issue _ckpt's collectives while
        # the others enter the next epoch's — mismatched collective order
        # deadlocks the slice. any_flag is a collective OR, called
        # unconditionally every epoch by every participating process.
        preempt_now = ((preempt_safe and _PREEMPT.is_set())
                       or (run_budget_s > 0
                           and time.monotonic() - t_start >= run_budget_s))
        if (preempt_safe or run_budget_s > 0) and mh.process_count() > 1:
            preempt_now = mh.any_flag(preempt_now)
        if preempt_now:
            p_path = os.path.join(checkpoint_dir,
                                  f"{bundle.name}_{model_type}_preempt.pt")
            _ckpt(p_path, epoch + 1, val_loss)
            print(f"Preemption: saved {p_path} at epoch {epoch + 1}/"
                  f"{num_epochs}; resume with resume_from_checkpoint: true, "
                  f"checkpoint_path: {p_path}")
            if prog is not None:
                prog.close()
            _restore_sigterm()
            if ckpt_writer is not None:
                ckpt_writer.close()
            preempt_metrics = {"preempted_at_epoch": float(epoch + 1)}
            run.log(preempt_metrics)
            return preempt_metrics
        if prog is not None:
            prog.set_postfix(train=f"{train_loss:.3f}", val=f"{val_loss:.3f}",
                             best=f"{best_val_loss:.3f}")
            prog.update(1)

    if prog is not None:
        prog.close()
    _restore_sigterm()
    if ckpt_writer is not None:
        # every checkpoint on disk before final eval (post-run tooling —
        # conditioned/evaluate/export — reads best_model.pt immediately)
        ckpt_writer.close()
    # ------------------------- final validation ----------------------------
    final_metrics = final_validation(model, state, bundle, config, run, rng,
                                     sampler_bank, eval_epoch_fn, mesh=mesh,
                                     shard_vocab=shard_vocab)
    run.log(final_metrics)
    return final_metrics


def final_validation(model, state, bundle, config, run, rng, sampler_bank,
                     eval_epoch_fn, mesh=None, shard_vocab=False):
    """Reference final_validation (train.py:132-239): eval-set loss +
    compression + sampled-graph semantic evaluation."""
    use_test = config.get("use_test_for_final_eval", False)
    eval_set_name = "test" if use_test else "validation"
    split = "test" if use_test else "val"
    print(f"\n{'=' * 50}\nFinal evaluation on {eval_set_name} set...")
    if use_test:
        warnings.warn("Using TEST SET for final evaluation", UserWarning)

    is_vae = model.kind == "vae"
    b = 1.0
    layout = bundle.layout
    rng, k_eval, k_comp, k_sample = jax.random.split(rng, 4)
    if mesh is not None:
        from ark_tpu.parallel import replicate
        # host arrays straight onto the (possibly multi-host) mesh
        triples, seq, w = replicate(
            bundle.host_eval(split, config["batch_size"]), mesh)
    else:
        triples, seq, w = bundle.device_eval(split, config["batch_size"])
    m = eval_epoch_fn(state.params, triples, seq, w, k_eval, b)
    m = {k: float(mh.fetch(v)) for k, v in m.items()}
    stats = posterior_bits(model, state.params, getattr(bundle, split), layout,
                           sample_frac=float(config.get("sample_frac", 0.1)),
                           rng=k_comp, mesh=mesh, shard_vocab=shard_vocab)

    log_dict = {
        f"final_{eval_set_name}/loss": float(m["loss"]),
        f"final_{eval_set_name}/reconstruction_loss": float(m["reconstruction_loss"]),
        f"final_{eval_set_name}/kl_loss": float(m["kl_loss"]),
        f"final_{eval_set_name}/entity_loss": 0.0,
        f"final_{eval_set_name}/compression_bits": stats["avg_total_bits"],
        f"final_{eval_set_name}/compression_kl_bits": stats["avg_kl_bits"],
        f"final_{eval_set_name}/compression_edge_bits": stats["avg_ar_bits"],
        f"final_{eval_set_name}/compression_entity_bits": stats["avg_ar_bits"],
    }
    print(f"Final compression: {stats['avg_total_bits']:.2f} bits/graph")

    # family-dependent reference default (ablation_study.py:255,299)
    target_n = int(config.get("num_generated_latent_graphs",
                              10000 if is_vae else 1000))
    title = "graphs from random latent" if is_vae else "ARK samples"
    res, graphs = sample_and_evaluate(model, state.params, bundle, config,
                                      k_sample, target_n, sampler_bank, title)
    prefix = "latent_" if is_vae else ""
    log_dict.update({
        f"final_{eval_set_name}/{prefix}validity_rate": res.get("semantics", 0.0) / 100.0,
        f"final_{eval_set_name}/{prefix}novelty_rate": res.get("novel", 0.0) / 100.0,
        f"final_{eval_set_name}/{prefix}valid_novelty_rate": res.get("novel_semantics", 0.0) / 100.0,
    })
    if is_vae:
        uniq = {canonical_graph_string(g) for g in graphs}
        run.log({"diversity/unique_graphs": len(uniq),
                 "diversity/ratio": len(uniq) / max(1, len(graphs))})
    print(f"Final {eval_set_name} — validity: {res.get('semantics', 0.0):.2f}% | "
          f"novelty: {res.get('novel', 0.0):.2f}% | "
          f"valid&novel: {res.get('novel_semantics', 0.0):.2f}%")
    print("=" * 50)
    return log_dict
