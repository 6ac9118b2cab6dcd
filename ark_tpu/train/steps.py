"""Fused jit training/evaluation steps and whole-epoch device scans.

The reference's hot loop (SURVEY §3.2) does one optimizer step per host
iteration with a D->H ``.item()`` sync per batch (reference train.py:42-63).
Here the entire epoch is a single compiled ``lax.scan``: the full training
split lives in device HBM (the largest split, wd-articles, is ~17 MB of
int32), batches are gathered on device, the per-graph triple-permutation
augmentation runs on device, and metrics come back as one small array per
epoch. One host->device call per epoch.

Loss (reference train.py:46-58, ablation_study.py:59-73):
    lm:  CE(logits(seq[:, :-1]), seq[:, 1:], ignore PAD)
    vae: CE + beta * KL(mu, logv)
Optimizer: Adam (scale_by_adam), lr applied as a runtime scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ark_tpu.models.api import Model
from ark_tpu.ops.losses import (kl_free_bits_weighted, kl_mean_weighted,
                                masked_cross_entropy)
from ark_tpu.train.state import TrainState, adam_tx


def build_seq_from_triples(triples, ent_base, rel_base, bos, eos):
    """Vectorized triples->sequence for constant-edge-count graphs (the only
    case where permutation augmentation applies; SURVEY quirk Q-5)."""
    b, k, _ = triples.shape
    body = jnp.stack(
        [triples[:, :, 0] + ent_base,
         triples[:, :, 1] + rel_base,
         triples[:, :, 2] + ent_base], axis=-1).reshape(b, 3 * k)
    bos_col = jnp.full((b, 1), bos, body.dtype)
    eos_col = jnp.full((b, 1), eos, body.dtype)
    return jnp.concatenate([bos_col, body, eos_col], axis=1)


def permute_triples_device(triples, rng):
    """Random per-graph permutation of the triples axis (reference
    utils.py:133-134 ``random.sample``), vectorized with argsort-of-uniforms."""
    b, k, _ = triples.shape
    order = jnp.argsort(jax.random.uniform(rng, (b, k)), axis=1)
    return jnp.take_along_axis(triples, order[:, :, None], axis=1)


def _flag(config, key) -> bool:
    """Kernel flags default to 'auto': enabled on TPU, off on CPU (Pallas
    kernels only run compiled there; tests exercise them in interpret mode)."""
    v = config.get(key, "auto")
    if v == "auto":
        return jax.default_backend() not in ("cpu",)
    return bool(v)


def _data_size(mesh) -> int:
    return 1 if mesh is None else dict(mesh.shape).get("data", 1)


def _batch_constrainer(mesh):
    """Pin the leading (batch) axis of arrays to the mesh's 'data' axis
    inside jit (GSPMD otherwise only sees input shardings, which the epoch
    scan's on-device gathers erase)."""
    if mesh is None:
        return lambda x: x

    def constrain(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def _state_constrainer(config, mesh, shard_vocab):
    """ZeRO-1 pin (``shard_opt_state: true``): inside jit, constrain the
    post-update optimizer state to its data-sharded layout and the params
    to their (replicated / vocab-sharded) layout. Without the pin, GSPMD is
    free to propagate the moments' 'data' sharding into the updated params
    — which would re-all-gather them at every use next step instead of
    once after the update — or to replicate the moments and erase the
    ZeRO-1 saving inside the epoch scan's carry. Identity when the flag is
    off (parallel/mesh.opt_leaf_sharding documents the layout)."""
    if mesh is None or not (config or {}).get("shard_opt_state"):
        return lambda state: state
    from ark_tpu.parallel.mesh import opt_leaf_sharding, param_shardings

    def constrain(state: TrainState) -> TrainState:
        params = jax.tree.map(
            jax.lax.with_sharding_constraint, state.params,
            param_shardings(state.params, mesh, shard_vocab))
        opt_state = jax.tree_util.tree_map_with_path(
            lambda path, x: jax.lax.with_sharding_constraint(
                x, opt_leaf_sharding(jax.tree_util.keystr(path),
                                     jnp.shape(x), mesh, shard_vocab, True)),
            state.opt_state)
        return TrainState(params, opt_state)

    return constrain


def _use_fused_ce(model: Model, config, mesh=None, shard_vocab=False,
                  backend_ok=None) -> bool:
    """The Pallas fused logits+CE kernel applies when requested (or 'auto'
    on TPU), the model exposes head hooks, and the (per data-shard, per
    vocab-shard) shapes meet the kernel constraints. With ``shard_vocab``
    the kernel runs per vocab shard with a cross-shard logsumexp merge
    (ops/pallas/logit_ce._fused_ce_sums_sharded) — the north-star
    vocab-sharded wd-articles geometry keeps the fused path.

    ``backend_ok``: override the backend gate (None = the config flag's
    'auto' resolution) — lets callers ask "would the plumbing select the
    kernel on TPU?" from a CPU dryrun."""
    flag_ok = _flag(config, "use_fused_ce") if backend_ok is None else (
        backend_ok and config.get("use_fused_ce", "auto") is not False)
    if not flag_ok or model.features is None or model.head is None:
        return False
    from ark_tpu.ops.pallas.logit_ce import supported

    bs = int(config["batch_size"])
    nd = _data_size(mesh)
    if bs % nd != 0:
        return False
    l = int(config["seq_len"]) - 1
    d = int(config["d_model"])
    mult = int(config.get("vocab_pad_multiple", 1))
    vp = ((config["vocab_size"] + mult - 1) // mult) * mult
    if shard_vocab:
        nm = 1 if mesh is None else dict(mesh.shape).get("model", 1)
        if nm <= 1 or vp % nm != 0:
            return False
        vp //= nm
    return supported((bs // nd) * l, d, vp)


def _make_fused_ce(model: Model, pad_id: int, config, mesh, cap_key,
                   shard_vocab=False):
    """Closure over the fused logits+CE kernel (ops/pallas/logit_ce.py).

    ``cap_key`` selects the static live-row bound for this data stream
    ('ce_row_cap' for train batches, 'ce_row_cap_eval' for eval batches —
    see ops/losses.compute_ce_row_cap): PAD rows beyond the bound never
    enter the kernel, cutting its row x vocab cost by the data's padding
    fraction with exact results."""
    from ark_tpu.ops.pallas.logit_ce import fused_masked_cross_entropy

    v_true = int(config["vocab_size"])
    mm_dtype = jnp.dtype(config.get("fused_ce_dtype", "float32"))
    row_cap = int(config.get(cap_key, 0) or 0)

    def fused_ce(params, y, targets, row_weights):
        w, b = model.head(params)
        if row_weights is not None:
            # row_weights are 0/1 ragged-batch masks (train/loop.py);
            # rows with weight 0 become all-PAD targets, which the
            # kernel's PAD mask then excludes — same math as the XLA
            # path's mask multiply.
            targets = jnp.where(row_weights[:, None] > 0, targets, pad_id)
        return fused_masked_cross_entropy(y, w, b, targets, pad_id,
                                          v_true=v_true, mm_dtype=mm_dtype,
                                          mesh=mesh, row_cap=row_cap,
                                          shard_vocab=shard_vocab)

    return fused_ce


def _make_adam_apply(config, mesh):
    """(state, grads, lr) -> TrainState.

    The fused Pallas optimizer (ops/pallas/adam.py: one HBM pass per leaf
    instead of XLA's three sweeps) engages on 'auto' on TPU for the
    replicated-params layouts (mesh=None; sharded/mixed-dtype states keep
    the optax path — GSPMD owns their partitioning). Both paths are
    bit-identical (tests/test_pallas_adam.py)."""
    cfg = config or {}
    from ark_tpu.train.state import resolve_adam_dtypes
    m_dt, v_dt = resolve_adam_dtypes(cfg)
    tx = adam_tx(None, m_dt, v_dt)
    # DEFAULT OFF: the fused Pallas optimizer measured SLOWER than XLA's
    # lowering of the optax path (2401 vs 4116 graphs/s on the wd-articles
    # bench config) and is not bit-identical on hardware (Mosaic contracts
    # multiply-adds differently than XLA) — the documented negative result
    # in docs/BENCH_NOTES.md. "xla" (one multi-output tree_map) is
    # bit-identical and throughput-neutral; both stay available for A/B.
    mode = cfg.get("use_fused_adam", False)
    # safety conditions for the Pallas kernel: GSPMD owns sharded states,
    # and the kernel's f32 moments can't carry a bf16 moment dtype (the
    # RESOLVED dtypes — resolve_adam_dtypes keeps the auto default at f32
    # whenever use_fused_adam is set, so the A/B knob stays functional)
    fused_ok = (mesh is None and m_dt == jnp.float32 and v_dt == jnp.float32)
    fused = bool(mode) and fused_ok
    # test-only interpret mode (CPU) rides the SAME safety conditions and
    # never overrides an explicit 'xla' selection — previously it forced
    # the Pallas path onto sharded/bf16-moment states it was excluded from
    interpret = (bool(cfg.get("fused_adam_interpret")) and fused_ok
                 and mode != "xla")
    if (fused and mode != "xla") or interpret:
        from ark_tpu.ops.pallas.adam import fused_adam_apply

        def apply(state: TrainState, grads, lr):
            params, opt_state = fused_adam_apply(
                state.params, grads, state.opt_state, lr,
                interpret=interpret)
            return TrainState(params, opt_state)
    elif fused:
        from ark_tpu.ops.pallas.adam import fused_adam_apply_xla

        def apply(state: TrainState, grads, lr):
            params, opt_state = fused_adam_apply_xla(
                state.params, grads, state.opt_state, lr)
            return TrainState(params, opt_state)
    else:
        def apply(state: TrainState, grads, lr):
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            return TrainState(params, opt_state)
    return apply


def _loss_fn(model: Model, pad_id: int, config=None, mesh=None,
             shard_vocab=False):
    # the fused kernel covers BOTH head layouts: replicated (DP — each data
    # shard streams the full head) and vocab-sharded (each device streams
    # its V/n_model slice; per-row logsumexp stats merge over 'model' —
    # round-3 VERDICT item 1). Shapes that fail the per-shard constraints
    # fall back to the XLA path (GSPMD logsumexp collectives).
    fused = (config is not None
             and _use_fused_ce(model, config, mesh, shard_vocab))
    if fused:
        fused_ce = _make_fused_ce(model, pad_id, config, mesh,
                                  cap_key="ce_row_cap",
                                  shard_vocab=shard_vocab)
    # free-bits KL floor (opt-in deviation; ops/losses.py docstring): the
    # OPTIMIZED objective's KL term is floored; the reported loss/kl
    # metrics stay the true (unfloored) ELBO terms so train/val losses
    # remain comparable to free_bits=0 runs
    free_bits = float((config or {}).get("free_bits", 0.0) or 0.0)
    if free_bits > 0.0:
        def kl_obj(mu, logv, row_weights):
            return kl_free_bits_weighted(mu, logv, free_bits, row_weights)
    else:
        kl_obj = kl_mean_weighted

    if model.kind == "lm" and fused:
        def loss(params, triples, seq, rng, beta, row_weights=None):
            del triples
            y = model.features(params, seq[:, :-1], rng=rng,
                               deterministic=rng is None)
            ce, _ = fused_ce(params, y, seq[:, 1:], row_weights)
            return ce, (ce, jnp.float32(0.0))
    elif model.kind == "lm":
        def loss(params, triples, seq, rng, beta, row_weights=None):
            del triples
            logits = model.apply(params, seq[:, :-1], rng=rng, deterministic=rng is None)
            ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id, row_weights)
            return ce, (ce, jnp.float32(0.0))
    elif fused:
        def loss(params, triples, seq, rng, beta, row_weights=None):
            rng_model, _ = jax.random.split(rng)
            y, mu, logv = model.features(params, triples, seq[:, :-1],
                                         rng=rng_model, deterministic=False)
            ce, _ = fused_ce(params, y, seq[:, 1:], row_weights)
            kl = kl_mean_weighted(mu, logv, row_weights)
            return ce + beta * kl_obj(mu, logv, row_weights), (ce, kl)

    else:
        def loss(params, triples, seq, rng, beta, row_weights=None):
            rng_model, _ = jax.random.split(rng)
            logits, mu, logv = model.apply(params, triples, seq[:, :-1],
                                           rng=rng_model,
                                           deterministic=False)
            ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id, row_weights)
            kl = kl_mean_weighted(mu, logv, row_weights)
            return ce + beta * kl_obj(mu, logv, row_weights), (ce, kl)
    return loss


def make_train_step(model: Model, pad_id: int, config=None, mesh=None,
                    shard_vocab=False):
    """Single-batch fused step: (state, triples, seq, rng, lr, beta) ->
    (state, metrics).

    With ``mesh``, the step is the SAME program partitioned by GSPMD: batch
    arrays are constrained to the 'data' axis (gradients psum over ICI come
    from the sharding annotations), optionally with the embedding/head vocab
    dimension sharded over 'model' (place the state via
    ark_tpu.parallel.place_state first). Values are identical to the
    single-device step — GSPMD partitions the computation, it does not
    change it. The model must have been built with the same mesh
    (build_model(config, mesh=mesh)) so its Pallas kernels shard_map."""
    adam_apply = _make_adam_apply(config, mesh)
    loss_fn = _loss_fn(model, pad_id, config, mesh, shard_vocab)
    constrain = _batch_constrainer(mesh)
    constrain_state = _state_constrainer(config, mesh, shard_vocab)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, triples, seq, rng, lr, beta):
        triples, seq = constrain(triples), constrain(seq)
        (loss, (ce, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, triples, seq, rng, beta)
        state = constrain_state(adam_apply(state, grads, lr))
        # metric loss = true ELBO (== the optimized value unless free_bits
        # floors the KL term; see _loss_fn)
        return state, {
            "loss": ce + beta * kl, "reconstruction_loss": ce,
            "kl_loss": kl}

    return step


def make_eval_step(model: Model, pad_id: int):
    """Single-batch eval metrics (deterministic; VAE still samples z)."""
    @jax.jit
    def step(params, triples, seq, rng, beta, row_weights):
        if model.kind == "lm":
            logits = model.apply(params, seq[:, :-1], deterministic=True)
            ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id, row_weights)
            return {"loss": ce, "reconstruction_loss": ce,
                    "kl_loss": jnp.float32(0.0)}
        logits, mu, logv = model.apply(params, triples, seq[:, :-1], rng=rng,
                                       deterministic=True)
        ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id, row_weights)
        kl = kl_mean_weighted(mu, logv, row_weights)
        return {"loss": ce + beta * kl, "reconstruction_loss": ce, "kl_loss": kl}

    return step


def make_epoch_fns(model: Model, layout, config, mesh=None,
                   shard_vocab=False):
    """Whole-epoch compiled scans.

    Returns (train_epoch, eval_epoch):
      train_epoch(state, triples_all, seq_all, rng, lr, beta) -> (state, metrics)
      eval_epoch(params, triples_all, seq_all, row_weights, rng, beta) -> metrics
    Inputs must be device arrays; train arrays' length is truncated to a
    multiple of batch_size (drop_last=True, reference train.py:369); eval
    arrays must be pre-padded to a multiple of batch_size with
    row_weights=0 on padding rows.

    With ``mesh``, each scan step's batch is constrained to the 'data' axis
    (data parallelism via GSPMD — exactly the single-device computation,
    partitioned) and, with ``shard_vocab``, the embedding/head stay sharded
    over 'model'. The full data arrays stay replicated (the largest split is
    ~17 MB; replicating beats gathering shuffled rows over ICI every step).
    The model must have been built with the same mesh and the state placed
    via ark_tpu.parallel.place_state.
    """
    pad_id = layout.special_tokens["PAD"]
    bos = layout.special_tokens["BOS"]
    eos = layout.special_tokens["EOS"]
    bs = int(config["batch_size"])
    shuffle = bool(config.get("shuffle_train", False))
    permute = bool(config.get("permute_triples", False)) and not layout.use_padding
    adam_apply = _make_adam_apply(config, mesh)
    loss_fn = _loss_fn(model, pad_id, config, mesh, shard_vocab)
    constrain = _batch_constrainer(mesh)
    constrain_state = _state_constrainer(config, mesh, shard_vocab)
    is_vae = model.kind == "vae"

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state: TrainState, triples_all, seq_all, rng, lr, beta):
        n = seq_all.shape[0]
        nb = n // bs
        rng, k_order = jax.random.split(rng)
        if shuffle:
            order = jax.random.permutation(k_order, n)
        else:
            order = jnp.arange(n)

        def body(carry, i):
            state, rng = carry
            rng, k_perm, k_drop = jax.random.split(rng, 3)
            idx = jax.lax.dynamic_slice(order, (i * bs,), (bs,))
            triples = triples_all[idx]
            if permute:
                triples = permute_triples_device(triples, k_perm)
                seq = build_seq_from_triples(
                    triples, layout.ent_base, layout.rel_base, bos, eos)
            else:
                seq = seq_all[idx]
            triples, seq = constrain(triples), constrain(seq)
            (loss, (ce, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, triples, seq, k_drop, beta)
            state = constrain_state(adam_apply(state, grads, lr))
            # metric loss = true ELBO (matches eval_epoch; free_bits floors
            # only the optimized objective)
            return (state, rng), jnp.stack([ce + beta * kl, ce, kl])

        (state, _), ms = jax.lax.scan(body, (state, rng), jnp.arange(nb))
        mean = ms.mean(axis=0)
        return state, {"loss": mean[0], "reconstruction_loss": mean[1],
                       "kl_loss": mean[2]}

    # eval through the fused kernel too (same math as the XLA logits path,
    # A/B'd identical): the XLA eval path materializes [B*L, V] logits in
    # HBM every validation batch — ~320 MB per batch on wd-articles
    eval_fused = (config is not None
                  and _use_fused_ce(model, config, mesh, shard_vocab))
    if eval_fused:
        eval_fused_ce = _make_fused_ce(model, pad_id, config, mesh,
                                       cap_key="ce_row_cap_eval",
                                       shard_vocab=shard_vocab)

    @jax.jit
    def eval_epoch(params, triples_all, seq_all, row_weights, rng, beta):
        n = seq_all.shape[0]
        nb = n // bs

        def body(rng, i):
            rng, k_perm, k = jax.random.split(rng, 3)
            sl = i * bs
            triples = jax.lax.dynamic_slice_in_dim(triples_all, sl, bs, 0)
            seq = jax.lax.dynamic_slice_in_dim(seq_all, sl, bs, 0)
            w = jax.lax.dynamic_slice_in_dim(row_weights, sl, bs, 0)
            if permute:
                # the reference's GraphSeqDataset permutes triples on EVERY
                # access, including the val/test loaders (utils.py:131-146;
                # loaders built with permute at train.py:372-408)
                triples = permute_triples_device(triples, k_perm)
                seq = build_seq_from_triples(
                    triples, layout.ent_base, layout.rel_base, bos, eos)
            triples, seq = constrain(triples), constrain(seq)
            if is_vae and eval_fused:
                y, mu, logv = model.features(params, triples, seq[:, :-1],
                                             rng=k, deterministic=True)
                ce, _ = eval_fused_ce(params, y, seq[:, 1:], w)
                kl = kl_mean_weighted(mu, logv, w)
                return rng, jnp.stack([ce + beta * kl, ce, kl])
            if is_vae:
                logits, mu, logv = model.apply(params, triples, seq[:, :-1],
                                               rng=k, deterministic=True)
                ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id, w)
                kl = kl_mean_weighted(mu, logv, w)
                return rng, jnp.stack([ce + beta * kl, ce, kl])
            if eval_fused:
                y = model.features(params, seq[:, :-1], deterministic=True)
                ce, _ = eval_fused_ce(params, y, seq[:, 1:], w)
                return rng, jnp.stack([ce, ce, jnp.float32(0.0)])
            logits = model.apply(params, seq[:, :-1], deterministic=True)
            ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id, w)
            return rng, jnp.stack([ce, ce, jnp.float32(0.0)])

        _, ms = jax.lax.scan(body, rng, jnp.arange(nb))
        mean = ms.mean(axis=0)
        return {"loss": mean[0], "reconstruction_loss": mean[1],
                "kl_loss": mean[2]}

    return train_epoch, eval_epoch
