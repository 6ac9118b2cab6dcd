"""Device-mesh parallelism: data-parallel batch sharding + vocab-sharded
embedding/logits ("tensor parallel" on the vocabulary axis).

The reference has NO distributed machinery (SURVEY §2 rows P-1..P-3: no
torch.distributed, no NCCL/MPI; only vestigial DataParallel checkpoint
unwrapping). The TPU-native equivalent specified by BASELINE.json: shard the
batch over a v5e mesh (gradients psum'd over ICI by XLA) and, for the
wd-articles vocabulary (~59k tokens), shard the token embedding table and the
tied output-projection matmul across the mesh so each chip holds V/n rows and
the cross-entropy's logsumexp runs as an XLA collective.

Axes:
  - 'data'  — batch dimension (DP)
  - 'model' — vocabulary dimension of tok_emb / output head (TP)

PP / SP / EP / context parallelism are intentionally absent: sequences are
2 + 3*max_edges tokens (tens, not thousands; reference train.py:348) and the
models are a few layers — there is nothing for pipeline/sequence/expert
parallelism to win (SURVEY §2 row P-3). Scaling is by batch and vocab.

Everything uses jit + NamedSharding (GSPMD): specify shardings, let XLA
insert the collectives (the scaling-book recipe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ark_tpu.ops.losses import kl_mean_weighted, masked_cross_entropy
from ark_tpu.train.state import TrainState, adam_tx


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """axis_sizes like {'data': 4, 'model': 2}; default: 1-D data mesh over
    all local devices."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    n_needed = int(np.prod(shape))
    if n_needed > len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {n_needed} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n_needed]).reshape(shape)
    return Mesh(arr, names)


def _is_vocab_leaf(path_str: str) -> bool:
    # "['out']" is the LM head; must not match attention's out_proj
    return "tok_emb" in path_str or "['out']" in path_str


def param_shardings(params, mesh: Mesh, shard_vocab: bool = False):
    """NamedSharding tree for the params pytree.

    Default: fully replicated. With shard_vocab and a 'model' axis, shard
    the token-embedding rows, untied head columns and head bias across
    'model' (the wd-articles big-vocab layout)."""
    has_model = shard_vocab and "model" in mesh.axis_names

    def spec(path, x) -> NamedSharding:
        pstr = jax.tree_util.keystr(path)
        if has_model and x.ndim >= 1 and _is_vocab_leaf(pstr):
            if "tok_emb" in pstr and x.ndim == 2:        # [V, d]
                return NamedSharding(mesh, P("model", None))
            if "['out']" in pstr and pstr.endswith("['w']") and x.ndim == 2:
                return NamedSharding(mesh, P(None, "model"))  # [d, V]
            if "['out']" in pstr and pstr.endswith("['b']") and x.ndim == 1:
                return NamedSharding(mesh, P("model"))        # [V]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    def make(x):
        return NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))
    return make


def make_parallel_train_step(model, layout, config, mesh: Mesh,
                             shard_vocab: bool = False):
    """A jit train step with explicit input shardings: state per
    ``param_shardings``, batch over 'data'. Gradient psum over ICI and the
    sharded-logits logsumexp collectives are inserted by XLA from the
    sharding annotations.

    Returns (step, place_state, place_batch):
      step(state, triples, seq, rng, lr, beta) -> (state, metrics)
      place_state(state) / place_batch(arr) put inputs on the mesh."""
    pad_id = layout.special_tokens["PAD"]
    tx = adam_tx()
    is_vae = model.kind == "vae"

    def loss_fn(params, triples, seq, rng, beta):
        if is_vae:
            logits, mu, logv = model.apply(params, triples, seq[:, :-1],
                                           rng=rng, deterministic=False)
            ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id)
            kl = kl_mean_weighted(mu, logv)
            return ce + beta * kl, (ce, kl)
        logits = model.apply(params, seq[:, :-1], rng=rng, deterministic=False)
        ce, _ = masked_cross_entropy(logits, seq[:, 1:], pad_id)
        return ce, (ce, jnp.float32(0.0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, triples, seq, rng, lr, beta):
        (loss, (ce, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, triples, seq, rng, beta)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params, opt_state), {
            "loss": loss, "reconstruction_loss": ce, "kl_loss": kl}

    p_shard = None

    def place_state(state: TrainState) -> TrainState:
        nonlocal p_shard
        p_shard = param_shardings(state.params, mesh, shard_vocab)
        params = jax.device_put(state.params, p_shard)
        o_shard = param_shardings(state.opt_state, mesh, shard_vocab)
        opt_state = jax.device_put(state.opt_state, o_shard)
        return TrainState(params, opt_state)

    def place_batch(arr):
        return jax.device_put(jnp.asarray(arr), batch_sharding(mesh)(arr))

    return step, place_state, place_batch


def make_parallel_sampler(model, layout, mesh: Mesh, *, sample=True,
                          temperature=1.0, top_k=0, top_p=0.0, forced=()):
    """Data-parallel sampling: the batch axis is sharded over 'data', params
    replicated; the whole generation scan runs SPMD (each chip decodes its
    shard, no cross-chip communication needed).

    lm models:  sampler(params, rng, batch_size) with batch_size % data == 0.
    vae models: sampler(params, rng, z) with z pre-placed via place_batch."""
    from ark_tpu.sample import make_sampler

    base = make_sampler(model, layout, sample=sample, temperature=temperature,
                        top_k=top_k, top_p=top_p, forced=forced)
    repl = NamedSharding(mesh, P())

    def place_params(params):
        return jax.device_put(params, param_shardings(params, mesh))

    if model.kind == "lm":
        def sampler(params, rng, batch_size):
            assert batch_size % mesh.shape["data"] == 0
            return base(params, jax.device_put(rng, repl), batch_size)
    else:
        def sampler(params, rng, z):
            z = jax.device_put(jnp.asarray(z), batch_sharding(mesh)(z))
            return base(params, jax.device_put(rng, repl), z)
    return sampler, place_params
