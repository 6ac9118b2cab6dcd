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
  - 'data'  — batch dimension (DP); opt-in ZeRO-1: Adam moments sharded
    over it too (``shard_opt_state: true`` — see ``opt_state_shardings``)
  - 'model' — vocabulary dimension of tok_emb / output head (TP)

PP / SP / EP / context parallelism are intentionally absent: sequences are
2 + 3*max_edges tokens (tens, not thousands; reference train.py:348) and the
models are a few layers — there is nothing for pipeline/sequence/expert
parallelism to win (SURVEY §2 row P-3). Scaling is by batch and vocab.

Everything uses jit + NamedSharding (GSPMD): specify shardings, let XLA
insert the collectives (the scaling-book recipe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ark_tpu.train.state import TrainState


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """axis_sizes like {'data': 4, 'model': 2}; default: 1-D data mesh over
    all devices (global across hosts in a multi-host run).

    Device-to-mesh assignment goes through
    ``mesh_utils.create_device_mesh``, which lays the logical mesh onto
    the physical ICI topology (on a pod slice, a naive ``jax.devices()``
    reshape can put 'model'-axis neighbors on non-adjacent chips and turn
    every logits logsumexp / gradient reduce into multi-hop traffic; the
    scaling-book recipe is topology-aware assignment first, then GSPMD).
    Falls back to the plain reshape where the helper doesn't apply
    (e.g. odd device subsets)."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    n_needed = int(np.prod(shape))
    if n_needed > len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {n_needed} devices, "
                         f"have {len(devices)}")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape,
                                            devices=devices[:n_needed])
    except Exception as e:
        # loud fallback: on a real slice a naive assignment is a silent
        # multi-hop-ICI perf regression, so say which one is in effect
        import warnings

        warnings.warn(
            f"mesh_utils.create_device_mesh failed ({e!r}); falling back "
            f"to the naive jax.devices() reshape for mesh {axis_sizes} — "
            "fine on CPU/single-host, topology-suboptimal on pod slices",
            UserWarning, stacklevel=2)
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


# ZeRO-1 threshold: only moments at least this many elements are sharded
# over 'data' — below it, the per-leaf collective latency outweighs the
# saved HBM traffic (biases / layernorm vectors are a few KB).
_ZERO1_MIN_ELEMS = 16384


def opt_leaf_sharding(pstr: str, shape, mesh: Mesh, shard_vocab: bool,
                      shard_opt: bool) -> NamedSharding:
    """Sharding for ONE optimizer-state leaf (path string + shape).

    Moments mirror their params' vocab sharding (they must live where the
    params live). With ``shard_opt`` (ZeRO-1, Rajbhandari et al. 2020 —
    here as pure GSPMD sharding annotations, no manual collectives), large
    moment tensors are additionally sharded over 'data': each DP rank then
    reads/writes 1/n_data of the Adam state per step, shrinking the
    HBM-bound optimizer update (the second-largest line in the traced
    wd-articles step, docs/BENCH_NOTES.md) by the DP degree, while XLA
    moves the gradient as reduce-scatter + param all-gather instead of
    all-reduce (same bytes). Values are bit-identical — the per-element
    update math is unchanged, only its placement moves."""
    axes = dict(mesh.shape)
    nd = axes.get("data", 1)
    ndim = len(shape)
    size = 1
    for s in shape:
        size *= int(s)
    has_model = shard_vocab and "model" in mesh.axis_names
    dp_ok = (shard_opt and "data" in mesh.axis_names
             and size >= _ZERO1_MIN_ELEMS)
    if has_model and ndim >= 1 and _is_vocab_leaf(pstr):
        if "tok_emb" in pstr and ndim == 2:                    # [V, d]
            if dp_ok and shape[1] % nd == 0:
                return NamedSharding(mesh, P("model", "data"))
            return NamedSharding(mesh, P("model", None))
        if "['out']" in pstr and pstr.endswith("['w']") and ndim == 2:
            if dp_ok and shape[0] % nd == 0:                   # [d, V]
                return NamedSharding(mesh, P("data", "model"))
            return NamedSharding(mesh, P(None, "model"))
        if "['out']" in pstr and pstr.endswith("['b']") and ndim == 1:
            return NamedSharding(mesh, P("model"))             # [V]
    if dp_ok and ndim >= 1 and shape[0] % nd == 0:
        return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
    return NamedSharding(mesh, P())


def opt_state_shardings(opt_state, mesh: Mesh, shard_vocab: bool = False,
                        shard_opt: bool = False):
    """NamedSharding tree for the optimizer-state pytree (see
    ``opt_leaf_sharding``). With ``shard_opt=False`` this reproduces the
    params' shardings (moments co-located with their params)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: opt_leaf_sharding(
            jax.tree_util.keystr(path), jnp.shape(x), mesh, shard_vocab,
            shard_opt),
        opt_state)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    def make(x):
        return NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))
    return make


def place_state(state: TrainState, mesh: Mesh, shard_vocab: bool = False,
                shard_opt: bool = False) -> TrainState:
    """Put params/opt_state on the mesh: params per ``param_shardings``,
    optimizer state per ``opt_state_shardings`` (ZeRO-1 when ``shard_opt``)."""
    params = jax.device_put(state.params,
                            param_shardings(state.params, mesh, shard_vocab))
    opt_state = jax.device_put(
        state.opt_state,
        opt_state_shardings(state.opt_state, mesh, shard_vocab, shard_opt))
    return TrainState(params, opt_state)


def _host_value(x):
    # keep host values (numpy/python) OUT of a local-device round-trip:
    # jax.device_put(host_value, global_sharding) is the supported way to
    # feed a mesh that spans processes (every process passes the same full
    # array and contributes its addressable shards); detouring through
    # jnp.asarray would commit the value to one local device first, which
    # cannot be re-put onto non-addressable devices in multi-host runs
    return x if isinstance(x, jax.Array) else np.asarray(x)


def place_batch(arr, mesh: Mesh):
    """Shard an array's leading (batch) axis over 'data'."""
    arr = _host_value(arr)
    return jax.device_put(arr, batch_sharding(mesh)(arr))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh (e.g. the full data arrays the
    epoch scan gathers shuffled batches from)."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(_host_value(x), repl), tree)


def make_parallel_train_step(model, layout, config, mesh: Mesh,
                             shard_vocab: bool = False):
    """The unified train step (ark_tpu/train/steps.py::make_train_step) on a
    mesh: ONE loss/optimizer implementation serves the single-device, the
    data-parallel and the vocab-sharded paths; gradient psum over ICI and
    the sharded-logits logsumexp collectives are inserted by XLA from the
    sharding annotations, and the Pallas kernels run per data shard via
    shard_map.

    Returns (step, place_state_fn, place_batch_fn):
      step(state, triples, seq, rng, lr, beta) -> (state, metrics)
      place_state_fn(state) / place_batch_fn(arr) put inputs on the mesh."""
    from ark_tpu.train.steps import make_train_step

    pad_id = layout.special_tokens["PAD"]
    step = make_train_step(model, pad_id, config, mesh=mesh,
                           shard_vocab=shard_vocab)
    shard_opt = bool((config or {}).get("shard_opt_state", False))
    return (step,
            lambda state: place_state(state, mesh, shard_vocab,
                                      shard_opt=shard_opt),
            lambda arr: place_batch(arr, mesh))


def make_parallel_sampler(model, layout, mesh: Mesh, *, sample=True,
                          temperature=1.0, top_k=0, top_p=0.0, forced=(),
                          fused_strategy="auto", shard_vocab=False):
    """Data-parallel sampling: the batch axis is sharded over 'data', params
    replicated; the whole generation scan runs SPMD (each chip decodes its
    shard, no cross-chip communication needed). The decode state and token
    stream are PINNED to 'data' via sharding constraints inside the scan
    (the lm decode state is created inside the jit, so without the pin XLA
    could legally replicate the whole generation on every chip;
    tests/test_parallel.py checks the compiled output sharding).

    With ``shard_vocab`` the head params stay vocab-sharded over 'model'
    (place_params applies param_shardings(shard_vocab=True)) and the fused
    sampling kernel streams per-shard head slices with cross-shard merges
    instead of all-gathering the head (sample/samplers.py).

    lm models:  sampler(params, rng, batch_size) with batch_size % data == 0.
    vae models: sampler(params, rng, z) with z pre-placed via place_batch."""
    from ark_tpu.sample import make_sampler

    base = make_sampler(model, layout, sample=sample, temperature=temperature,
                        top_k=top_k, top_p=top_p, forced=forced, mesh=mesh,
                        fused_strategy=fused_strategy, shard_vocab=shard_vocab)
    repl = NamedSharding(mesh, P())

    def place_params(params):
        return jax.device_put(params,
                              param_shardings(params, mesh, shard_vocab))

    if model.kind == "lm":
        def sampler(params, rng, batch_size):
            assert batch_size % mesh.shape["data"] == 0
            return base(params, jax.device_put(rng, repl), batch_size)
    else:
        def sampler(params, rng, z):
            z = jax.device_put(jnp.asarray(z), batch_sharding(mesh)(z))
            return base(params, jax.device_put(rng, repl), z)
    return sampler, place_params
