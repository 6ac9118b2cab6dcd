"""Fused Adam parameter+moment update as a single Pallas pass.

STATUS: DOCUMENTED NEGATIVE RESULT — kept for the A/B evidence, default
OFF (see docs/BENCH_NOTES.md "Round 3: fused Adam"). On the real chip the
kernel measured 0.58x the optax path (2401 vs 4116 graphs/s, wd-articles
bench config) and is not bit-exact on hardware (Mosaic contracts
multiply-adds differently than XLA:TPU). The companion
``fused_adam_apply_xla`` (same single-pass formula as one multi-output
tree_map) proved XLA already lowers the staged optax path to equivalent
traffic: it is bit-identical and throughput-neutral.

Original motivation: the traced wd-articles train step spends ~36% of its
time in the optimizer update (docs/BENCH_NOTES.md round-2 trace); the
hypothesis was that XLA's three read-modify-write fusions re-read mu'/nu'
and a single pass — read (p, g, mu, nu), write (p', mu', nu') — would cut
~30% of that traffic. The A/B refuted the hypothesis.

Semantics target (asserted bitwise on CPU, tests/test_pallas_adam.py):
the baseline step composition
(optax.scale_by_adam(b1,b2,eps) + ``-lr*u`` + ``p+u``, train/steps.py):

    mu'  = (1-b1)*g + b1*mu                      [optax tree_update_moment]
    nu'  = (1-b2)*g^2 + b2*nu                    [update_moment_per_elem_norm]
    bc_i = 1 - b_i**count_inc                    [optax tree_bias_correction]
    u    = (mu'/bc1) / (sqrt(nu'/bc2) + eps)
    p'   = p + (-lr)*u

All products/sums use the same operand expressions and f32 dtype as the
optax path, so every intermediate rounds identically (IEEE ops are
deterministic); equivalence is asserted bitwise in
tests/test_pallas_adam.py. The bias corrections are computed OUTSIDE the
kernel with optax's own expression (1 - decay**count) and passed in as
scalars.

Reference counterpart: ``optim.Adam(model.parameters(), lr=...)`` at
/root/reference/kgvae/experiments/train.py:449 (torch defaults 0.9/0.999/
1e-8, matching optax here — see train/state.py).

Leaves whose flattened size is not lane-aligned (or tiny) take an XLA
expression with the identical formula — elementwise f32 math is
deterministic, so the two paths are interchangeable per leaf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLOCK_ROWS = 1024         # (1024, 128) f32 blocks: 512 KB per operand buffer
MIN_PALLAS_ELEMS = 1 << 14  # smaller leaves: XLA expression (same bits)


def _kernel(b1, b2, eps, sc_ref, p_ref, g_ref, mu_ref, nu_ref,
            po_ref, muo_ref, nuo_ref):
    bc1 = sc_ref[0]
    bc2 = sc_ref[1]
    neg_lr = sc_ref[2]
    g = g_ref[...]
    mu = (1 - b1) * g + b1 * mu_ref[...]
    nu = (1 - b2) * (g * g) + b2 * nu_ref[...]
    u = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    po_ref[...] = p_ref[...] + neg_lr * u
    muo_ref[...] = mu
    nuo_ref[...] = nu


def _xla_leaf(p, g, mu, nu, bc1, bc2, neg_lr, b1, b2, eps):
    """The identical update as a plain XLA expression (small/odd leaves)."""
    mu = (1 - b1) * g + b1 * mu
    nu = (1 - b2) * (g * g) + b2 * nu
    u = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    return p + neg_lr * u, mu, nu


def supported_leaf(shape) -> bool:
    n = 1
    for s in shape:
        n *= int(s)
    return n >= MIN_PALLAS_ELEMS and n % LANE == 0


def _pallas_leaf(p, g, mu, nu, scalars, *, b1, b2, eps, interpret=False):
    shape = p.shape
    rows = p.size // LANE
    p2 = p.reshape(rows, LANE)
    g2 = g.reshape(rows, LANE)
    mu2 = mu.reshape(rows, LANE)
    nu2 = nu.reshape(rows, LANE)
    br = min(BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, br),)
    blk = pl.BlockSpec((br, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((br, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    po, muo, nuo = pl.pallas_call(
        functools.partial(_kernel, b1, b2, eps),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk, blk, blk, blk],
        out_specs=[out, out, out],
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * 3,
        # stream in place: p/mu/nu buffers are donated by the train step
        input_output_aliases={1: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, p2, g2, mu2, nu2)
    return po.reshape(shape), muo.reshape(shape), nuo.reshape(shape)


def fused_adam_apply_xla(params, grads, opt_state, lr, *, b1=0.9, b2=0.999,
                         eps=1e-8):
    """One multi-output tree_map per leaf: the same single-pass formula,
    lowered by XLA (multi-output loop fusion) instead of Pallas. No custom
    call, so GSPMD sharding and XLA scheduling work unchanged."""
    import optax

    count_inc = optax.safe_increment(opt_state.count)
    bc1 = (1 - b1**count_inc).astype(jnp.float32)
    bc2 = (1 - b2**count_inc).astype(jnp.float32)
    neg_lr = (-lr).astype(jnp.float32) if hasattr(lr, "astype") \
        else jnp.float32(-lr)

    def leaf(p, g, mu, nu):
        return _xla_leaf(p, g, mu, nu, bc1, bc2, neg_lr, b1, b2, eps)

    out = jax.tree.map(leaf, params, grads, opt_state.mu, opt_state.nu)
    treedef = jax.tree.structure(params)
    trips = treedef.flatten_up_to(out)
    import optax
    state = optax.ScaleByAdamState(
        count=count_inc,
        mu=jax.tree.unflatten(treedef, [t[1] for t in trips]),
        nu=jax.tree.unflatten(treedef, [t[2] for t in trips]))
    return jax.tree.unflatten(treedef, [t[0] for t in trips]), state


def fused_adam_apply(params, grads, opt_state, lr, *, b1=0.9, b2=0.999,
                     eps=1e-8, interpret=False):
    """One fused pass over every leaf: returns (params', ScaleByAdamState').

    ``opt_state`` is optax's ScaleByAdamState (count/mu/nu) so checkpoints
    and resume are unchanged. ``lr`` may be a runtime scalar (the cosine
    schedule recompiles nothing). ``interpret`` runs the kernel in Pallas
    interpret mode (CPU equivalence tests)."""
    import optax

    count_inc = optax.safe_increment(opt_state.count)
    # optax tree_bias_correction: 1 - decay**count, then .astype(t.dtype)
    bc1 = (1 - b1**count_inc).astype(jnp.float32)
    bc2 = (1 - b2**count_inc).astype(jnp.float32)
    neg_lr = (-lr).astype(jnp.float32) if hasattr(lr, "astype") \
        else jnp.float32(-lr)
    scalars = jnp.stack([bc1, bc2, neg_lr])

    leaves_p, treedef = jax.tree.flatten(params)
    leaves_g = treedef.flatten_up_to(grads)
    leaves_mu = treedef.flatten_up_to(opt_state.mu)
    leaves_nu = treedef.flatten_up_to(opt_state.nu)

    new_p, new_mu, new_nu = [], [], []
    for p, g, mu, nu in zip(leaves_p, leaves_g, leaves_mu, leaves_nu):
        if p.dtype == jnp.float32 and supported_leaf(p.shape):
            po, muo, nuo = _pallas_leaf(p, g, mu, nu, scalars,
                                        b1=b1, b2=b2, eps=eps,
                                        interpret=interpret)
        else:
            po, muo, nuo = _xla_leaf(p, g, mu, nu, bc1, bc2, neg_lr,
                                     b1, b2, eps)
        new_p.append(po)
        new_mu.append(muo)
        new_nu.append(nuo)

    import optax
    state = optax.ScaleByAdamState(count=count_inc,
                                   mu=jax.tree.unflatten(treedef, new_mu),
                                   nu=jax.tree.unflatten(treedef, new_nu))
    return jax.tree.unflatten(treedef, new_p), state
