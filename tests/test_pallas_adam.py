"""Fused Adam kernel (ops/pallas/adam.py) vs the optax baseline.

The fused optimizer must be BIT-IDENTICAL to the shipped step composition
(optax.scale_by_adam + -lr*u + p+u) — it replaces three HBM sweeps with
one, not the math. Kernel runs in Pallas interpret mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ark_tpu.train.state import TrainState, adam_tx


@jax.jit
def _optax_apply(state, grads, lr):
    # jitted like the shipped train step: XLA may contract -lr*u + p into
    # an fma, which is part of the baseline's bit pattern
    tx = adam_tx(None)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return TrainState(params, opt_state)


def _tree_equal_bits(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(
            np.asarray(la).view(np.uint32) if la.dtype == jnp.float32
            else np.asarray(la),
            np.asarray(lb).view(np.uint32) if lb.dtype == jnp.float32
            else np.asarray(lb))


def _rand_tree(key, shapes):
    ks = jax.random.split(key, len(shapes))
    return {f"leaf{i}": jax.random.normal(k, s, jnp.float32)
            for i, (k, s) in enumerate(zip(ks, shapes))}


@pytest.mark.parametrize("shapes", [
    # lane-aligned big leaf (Pallas path), odd small leaves (XLA path),
    # non-divisible leaf — the mix a real model produces
    [(256, 128), (17,), (8, 3, 64)],
    [(1024, 128), (128, 128), (5, 5)],
])
def test_fused_adam_bitwise_equals_optax(shapes):
    from ark_tpu.ops.pallas.adam import fused_adam_apply, supported_leaf

    assert supported_leaf((256, 128))
    assert not supported_leaf((17,))

    key = jax.random.key(0)
    params = _rand_tree(key, shapes)
    tx = adam_tx(None)
    s_ref = TrainState(params, tx.init(params))
    s_fused = TrainState(params, tx.init(params))

    for step in range(4):
        grads = _rand_tree(jax.random.key(100 + step), shapes)
        lr = jnp.float32(1e-3 * (step + 1))
        s_ref = _optax_apply(s_ref, grads, lr)
        # jitted like the shipped step (the eager/jit boundary changes fma
        # contraction, so compare jit-to-jit)
        p, o = jax.jit(functools.partial(fused_adam_apply, interpret=True))(
            s_fused.params, grads, s_fused.opt_state, lr)
        s_fused = TrainState(p, o)
        _tree_equal_bits(s_ref.params, s_fused.params)
        _tree_equal_bits(s_ref.opt_state.mu, s_fused.opt_state.mu)
        _tree_equal_bits(s_ref.opt_state.nu, s_fused.opt_state.nu)
        assert int(s_ref.opt_state.count) == int(s_fused.opt_state.count)


def test_train_step_with_fused_adam_matches_baseline():
    """A real model train step: fused_adam_interpret config flag vs the
    optax step must produce identical states after several steps."""
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model
    from ark_tpu.train import create_train_state
    from ark_tpu.train.steps import make_train_step

    layout = build_vocab_layout(20, 4, 3, 3, use_padding=False)
    cfg = dict(model_type="ARK", d_model=128, d_latent=8, n_heads=2,
               n_layers=2, seq_len=layout.seq_len,
               vocab_size=layout.vocab_size, batch_size=8,
               n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0,
               use_fused_ce=False, use_pallas_gru=False)
    model = build_model(cfg)
    pad = layout.special_tokens["PAD"]

    step_ref = make_train_step(model, pad, dict(cfg, use_fused_adam=False))
    step_fused = make_train_step(model, pad,
                                 dict(cfg, use_fused_adam=False,
                                      fused_adam_interpret=True))

    seq = jax.random.randint(jax.random.key(1), (8, layout.seq_len), 0,
                             layout.vocab_size)
    triples = jnp.zeros((8, 3, 3), jnp.int32)
    s_a = create_train_state(model, jax.random.key(0))
    s_b = create_train_state(model, jax.random.key(0))
    for i in range(3):
        s_a, m_a = step_ref(s_a, triples, seq, jax.random.key(2), 1e-3, 1.0)
        s_b, m_b = step_fused(s_b, triples, seq, jax.random.key(2), 1e-3, 1.0)
        assert float(m_a["loss"]) == float(m_b["loss"])
    _tree_equal_bits(s_a.params, s_b.params)
    _tree_equal_bits(s_a.opt_state.mu, s_b.opt_state.mu)
    _tree_equal_bits(s_a.opt_state.nu, s_b.opt_state.nu)


def test_fused_adam_interpret_respects_safety_conditions():
    """fused_adam_interpret must ride the SAME safety conditions as the
    real kernel selection: with bf16 Adam moments the f32-only Pallas
    path must NOT engage (it returned f32 moments into a bf16 scan carry
    — round-4 review finding); the optax path runs instead."""
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model
    from ark_tpu.train import create_train_state
    from ark_tpu.train.steps import make_train_step

    layout = build_vocab_layout(20, 4, 3, 3, use_padding=False)
    cfg = dict(model_type="ARK", d_model=128, d_latent=8, n_heads=2,
               n_layers=2, seq_len=layout.seq_len,
               vocab_size=layout.vocab_size, batch_size=8,
               n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0,
               use_fused_ce=False, use_pallas_gru=False,
               adam_state_dtype="bfloat16", fused_adam_interpret=True)
    model = build_model(cfg)
    pad = layout.special_tokens["PAD"]
    step = make_train_step(model, pad, cfg)
    seq = jax.random.randint(jax.random.key(1), (8, layout.seq_len), 0,
                             layout.vocab_size)
    triples = jnp.zeros((8, 3, 3), jnp.int32)
    s = create_train_state(model, jax.random.key(0))
    s, m = step(s, triples, seq, jax.random.key(2), 1e-3, 1.0)
    assert jnp.isfinite(m["loss"])
    # moments kept their configured dtype (the Pallas path would have
    # returned f32)
    leaf = jax.tree.leaves(s.opt_state.mu)[0]
    assert leaf.dtype == jnp.bfloat16
