"""Equivalence tests for the Pallas embedding-gather kernels
(ops/pallas/embed_gather.py) — the BASELINE.json "embedding-gather" kernel
target. Invariant (CLAUDE.md): the pure-XLA indexing is the semantic spec;
both Pallas schedules must match it bitwise, forward and backward, in
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ark_tpu.ops import embed
from ark_tpu.ops.pallas import embed_gather as eg

MODES = ["block", "dma"]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("n", [8, 37, eg.GCHUNK, eg.GCHUNK + 1])
def test_gather_rows_bitwise(mode, n):
    v, d = 64, 128
    table = jax.random.normal(jax.random.key(0), (v, d), jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (n,), 0, v)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(eg.gather_rows(table, ids, mode))
    np.testing.assert_array_equal(got, np.asarray(table)[np.asarray(ids)])


@pytest.mark.parametrize("mode", MODES)
def test_gather_rows_2d_ids_and_grad(mode):
    """[B, L]-shaped ids (the decoder tok_emb case) and the scatter-add
    transpose match jnp indexing exactly."""
    v, d = 48, 128
    table = jax.random.normal(jax.random.key(0), (v, d), jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (4, 11), 0, v)

    def loss_pallas(t):
        return (eg.gather_rows(t, ids, mode) ** 2).sum()

    def loss_xla(t):
        return (t[ids] ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(eg.gather_rows(table, ids, mode))
        g = np.asarray(jax.grad(loss_pallas)(table))
    np.testing.assert_array_equal(out, np.asarray(table[ids]))
    np.testing.assert_array_equal(g, np.asarray(jax.grad(loss_xla)(table)))


@pytest.mark.parametrize("mode", MODES)
def test_gather_rows_clamps_out_of_range(mode):
    """Out-of-range ids clamp — XLA gather's clip semantics."""
    v, d = 16, 128
    table = jax.random.normal(jax.random.key(0), (v, d), jnp.float32)
    ids = jnp.array([-3, 0, v - 1, v + 5], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(eg.gather_rows(table, ids, mode))
    want = np.asarray(table)[np.clip(np.asarray(ids), 0, v - 1)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", MODES)
def test_embed_triples_fused_bitwise_and_grads(mode):
    """The fused (h|r|t) kernel == encoders._embed_triples' XLA form,
    including both tables' scatter-add gradients (h and t share e_emb)."""
    ne, nr, d = 50, 7, 128
    e_emb = jax.random.normal(jax.random.key(2), (ne, d), jnp.float32)
    r_emb = jax.random.normal(jax.random.key(3), (nr, d), jnp.float32)
    trip = jnp.stack(
        [jax.random.randint(jax.random.key(4), (5, 9), 0, ne),
         jax.random.randint(jax.random.key(5), (5, 9), 0, nr),
         jax.random.randint(jax.random.key(6), (5, 9), 0, ne)], axis=-1)

    def xla(e, r):
        return jnp.concatenate(
            [e[trip[..., 0]], r[trip[..., 1]], e[trip[..., 2]]], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(eg.embed_triples_fused(e_emb, r_emb, trip, mode))
        ge, gr = jax.grad(
            lambda e, r: (eg.embed_triples_fused(e, r, trip, mode) ** 3).sum(),
            argnums=(0, 1))(e_emb, r_emb)
    np.testing.assert_array_equal(got, np.asarray(xla(e_emb, r_emb)))
    ge_ref, gr_ref = jax.grad(lambda e, r: (xla(e, r) ** 3).sum(),
                              argnums=(0, 1))(e_emb, r_emb)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(ge_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref), rtol=1e-6)


def test_dispatch_falls_back_on_unsupported_shapes():
    """d % 128 != 0 or non-f32 tables route to plain XLA indexing, so the
    knob is always safe to enable."""
    table = jax.random.normal(jax.random.key(0), (10, 96), jnp.float32)
    ids = jnp.array([1, 2, 3])
    out = embed.take_rows(table, ids, use_pallas=True)  # no interpret ctx:
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[ids]))

    bf = jax.random.normal(jax.random.key(0), (10, 128)).astype(jnp.bfloat16)
    out = embed.take_rows(bf, ids, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bf[ids]))


@pytest.mark.parametrize("mt", ["ARK", "t-ARK", "SAIL", "t-SAIL"])
def test_model_apply_bitwise_with_pallas_embed(mt):
    """use_pallas_embed: true leaves every model family's forward bitwise
    unchanged (the kernels are exact gathers)."""
    from ark_tpu.data.tokenizer import build_vocab_layout
    from ark_tpu.models import build_model

    layout = build_vocab_layout(500, 4, 2, 2, use_padding=True)
    base = dict(model_type=mt, d_model=128, d_latent=8, n_heads=2, n_layers=2,
                seq_len=layout.seq_len, vocab_size=layout.vocab_size,
                n_entities=layout.num_entities,
                n_relations=layout.num_relations, dec_dropout=0.0,
                batch_size=4, vocab_pad_multiple=128, tie_weights=True,
                use_pallas_gru=False, pad_eid=layout.pad_eid,
                pad_rid=layout.pad_rid)
    m0 = build_model(dict(base, use_pallas_embed=False))
    m1 = build_model(dict(base, use_pallas_embed=True))
    params = m0.init(jax.random.key(0))
    b = 4
    seq = jax.random.randint(jax.random.key(1), (b, layout.seq_len), 0,
                             layout.vocab_size)
    if m0.kind == "lm":
        want = np.asarray(m0.apply(params, seq))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(m1.apply(params, seq))
    else:
        trip = jnp.stack(
            [jax.random.randint(jax.random.key(2), (b, 3), 0,
                                layout.num_entities),
             jax.random.randint(jax.random.key(3), (b, 3), 0,
                                layout.num_relations),
             jax.random.randint(jax.random.key(4), (b, 3), 0,
                                layout.num_entities)], axis=-1)
        want = np.asarray(m0.apply(params, trip, seq,
                                   rng=jax.random.key(5))[0])
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(m1.apply(params, trip, seq,
                                      rng=jax.random.key(5))[0])
    np.testing.assert_array_equal(got, want)
