"""Multi-device tests on the 8-way virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8; SURVEY §4): data-parallel training
matches single-device training, vocab sharding works, and the driver's
graft entry points run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ark_tpu.data.tokenizer import build_vocab_layout
from ark_tpu.models import build_model
from ark_tpu.parallel import make_mesh, make_parallel_train_step, param_shardings
from ark_tpu.train import create_train_state, make_train_step

LAYOUT = build_vocab_layout(20, 4, 3, 3, use_padding=False)
CFG = dict(model_type="ARK", d_model=16, d_latent=6, n_heads=2, n_layers=2,
           seq_len=LAYOUT.seq_len, vocab_size=LAYOUT.vocab_size,
           n_entities=LAYOUT.num_entities, n_relations=LAYOUT.num_relations,
           dec_dropout=0.0, batch_size=16, vocab_pad_multiple=8)


def _toy_batch(n=16):
    rng = np.random.default_rng(0)
    triples = rng.integers(0, 4, size=(n, 3, 3)).astype(np.int32)
    triples[:, :, 0] %= 20
    triples[:, :, 2] %= 20
    from ark_tpu.train.steps import build_seq_from_triples
    seq = np.asarray(build_seq_from_triples(
        jnp.asarray(triples), LAYOUT.ent_base, LAYOUT.rel_base, 1, 2))
    return triples, seq


def test_eight_virtual_devices():
    assert jax.device_count() == 8


@pytest.mark.parametrize("axes,shard_vocab", [
    ({"data": 8}, False),
    ({"data": 4, "model": 2}, True),
    ({"data": 2, "model": 4}, True),
])
def test_parallel_step_matches_single_device(axes, shard_vocab):
    m = build_model(CFG)
    mesh = make_mesh(axes)
    step, place_state, place_batch = make_parallel_train_step(
        m, LAYOUT, CFG, mesh, shard_vocab=shard_vocab)
    state_p = place_state(create_train_state(m, jax.random.key(0)))
    state_s = create_train_state(m, jax.random.key(0))
    triples, seq = _toy_batch(16)

    single = make_train_step(m, pad_id=0)
    for i in range(3):
        rng = jax.random.key(i)
        state_p, mp = step(state_p, place_batch(triples), place_batch(seq),
                           rng, 1e-2, 1.0)
        state_s, ms = single(state_s, jnp.asarray(triples), jnp.asarray(seq),
                             rng, 1e-2, 1.0)
        np.testing.assert_allclose(float(mp["loss"]), float(ms["loss"]),
                                   rtol=1e-5, atol=1e-6)
    for pa, pb in zip(jax.tree.leaves(state_p.params),
                      jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)


def test_vocab_sharding_spec():
    m = build_model(CFG)
    params = m.init(jax.random.key(0))
    mesh = make_mesh({"data": 4, "model": 2})
    shards = param_shardings(params, mesh, shard_vocab=True)
    flat = dict(jax.tree_util.tree_flatten_with_path(shards)[0][0:0])
    leaves = jax.tree_util.tree_flatten_with_path(shards)[0]
    specs = {jax.tree_util.keystr(path): s.spec for path, s in leaves}
    assert specs["['tok_emb']"] == jax.sharding.PartitionSpec("model", None)
    assert specs["['out']['b']"] == jax.sharding.PartitionSpec("model")
    # attention out_proj (if present) and GRU weights stay replicated
    for k, s in specs.items():
        if "gru" in k or "out_proj" in k:
            assert s == jax.sharding.PartitionSpec()


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    # tiny variant of the flagship geometry for CPU compile speed
    config, layout = ge._flagship_config(n_entities=128, n_relations=4,
                                         max_edges=4, d_model=16, n_layers=2,
                                         batch_size=4)
    model = build_model(config)
    params = model.init(jax.random.key(0))
    seq = jnp.zeros((4, layout.seq_len - 1), jnp.int32)
    out = jax.jit(lambda p, s: model.apply(p, s, deterministic=True))(params, seq)
    assert out.shape == (4, layout.seq_len - 1, layout.vocab_size)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_parallel_sampler_matches_single_device():
    from ark_tpu.parallel.mesh import make_parallel_sampler
    from ark_tpu.sample import make_sampler

    m = build_model(CFG)
    params = m.init(jax.random.key(0))
    mesh = make_mesh({"data": 8})
    psampler, place_params = make_parallel_sampler(m, LAYOUT, sample=True,
                                                   top_p=0.9, mesh=mesh)
    pp = place_params(params)
    got = np.asarray(psampler(pp, jax.random.key(3), 16))
    ref = np.asarray(make_sampler(m, LAYOUT, sample=True, top_p=0.9)(
        params, jax.random.key(3), 16))
    np.testing.assert_array_equal(got, ref)
