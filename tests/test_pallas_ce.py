"""Fused large-vocab CE kernel correctness (interpreter mode on CPU):
forward NLL and all three gradients must match the XLA reference path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from ark_tpu.ops.losses import token_nll
from ark_tpu.ops.pallas.logit_ce import fused_ce_nll, supported

N, D, V, VB = 32, 128, 512, 128


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, D)).astype(np.float32)
    w = rng.normal(size=(V, D)).astype(np.float32) * 0.05
    b = rng.normal(size=(V,)).astype(np.float32) * 0.1
    t = rng.integers(0, V, size=(N,)).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(t)


def _ref_nll(x, w, b, t):
    logits = x @ w.T + b
    return token_nll(logits, t)


def test_supported_predicate():
    assert supported(1360, 512, 58880, 512)
    assert not supported(1360, 512, 58800, 512)  # V not multiple
    assert not supported(13, 512, 58880, 512)    # N not multiple of 8


def test_forward_matches_xla():
    x, w, b, t = _data()
    with pltpu.force_tpu_interpret_mode():
        got = fused_ce_nll(x, w, b, t, VB)
    want = _ref_nll(x, w, b, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    x, w, b, t = _data(1)
    gscale = jnp.linspace(0.5, 1.5, N)

    def loss_fused(x, w, b):
        return jnp.sum(fused_ce_nll(x, w, b, t, VB) * gscale)

    def loss_ref(x, w, b):
        return jnp.sum(_ref_nll(x, w, b, t) * gscale)

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, c, name in zip(g_fused, g_ref, "x w b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_chunked_masked_ce_matches_direct(monkeypatch):
    """Row-chunked fused CE (large batches) equals the single-call path,
    including gradients through the summed chunk VJPs."""
    import ark_tpu.ops.pallas.logit_ce as lce

    rng = np.random.default_rng(3)
    B, L, Dm, Vp, Vt = 4, 10, 128, 512, 500
    y = jnp.asarray(rng.normal(size=(B, L, Dm)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(Vp, Dm)) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(Vp,)) * 0.1).astype(np.float32))
    tgt = jnp.asarray(rng.integers(1, Vt, size=(B, L)).astype(np.int32))
    tgt = tgt.at[:, -2:].set(0)  # PAD tail

    def run(y, w, b):
        ce, _ = lce.fused_masked_cross_entropy(y, w, b, tgt, pad_id=0,
                                               v_true=Vt, vblock=128)
        return ce

    with pltpu.force_tpu_interpret_mode():
        direct, gd = jax.value_and_grad(run, argnums=(0, 1, 2))(y, w, b)
        monkeypatch.setattr(lce, "NCHUNK", 16)  # force 3 chunks (40 rows)
        chunked, gc = jax.value_and_grad(run, argnums=(0, 1, 2))(y, w, b)
    np.testing.assert_allclose(float(direct), float(chunked), rtol=1e-6)
    for a, c, name in zip(gd, gc, "y w b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
