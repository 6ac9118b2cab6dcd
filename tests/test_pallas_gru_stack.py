"""Fused multi-layer GRU kernel (ops/pallas/gru_stack.py): forward and
backward must match the pure-JAX spec in the same module bit-for-bit
(interpreter mode on CPU), and track the all-f32 lax.scan path within bf16
tolerance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from ark_tpu.models.gru import gru_apply, gru_init
from ark_tpu.ops.pallas.gru_stack import (
    gru_stack_bwd_spec,
    gru_stack_scan,
    gru_stack_scan_dropout,
    gru_stack_spec,
    supported_stack,
)

B, L, H, NL = 8, 7, 128, 3


def _setup(key=0, nl=NL):
    params = gru_init(jax.random.key(key), H, H, nl)
    x = jax.random.normal(jax.random.key(key + 1), (B, L, H))
    h0 = jax.random.normal(jax.random.key(key + 2), (nl, B, H))
    lp0 = params["layers"][0]
    gx0 = x @ lp0["w_ih"] + lp0["b_ih"]
    wih = jnp.stack([lp["w_ih"] for lp in params["layers"][1:]]) \
        if nl > 1 else jnp.zeros((1, H, 3 * H))
    whh = jnp.stack([lp["w_hh"] for lp in params["layers"]])
    bih = jnp.stack([lp["b_ih"] for lp in params["layers"][1:]]) \
        if nl > 1 else jnp.zeros((1, 3 * H))
    bhh = jnp.stack([lp["b_hh"] for lp in params["layers"]])
    return params, x, gx0, wih, whh, bih, bhh, h0


def _masks(p=0.3, key=9):
    keep = jax.random.bernoulli(jax.random.key(key), 1.0 - p,
                                (NL - 1, B, L, H))
    return keep.astype(jnp.float32) / (1.0 - p)


def test_supported_stack():
    assert supported_stack(16, 512, 3)
    assert supported_stack(64, 512, 3)
    assert not supported_stack(7, 512, 3)
    assert not supported_stack(16, 100, 3)
    assert not supported_stack(16, 512, 1)      # single layer: per-layer kernel
    assert not supported_stack(2048, 512, 3)    # VMEM


def test_forward_matches_spec():
    _, _, gx0, wih, whh, bih, bhh, h0 = _setup()
    with pltpu.force_tpu_interpret_mode():
        ys, ht = gru_stack_scan(gx0, wih, whh, bih, bhh, h0)
    ys_s, ht_s = gru_stack_spec(gx0, wih, whh, bih, bhh, h0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ht_s), atol=1e-6)


def test_forward_matches_spec_with_dropout_masks():
    _, _, gx0, wih, whh, bih, bhh, h0 = _setup()
    masks = _masks()
    with pltpu.force_tpu_interpret_mode():
        ys, ht = gru_stack_scan_dropout(gx0, wih, whh, bih, bhh, h0, masks)
    ys_s, ht_s = gru_stack_spec(gx0, wih, whh, bih, bhh, h0, masks)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ht_s), atol=1e-6)


def test_forward_tracks_f32_scan_path():
    """bf16 weight products vs the all-f32 lax.scan path: small, bounded
    drift only (the numerics deviation documented in the module)."""
    params, x, gx0, wih, whh, bih, bhh, h0 = _setup()
    with pltpu.force_tpu_interpret_mode():
        ys, ht = gru_stack_scan(gx0, wih, whh, bih, bhh, h0)
    ys_f, ht_f = gru_apply(params, x, h0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_f),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(ht_f[-1]), np.asarray(ys_f[:, -1]),
                               atol=1e-6)


@pytest.mark.parametrize("with_masks", [False, True])
def test_backward_matches_spec(with_masks):
    _, _, gx0, wih, whh, bih, bhh, h0 = _setup()
    masks = _masks() if with_masks else None
    wts = jnp.arange(L, dtype=jnp.float32)[None, :, None] + 0.5

    def loss(fn, *args):
        ys, ht = fn(*args)
        return jnp.sum(ys * wts) + 2.0 * jnp.sum(ht ** 2)

    if with_masks:
        argnums = (0, 1, 2, 3, 4, 5)
        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(lambda *a: loss(gru_stack_scan_dropout, *a, masks),
                          argnums)(gx0, wih, whh, bih, bhh, h0)
    else:
        argnums = (0, 1, 2, 3, 4, 5)
        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(lambda *a: loss(gru_stack_scan, *a),
                          argnums)(gx0, wih, whh, bih, bhh, h0)

    # spec backward: replay the forward to get residuals + cotangents
    ys_s, ht_s = gru_stack_spec(gx0, wih, whh, bih, bhh, h0, masks)
    # d(loss)/d(ys), d(loss)/d(ht) for the loss above
    dy = jnp.broadcast_to(wts, ys_s.shape).astype(jnp.float32)
    dht = 4.0 * ht_s
    # residual ys_all (time-major, all layers): the forward's output —
    # bit-identical between kernel and spec (test_forward_matches_spec)
    from ark_tpu.ops.pallas.gru_stack import _run_fwd
    with pltpu.force_tpu_interpret_mode():
        ys_all, _ = _run_fwd(gx0, wih, whh, bih, bhh, h0, masks)
    gs = gru_stack_bwd_spec(gx0, wih, whh, bih, bhh, h0, masks, ys_all, dy,
                            dht)
    # spec returns (dgx0, dwih, dbih, dwhh, dbhh, dh0); kernel argnums are
    # (gx0, wih, whh, bih, bhh, h0)
    spec_by_arg = [gs[0], gs[1], gs[3], gs[2], gs[4], gs[5]]
    for name, got, want in zip(["gx0", "wih", "whh", "bih", "bhh", "h0"],
                               gk, spec_by_arg):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_backward_tracks_f32_autodiff():
    """Sanity: the bf16 hand-backward approximates the true f32 gradient."""
    params, x, gx0, wih, whh, bih, bhh, h0 = _setup()

    def loss_kernel(gx0):
        ys, ht = gru_stack_scan(gx0, wih, whh, bih, bhh, h0)
        return jnp.mean(ys ** 2) + jnp.mean(ht ** 2)

    def loss_f32(gx0):
        def cell(hs, gxt):
            new = []
            xx = None
            for l in range(NL):
                lp = params["layers"][l]
                g = gxt if l == 0 else xx @ lp["w_ih"] + lp["b_ih"]
                gh = hs[l] @ lp["w_hh"] + lp["b_hh"]
                r = jax.nn.sigmoid(g[:, :H] + gh[:, :H])
                z = jax.nn.sigmoid(g[:, H:2 * H] + gh[:, H:2 * H])
                n = jnp.tanh(g[:, 2 * H:] + r * gh[:, 2 * H:])
                hn = (1 - z) * n + z * hs[l]
                new.append(hn)
                xx = hn
            return jnp.stack(new), new[-1]

        hT, ys = jax.lax.scan(cell, h0, jnp.swapaxes(gx0, 0, 1))
        return jnp.mean(jnp.swapaxes(ys, 0, 1) ** 2) + jnp.mean(hT ** 2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel)(gx0)
    gf = jax.grad(loss_f32)(gx0)
    err = np.abs(np.asarray(gk) - np.asarray(gf))
    rel = err.max() / (np.abs(np.asarray(gf)).max() + 1e-12)
    assert rel < 0.05, f"bf16 backward drifted from f32 autodiff: {rel}"


def test_gru_apply_stack_mode_integration():
    """gru_apply(use_pallas='stack') tracks the lax.scan path, and the
    dropout variant preserves shapes + reproducibility per rng."""
    params, x, *_ = _setup()
    h0 = jax.random.normal(jax.random.key(4), (NL, B, H))
    with pltpu.force_tpu_interpret_mode():
        ys, ht = gru_apply(params, x, h0, use_pallas="stack")
    ys_f, ht_f = gru_apply(params, x, h0, use_pallas=False)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_f),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ht_f),
                               rtol=0.05, atol=0.02)

    with pltpu.force_tpu_interpret_mode():
        ys_d1, _ = gru_apply(params, x, h0, dropout_rate=0.5,
                             rng=jax.random.key(11), deterministic=False,
                             use_pallas="stack")
        ys_d2, _ = gru_apply(params, x, h0, dropout_rate=0.5,
                             rng=jax.random.key(11), deterministic=False,
                             use_pallas="stack")
        ys_d3, _ = gru_apply(params, x, h0, dropout_rate=0.5,
                             rng=jax.random.key(12), deterministic=False,
                             use_pallas="stack")
    np.testing.assert_array_equal(np.asarray(ys_d1), np.asarray(ys_d2))
    assert np.abs(np.asarray(ys_d1) - np.asarray(ys_d3)).max() > 0
    assert np.abs(np.asarray(ys_d1) - np.asarray(ys)).max() > 0


def test_stack_kernel_dropout_under_mesh():
    """Dropout masks shard with the batch under shard_map (interpret mode)."""
    from ark_tpu.parallel import make_mesh
    from ark_tpu.ops.pallas.gru_stack import gru_stack_sharded

    _, _, gx0, wih, whh, bih, bhh, h0 = _setup()
    masks = _masks()
    mesh = make_mesh({"data": 2})
    with pltpu.force_tpu_interpret_mode():
        ys_m, ht_m = gru_stack_sharded(gx0, wih, whh, bih, bhh, h0, masks,
                                       mesh)
        ys_1, ht_1 = gru_stack_scan_dropout(gx0, wih, whh, bih, bhh, h0,
                                            masks)
    np.testing.assert_allclose(np.asarray(ys_m), np.asarray(ys_1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ht_m), np.asarray(ht_1),
                               rtol=1e-6, atol=1e-6)
