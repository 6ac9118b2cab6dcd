"""Multi-layer GRU with torch ``nn.GRU`` semantics, TPU-first layout.

Gate conventions match torch exactly (gate order r, z, n; paired biases):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

TPU mapping: the input-side gate projections for the whole sequence are one
big batched matmul ([B, L, D] x [D, 3H] on the MXU) hoisted out of the time
loop; the ``lax.scan`` carries only the [B, H] recurrent matmul per step.
Inter-layer dropout (not after the last layer, train mode only) matches torch
(reference constructs ``nn.GRU(dropout=...)`` at models.py:121-127, 329-335).

Verified numerically against torch.nn.GRU in tests/test_torch_parity.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ark_tpu.models.initializers import uniform_fan
from ark_tpu.models.layers import dropout


def gru_init(key, input_size, hidden_size, num_layers):
    """Per layer: w_ih [in, 3H], w_hh [H, 3H], b_ih [3H], b_hh [3H]
    (gate blocks ordered r|z|n along the 3H axis, like torch)."""
    layers = []
    for l in range(num_layers):
        d_in = input_size if l == 0 else hidden_size
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append({
            "w_ih": uniform_fan(k1, (d_in, 3 * hidden_size), hidden_size),
            "w_hh": uniform_fan(k2, (hidden_size, 3 * hidden_size), hidden_size),
            "b_ih": uniform_fan(k3, (3 * hidden_size,), hidden_size),
            "b_hh": uniform_fan(k4, (3 * hidden_size,), hidden_size),
        })
    return {"layers": layers}


def _cell(h, gx, w_hh, b_hh, hidden_size):
    """One GRU step. gx = x W_ih + b_ih precomputed; h [B, H]."""
    gh = jnp.dot(h, w_hh.astype(h.dtype), preferred_element_type=jnp.float32)
    gh = (gh + b_hh).astype(h.dtype)
    H = hidden_size
    r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
    return (1.0 - z) * n + z * h


def gru_apply(params, x, h0=None, *, dropout_rate=0.0, rng=None,
              deterministic=True, use_pallas=False, mesh=None):
    """x [B, L, D] -> (y [B, L, H], hT [num_layers, B, H]).

    h0: [num_layers, B, H] or None (zeros). ``use_pallas`` selects the time-
    recurrence implementation:

      - ``"auto"``: the fused multi-layer kernel (ops/pallas/gru_stack.py —
        one grid step per time step, all layers, bf16-resident weights)
        where shapes/VMEM allow, else the per-layer f32 kernel
        (ops/pallas/gru_scan.py), else lax.scan;
      - ``True``: the bit-exact per-layer f32 kernel (legacy configs with
        ``use_pallas_gru: true`` keep their loss-identical trajectory; the
        ~1e-4-perturbing bf16 stack kernel is opt-in via "auto"/"stack");
      - ``"stack"`` / ``"perlayer"``: force one kernel family (A/B, parity);
      - ``False``: lax.scan (the all-f32 semantic reference).

    With ``mesh`` the kernels run per batch shard under shard_map (batch
    sharded over 'data'); shape support is checked against the shard."""
    layers = params["layers"]
    b, l, _ = x.shape
    hidden = layers[0]["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((len(layers), b, hidden), x.dtype)
    n_data = 1 if mesh is None else dict(mesh.shape).get("data", 1)
    mode = "perlayer" if use_pallas is True else use_pallas
    # measured crossover (docs/BENCH_NOTES.md): the stack kernel wins where
    # grid-step overhead dominates (small per-shard batch); at batch >= 64
    # the per-layer kernel's hoisted XLA input projections win back more
    # than the extra grid steps cost
    small_batch = (b // n_data) <= 32
    if (mode == "stack" or (mode == "auto" and small_batch)) \
            and b % n_data == 0 and x.dtype == jnp.float32 \
            and len(layers) >= 2:
        from ark_tpu.ops.pallas.gru_stack import supported_stack
        if supported_stack(b // n_data, hidden, len(layers)):
            return _gru_apply_stack(layers, x, h0, dropout_rate, rng,
                                    deterministic, mesh, hidden)
    if mode == "stack":
        # an EXPLICITLY forced kernel that silently measured something
        # else would invalidate an A/B (same standard as the sampler's
        # fused_sample_vblock warning)
        import warnings
        warnings.warn(
            f"use_pallas_gru='stack' requested but unsupported here "
            f"(per-shard batch {b // n_data}, hidden {hidden}, "
            f"{len(layers)} layer(s), dtype {x.dtype}); falling back to "
            "the per-layer kernel / lax.scan")
    pallas_ok = False
    if mode in ("auto", "perlayer", "stack") and b % n_data == 0:
        from ark_tpu.ops.pallas.gru_scan import supported
        pallas_ok = supported(b // n_data, hidden) and x.dtype == jnp.float32
    if mode in ("perlayer", "stack") and not pallas_ok:
        import warnings
        warnings.warn(
            f"use_pallas_gru={mode!r} requested but the per-layer kernel "
            f"is unsupported here (per-shard batch {b // n_data}, hidden "
            f"{hidden}, dtype {x.dtype}); falling back to lax.scan")
    h_finals = []
    out = x
    for li, lp in enumerate(layers):
        # hoisted input projection for the whole sequence (MXU-friendly)
        gx = jnp.dot(out, lp["w_ih"].astype(out.dtype),
                     preferred_element_type=jnp.float32)
        gx = (gx + lp["b_ih"]).astype(out.dtype)

        if pallas_ok:
            from ark_tpu.ops.pallas.gru_scan import gru_layer_scan_sharded
            out, hT = gru_layer_scan_sharded(gx.astype(jnp.float32),
                                             lp["w_hh"], lp["b_hh"],
                                             h0[li].astype(jnp.float32),
                                             mesh)
        else:
            def step(h, gx_t, _lp=lp):
                h_new = _cell(h, gx_t, _lp["w_hh"], _lp["b_hh"], hidden)
                return h_new, h_new

            hT, ys = jax.lax.scan(step, h0[li].astype(out.dtype),
                                  jnp.swapaxes(gx, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
        h_finals.append(hT)
        if li < len(layers) - 1 and not deterministic and dropout_rate > 0.0:
            rng, sub = jax.random.split(rng)
            out = dropout(out, dropout_rate, sub, deterministic)
    return out, jnp.stack(h_finals)


def _gru_apply_stack(layers, x, h0, dropout_rate, rng, deterministic, mesh,
                     hidden):
    """Fused multi-layer kernel path. Inter-layer dropout masks are drawn
    with the same per-layer rng-split sequence as the lax.scan path below,
    precomputed once and streamed into the kernel (exact torch nn.GRU
    dropout semantics, reference models.py:121-127)."""
    from ark_tpu.ops.pallas.gru_stack import gru_stack_sharded

    b, l, _ = x.shape
    nl = len(layers)
    lp0 = layers[0]
    gx0 = jnp.dot(x.astype(jnp.float32), lp0["w_ih"],
                  preferred_element_type=jnp.float32) + lp0["b_ih"]
    wih = jnp.stack([lp["w_ih"] for lp in layers[1:]])
    whh = jnp.stack([lp["w_hh"] for lp in layers])
    bih = jnp.stack([lp["b_ih"] for lp in layers[1:]])
    bhh = jnp.stack([lp["b_hh"] for lp in layers])
    masks = None
    if not deterministic and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        ms = []
        for _ in range(nl - 1):
            rng, sub = jax.random.split(rng)
            m = jax.random.bernoulli(sub, keep, (b, l, hidden))
            ms.append(jnp.where(m, 1.0 / keep, 0.0).astype(jnp.float32))
        masks = jnp.stack(ms)
    out, hT = gru_stack_sharded(gx0, wih, whh, bih, bhh,
                                h0.astype(jnp.float32), masks, mesh)
    return out, hT


def gru_step(params, x_t, h):
    """Single decode step for sampling: x_t [B, D], h [B, num_layers, H]
    -> (y_t [B, H], h' [B, num_layers, H]). Batch-leading state layout so
    decode states gather uniformly along axis 0 (beam search, sharding).
    Eval mode (no dropout)."""
    layers = params["layers"]
    hidden = layers[0]["w_hh"].shape[0]
    new_h = []
    out = x_t
    for li, lp in enumerate(layers):
        gx = jnp.dot(out, lp["w_ih"].astype(out.dtype),
                     preferred_element_type=jnp.float32)
        gx = (gx + lp["b_ih"]).astype(out.dtype)
        h_new = _cell(h[:, li].astype(out.dtype), gx, lp["w_hh"], lp["b_hh"],
                      hidden)
        new_h.append(h_new)
        out = h_new
    return out, jnp.stack(new_h, axis=1)
