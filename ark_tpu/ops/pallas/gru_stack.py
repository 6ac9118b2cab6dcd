"""Pallas TPU kernel: fused multi-layer GRU scan (all layers per time step).

The per-layer kernel (ops/pallas/gru_scan.py) already keeps each layer's
time loop on-chip, but a 3-layer decoder still pays 3 sequential grids
forward + 3 backward (6 x L grid steps) plus XLA round-trips for the
inter-layer input projections. At the reference shapes (batch 16-64,
d_model 512, seq 85 — reference hot loop train.py:42-63) the per-grid-step
pipeline overhead, not the MXU, is the wall (docs/BENCH_NOTES.md). This
kernel runs ONE grid step per time step and computes every layer inside it:

  - layer 0 reads its precomputed input projection gx0 (one big XLA matmul
    over the whole sequence, MXU-friendly);
  - layers l>0 project the previous layer's (dropout-masked) output
    in-kernel against VMEM-resident weights;
  - the recurrent weights for ALL layers stay resident in VMEM as bf16
    (f32 copies of w_ih[1:] + w_hh would not fit at d_model 512); every
    matmul runs bf16 x bf16 with f32 accumulation. Biases, activations,
    carries and gate math stay f32.

Backward is one reversed grid: gates are recomputed from (ys, gx0, masks),
the dh chain and the layer-to-layer dx chain run in-kernel, and the kernel
streams OUT per-step gate gradients (dgx, bf16) and reset gates (r, bf16);
the weight gradients are then three big XLA matmuls over the whole
sequence (dW_hh_l = h_prev^T dgh_l etc.) — MXU work XLA already does well,
and keeping the f32 [H, 3H] accumulators out of VMEM is what lets the
streamed blocks fit at batch 64.

Inter-layer dropout (torch nn.GRU semantics, reference models.py:121-127)
is exact: the caller precomputes the scaled keep-masks with the same
jax.random stream as the lax.scan path and streams them in, so fused and
per-layer paths train on identical masks.

Numerics contract: ``gru_stack_spec`` / ``gru_stack_bwd_spec`` in this
module are the pure-JAX definition of the computation (same bf16 casts);
the kernels must match them exactly (tests/test_pallas_gru_stack.py,
interpret mode on CPU). Relative to the all-f32 scan path the bf16 weight
products perturb the loss by ~1e-4 (measured in docs/BENCH_NOTES.md);
``use_pallas_gru='perlayer'`` keeps the bit-exact f32 kernel available.

API: ``gru_stack_scan(gx0, wih, whh, bih, bhh, h0)`` and
``gru_stack_scan_dropout(..., masks)``; both differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32, _BF16 = jnp.float32, jnp.bfloat16


def supported_stack(b, h, nl):
    """Shape + VMEM gate (the backward pass is the binding constraint).
    Callers fall back to the per-layer kernel / lax.scan otherwise."""
    if b % 8 != 0 or h % 128 != 0 or nl < 2:
        return False
    weights = 2 * ((nl - 1) * h * 3 * h + nl * h * 3 * h)  # bf16 resident
    streams = 2 * (b * 3 * h * 4)                 # gx0 (f32, dbl-buffered)
    streams += 2 * 2 * (nl * b * h * 4)           # ys at t and t-1
    streams += 2 * ((nl - 1) * b * h * 4)         # masks
    streams += 2 * (b * h * 4)                    # dy
    streams += 2 * (nl * b * 3 * h * 2)           # dgx out (bf16)
    streams += 2 * (nl * b * h * 2)               # r out (bf16)
    resident = 3 * (nl * b * h * 4)               # dht, h0, dh0
    resident += nl * b * h * 4                    # dh scratch
    return weights + streams + resident < 14 * 1024 * 1024


def _gate_math(gx, gh, h):
    r = jax.nn.sigmoid(gx[:, :h] + gh[:, :h])
    z = jax.nn.sigmoid(gx[:, h:2 * h] + gh[:, h:2 * h])
    n = jnp.tanh(gx[:, 2 * h:] + r * gh[:, 2 * h:])
    return r, z, n


def _bdot(a, b_mat, transpose=False):
    """bf16 x bf16 matmul with f32 accumulation (the MXU-native recipe)."""
    a16 = a.astype(_BF16)
    dims = (((1,), (1,)), ((), ())) if transpose else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(a16, b_mat, dims,
                               preferred_element_type=_F32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(nl, has_mask, *refs):
    if has_mask:
        (gx0_ref, wih_ref, whh_ref, bih_ref, bhh_ref, h0_ref, mask_ref,
         ys_ref, ht_ref, h_scr) = refs
    else:
        (gx0_ref, wih_ref, whh_ref, bih_ref, bhh_ref, h0_ref,
         ys_ref, ht_ref, h_scr) = refs
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    h_dim = whh_ref.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    x = None
    for l in range(nl):
        if l == 0:
            gx = gx0_ref[0]
        else:
            gx = _bdot(x, wih_ref[l - 1]) + bih_ref[l - 1]
        h = h_scr[l]
        gh = _bdot(h, whh_ref[l]) + bhh_ref[l]
        r, z, n = _gate_math(gx, gh, h_dim)
        h_new = (1.0 - z) * n + z * h
        h_scr[l] = h_new
        ys_ref[l, 0] = h_new
        x = h_new
        if has_mask and l < nl - 1:
            x = x * mask_ref[l, 0]

    @pl.when(t == nt - 1)
    def _():
        ht_ref[:] = h_scr[:]


def _fwd_call(gx0_t, wih16, whh16, bih, bhh, h0, masks_t):
    """Time-major shapes: gx0_t [L, B, 3H]; masks_t [NL-1, L, B, H] or None.
    Returns ys_all [NL, L, B, H] f32 and hT [NL, B, H]."""
    l_steps, b, g3 = gx0_t.shape
    h = g3 // 3
    nl = whh16.shape[0]
    has_mask = masks_t is not None
    in_specs = [
        pl.BlockSpec((1, b, g3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((max(nl - 1, 1), h, g3), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, h, g3), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(nl - 1, 1), g3), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, g3), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, b, h), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [gx0_t, wih16, whh16, bih, bhh, h0]
    if has_mask:
        in_specs.append(pl.BlockSpec((nl - 1, 1, b, h),
                                     lambda t: (0, t, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(masks_t)
    ys, ht = pl.pallas_call(
        functools.partial(_fwd_kernel, nl, has_mask),
        grid=(l_steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nl, 1, b, h), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, b, h), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nl, l_steps, b, h), _F32),
            jax.ShapeDtypeStruct((nl, b, h), _F32),
        ],
        scratch_shapes=[pltpu.VMEM((nl, b, h), _F32)],
    )(*args)
    return ys, ht


# ---------------------------------------------------------------------------
# Backward (reversed grid; streams dgx + r out, dW assembled by XLA)
# ---------------------------------------------------------------------------

def _bwd_kernel(nl, has_mask, *refs):
    if has_mask:
        (gx0_ref, wih_ref, whh_ref, bih_ref, bhh_ref, h0_ref, mask_ref,
         ys_ref, ysp_ref, dy_ref, dht_ref,
         dgx_ref, r_ref, dh0_ref, dh_scr) = refs
    else:
        (gx0_ref, wih_ref, whh_ref, bih_ref, bhh_ref, h0_ref,
         ys_ref, ysp_ref, dy_ref, dht_ref,
         dgx_ref, r_ref, dh0_ref, dh_scr) = refs
    j = pl.program_id(0)
    nt = pl.num_programs(0)
    t = nt - 1 - j
    h_dim = whh_ref.shape[1]

    @pl.when(j == 0)
    def _():
        dh_scr[:] = dht_ref[:]

    dx = dy_ref[0]
    for l in reversed(range(nl)):
        h_prev = jnp.where(t == 0, h0_ref[l], ysp_ref[l, 0])
        if l == 0:
            gx = gx0_ref[0]
        else:
            x = ys_ref[l - 1, 0]
            if has_mask:
                x = x * mask_ref[l - 1, 0]
            gx = _bdot(x, wih_ref[l - 1]) + bih_ref[l - 1]
        gh = _bdot(h_prev, whh_ref[l]) + bhh_ref[l]
        r, z, n = _gate_math(gx, gh, h_dim)

        dh_total = dh_scr[l] + dx
        dn = dh_total * (1.0 - z)
        dz = dh_total * (h_prev - n)
        dn_pre = dn * (1.0 - n * n)
        dgh_n = dn_pre * r
        dr = dn_pre * gh[:, 2 * h_dim:]
        dz_pre = dz * z * (1.0 - z)
        dr_pre = dr * r * (1.0 - r)
        dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        dgh = jnp.concatenate([dr_pre, dz_pre, dgh_n], axis=1)

        dgx_ref[l, 0] = dgx.astype(_BF16)
        r_ref[l, 0] = r.astype(_BF16)
        dh_scr[l] = dh_total * z + _bdot(dgh, whh_ref[l], transpose=True)
        if l > 0:
            dx = _bdot(dgx, wih_ref[l - 1], transpose=True)
            if has_mask:
                dx = dx * mask_ref[l - 1, 0]

    @pl.when(j == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]


def _bwd_call(gx0_t, wih16, whh16, bih, bhh, h0, masks_t, ys, dy_t, dht):
    l_steps, b, g3 = gx0_t.shape
    h = g3 // 3
    nl = whh16.shape[0]
    has_mask = masks_t is not None
    in_specs = [
        pl.BlockSpec((1, b, g3), lambda j, L=l_steps: (L - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(nl - 1, 1), h, g3), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, h, g3), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(nl - 1, 1), g3), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, g3), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, b, h), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [gx0_t, wih16, whh16, bih, bhh, h0]
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (nl - 1, 1, b, h), lambda j, L=l_steps: (0, L - 1 - j, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(masks_t)
    in_specs += [
        pl.BlockSpec((nl, 1, b, h), lambda j, L=l_steps: (0, L - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, 1, b, h),
                     lambda j, L=l_steps: (0, jnp.maximum(L - 2 - j, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, h), lambda j, L=l_steps: (L - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, b, h), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [ys, ys, dy_t, dht]
    dgx, r_all, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, nl, has_mask),
        grid=(l_steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nl, 1, b, g3), lambda j, L=l_steps: (0, L - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, 1, b, h), lambda j, L=l_steps: (0, L - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, b, h), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nl, l_steps, b, g3), _BF16),
            jax.ShapeDtypeStruct((nl, l_steps, b, h), _BF16),
            jax.ShapeDtypeStruct((nl, b, h), _F32),
        ],
        scratch_shapes=[pltpu.VMEM((nl, b, h), _F32)],
    )(*args)
    return dgx, r_all, dh0


def _assemble_weight_grads(gx0_t, wih16, h0, masks_t, ys, dgx, r_all):
    """Sequence-level weight grads from the streamed residuals: big f32
    matmuls on the MXU (cheap relative to the recurrence)."""
    nl = ys.shape[0]
    h = ys.shape[-1]
    dgx32 = dgx.astype(_F32)
    dgh32 = jnp.concatenate(
        [dgx32[..., :2 * h], dgx32[..., 2 * h:] * r_all.astype(_F32)],
        axis=-1)
    # h_prev per layer: [NL, L, B, H] — h0 at t=0, ys shifted otherwise
    h_prev = jnp.concatenate([h0[:, None], ys[:, :-1]], axis=1)
    dwhh = jnp.einsum("nlbh,nlbg->nhg", h_prev.astype(_BF16),
                      dgh32.astype(_BF16), preferred_element_type=_F32)
    dbhh = dgh32.sum(axis=(1, 2))
    if nl > 1:
        x_up = ys[:-1]
        if masks_t is not None:
            x_up = x_up * masks_t
        dwih = jnp.einsum("nlbh,nlbg->nhg", x_up.astype(_BF16),
                          dgx32[1:].astype(_BF16),
                          preferred_element_type=_F32)
        dbih = dgx32[1:].sum(axis=(1, 2))
    else:
        dwih = jnp.zeros((max(nl - 1, 1),) + (h, 3 * h), _F32)
        dbih = jnp.zeros((max(nl - 1, 1), 3 * h), _F32)
    dgx0 = dgx32[0]  # [L, B, 3H] — caller's gx0 chain handles layer 0
    return dgx0, dwih, dbih, dwhh, dbhh


# ---------------------------------------------------------------------------
# Pure-JAX spec (the numerics contract the kernels must match exactly)
# ---------------------------------------------------------------------------

def gru_stack_spec(gx0, wih, whh, bih, bhh, h0, masks=None):
    """Batch-major reference: gx0 [B, L, 3H], weights as in
    ``gru_stack_scan``; returns (ys_last [B, L, H], hT [NL, B, H]).
    Mirrors the kernel's bf16 casts bit-for-bit."""
    nl = whh.shape[0]
    h = whh.shape[1]
    wih16 = wih.astype(_BF16)
    whh16 = whh.astype(_BF16)

    def step(hs, inputs):
        gx0_t, mask_t = inputs
        new_hs = []
        x = None
        for l in range(nl):
            gx = gx0_t if l == 0 else _bdot(x, wih16[l - 1]) + bih[l - 1]
            hl = hs[l]
            gh = _bdot(hl, whh16[l]) + bhh[l]
            r, z, n = _gate_math(gx, gh, h)
            h_new = (1.0 - z) * n + z * hl
            new_hs.append(h_new)
            x = h_new
            if masks is not None and l < nl - 1:
                x = x * mask_t[l]
        return jnp.stack(new_hs), jnp.stack(new_hs)

    gx0_t = jnp.swapaxes(gx0, 0, 1)
    if masks is not None:
        # [NL-1, B, L, H] -> per-scan-step [L, NL-1, B, H]
        mask_t_seq = jnp.moveaxis(masks, 2, 0)
    else:
        mask_t_seq = jnp.zeros((gx0_t.shape[0], 0))
    hT, ys_all = jax.lax.scan(step, h0, (gx0_t, mask_t_seq))
    ys_last = jnp.swapaxes(ys_all[:, -1], 0, 1)
    return ys_last, hT


def gru_stack_bwd_spec(gx0, wih, whh, bih, bhh, h0, masks, ys_all_t, dy,
                       dht):
    """Pure-JAX mirror of the backward kernel + XLA grad assembly.
    ys_all_t: [NL, L, B, H] (the forward's residual). dy [B, L, H].
    Returns (dgx0 [B, L, 3H], dwih, dbih, dwhh, dbhh, dh0)."""
    nl, L, b, h = ys_all_t.shape
    wih16 = wih.astype(_BF16)
    whh16 = whh.astype(_BF16)
    gx0_t = jnp.swapaxes(gx0, 0, 1)
    dy_t = jnp.swapaxes(dy, 0, 1)

    def step(carry, inputs):
        dh = carry
        t, gx0_b, ys_b, ysp_b, dy_b = inputs
        dx = dy_b
        dgx_l, r_l, dh_new = [None] * nl, [None] * nl, [None] * nl
        for l in reversed(range(nl)):
            h_prev = jnp.where(t == 0, h0[l], ysp_b[l])
            if l == 0:
                gx = gx0_b
            else:
                x = ys_b[l - 1]
                if masks is not None:
                    x = x * masks[l - 1, :, t]
                gx = _bdot(x, wih16[l - 1]) + bih[l - 1]
            gh = _bdot(h_prev, whh16[l]) + bhh[l]
            r, z, n = _gate_math(gx, gh, h)
            dh_total = dh[l] + dx
            dn = dh_total * (1.0 - z)
            dz = dh_total * (h_prev - n)
            dn_pre = dn * (1.0 - n * n)
            dgh_n = dn_pre * r
            dr = dn_pre * gh[:, 2 * h:]
            dz_pre = dz * z * (1.0 - z)
            dr_pre = dr * r * (1.0 - r)
            dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
            dgh = jnp.concatenate([dr_pre, dz_pre, dgh_n], axis=1)
            dgx_l[l] = dgx.astype(_BF16)
            r_l[l] = r.astype(_BF16)
            dh_new[l] = dh_total * z + _bdot(dgh, whh16[l], transpose=True)
            if l > 0:
                dx = _bdot(dgx, wih16[l - 1], transpose=True)
                if masks is not None:
                    dx = dx * masks[l - 1, :, t]
        return jnp.stack(dh_new), (jnp.stack(dgx_l), jnp.stack(r_l))

    ts = jnp.arange(L - 1, -1, -1)
    ysp = jnp.concatenate([jnp.broadcast_to(h0[:, None], (nl, 1, b, h)),
                           ys_all_t[:, :-1]], axis=1)
    dh0, (dgx_rev, r_rev) = jax.lax.scan(
        step, dht, (ts, gx0_t[ts], ys_all_t[:, ts].swapaxes(0, 1),
                    ysp[:, ts].swapaxes(0, 1), dy_t[ts]))
    dgx_all = jnp.flip(dgx_rev, axis=0).swapaxes(0, 1)  # [NL, L, B, 3H]
    r_all = jnp.flip(r_rev, axis=0).swapaxes(0, 1)
    masks_t = jnp.swapaxes(masks, 1, 2) if masks is not None else None
    dgx0_t, dwih, dbih, dwhh, dbhh = _assemble_weight_grads(
        gx0_t, wih16, h0, masks_t, ys_all_t, dgx_all, r_all)
    return (jnp.swapaxes(dgx0_t, 0, 1), dwih, dbih, dwhh, dbhh, dh0)


# ---------------------------------------------------------------------------
# custom-vjp wrappers (no-dropout and dropout variants)
# ---------------------------------------------------------------------------

def _run_fwd(gx0, wih, whh, bih, bhh, h0, masks):
    gx0_t = jnp.swapaxes(gx0, 0, 1)
    masks_t = jnp.swapaxes(masks, 1, 2) if masks is not None else None
    ys_all, ht = _fwd_call(gx0_t, wih.astype(_BF16), whh.astype(_BF16),
                           bih, bhh, h0, masks_t)
    return ys_all, ht


def _run_bwd(gx0, wih, whh, bih, bhh, h0, masks, ys_all, dy, dht):
    gx0_t = jnp.swapaxes(gx0, 0, 1)
    dy_t = jnp.swapaxes(dy, 0, 1)
    masks_t = jnp.swapaxes(masks, 1, 2) if masks is not None else None
    wih16 = wih.astype(_BF16)
    dgx, r_all, dh0 = _bwd_call(gx0_t, wih16, whh.astype(_BF16), bih, bhh,
                                h0, masks_t, ys_all, dy_t, dht)
    dgx0_t, dwih, dbih, dwhh, dbhh = _assemble_weight_grads(
        gx0_t, wih16, h0, masks_t, ys_all, dgx, r_all)
    # custom_vjp arg order: (gx0, wih, whh, bih, bhh, h0)
    return jnp.swapaxes(dgx0_t, 0, 1), dwih, dwhh, dbih, dbhh, dh0


@jax.custom_vjp
def gru_stack_scan(gx0, wih, whh, bih, bhh, h0):
    """gx0 [B, L, 3H] f32 (layer-0 input projection incl. bias);
    wih [NL-1, H, 3H]; whh [NL, H, 3H]; bih [NL-1, 3H]; bhh [NL, 3H];
    h0 [NL, B, H] -> (ys_last [B, L, H], hT [NL, B, H])."""
    ys_all, ht = _run_fwd(gx0, wih, whh, bih, bhh, h0, None)
    return jnp.swapaxes(ys_all[-1], 0, 1), ht


def _plain_fwd_rule(gx0, wih, whh, bih, bhh, h0):
    ys_all, ht = _run_fwd(gx0, wih, whh, bih, bhh, h0, None)
    return ((jnp.swapaxes(ys_all[-1], 0, 1), ht),
            (gx0, wih, whh, bih, bhh, h0, ys_all))


def _plain_bwd_rule(res, cots):
    gx0, wih, whh, bih, bhh, h0, ys_all = res
    dy, dht = cots
    return _run_bwd(gx0, wih, whh, bih, bhh, h0, None, ys_all, dy, dht)


gru_stack_scan.defvjp(_plain_fwd_rule, _plain_bwd_rule)


@jax.custom_vjp
def gru_stack_scan_dropout(gx0, wih, whh, bih, bhh, h0, masks):
    """Training variant: ``masks`` [NL-1, B, L, H] are the scaled inter-layer
    keep-masks (0 or 1/(1-p)), generated by the caller with the same RNG
    stream as the lax.scan path (models/gru.py)."""
    ys_all, ht = _run_fwd(gx0, wih, whh, bih, bhh, h0, masks)
    return jnp.swapaxes(ys_all[-1], 0, 1), ht


def _drop_fwd_rule(gx0, wih, whh, bih, bhh, h0, masks):
    ys_all, ht = _run_fwd(gx0, wih, whh, bih, bhh, h0, masks)
    return ((jnp.swapaxes(ys_all[-1], 0, 1), ht),
            (gx0, wih, whh, bih, bhh, h0, masks, ys_all))


def _drop_bwd_rule(res, cots):
    gx0, wih, whh, bih, bhh, h0, masks, ys_all = res
    dy, dht = cots
    grads = _run_bwd(gx0, wih, whh, bih, bhh, h0, masks, ys_all, dy, dht)
    return grads + (jnp.zeros_like(masks),)


gru_stack_scan_dropout.defvjp(_drop_fwd_rule, _drop_bwd_rule)


def gru_stack_sharded(gx0, wih, whh, bih, bhh, h0, masks=None, mesh=None):
    """Mesh wrapper: batch sharded over 'data', weights replicated — the
    recurrence is independent per row (same rationale as
    gru_scan.gru_layer_scan_sharded; Mosaic custom calls are not
    GSPMD-partitionable)."""
    if mesh is None or dict(mesh.shape).get("data", 1) <= 1:
        if masks is None:
            return gru_stack_scan(gx0, wih, whh, bih, bhh, h0)
        return gru_stack_scan_dropout(gx0, wih, whh, bih, bhh, h0, masks)
    from jax.sharding import PartitionSpec as P

    if masks is None:
        return jax.shard_map(
            gru_stack_scan, mesh=mesh,
            in_specs=(P("data", None, None), P(), P(), P(), P(),
                      P(None, "data", None)),
            out_specs=(P("data", None, None), P(None, "data", None)),
            check_vma=False)(gx0, wih, whh, bih, bhh, h0)
    return jax.shard_map(
        gru_stack_scan_dropout, mesh=mesh,
        in_specs=(P("data", None, None), P(), P(), P(), P(),
                  P(None, "data", None), P(None, "data", None, None)),
        out_specs=(P("data", None, None), P(None, "data", None)),
        check_vma=False)(gx0, wih, whh, bih, bhh, h0, masks)
