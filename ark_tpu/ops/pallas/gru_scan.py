"""Pallas TPU kernel: fused GRU layer scan (forward + BPTT backward).

The GRU time recurrence is the latency-critical inner loop of the ARK/SAIL
decoders (ark_tpu/models/gru.py): per step only a [B, H] x [H, 3H] matmul +
gate elementwise work — far too small to hide per-iteration overhead in an
XLA while-loop at the reference batch sizes. This kernel runs the WHOLE time
loop as a sequential Pallas grid with the recurrent weights, biases and the
hidden-state carry resident in VMEM: per grid step it reads one [B, 1, 3H]
slice of the precomputed input projections (gx = x @ W_ih + b_ih stays an
XLA batched matmul over the full sequence — MXU-friendly) and writes one
[B, 1, H] output slice.

Backward is the standard GRU BPTT, also as a single reversed Pallas grid:
gates are recomputed from (h_prev, gx_t) — no activation stash beyond the
forward's own ys — with dW_hh / db_hh accumulated in VMEM scratch.

Gate conventions match torch / ark_tpu.models.gru exactly (r, z, n; paired
biases):
    r = sig(gx_r + h W_hr + b_hr); z = sig(gx_z + h W_hz + b_hz)
    n = tanh(gx_n + r * (h W_hn + b_hn));  h' = (1-z) n + z h

API: ``gru_layer_scan(gx, w_hh, b_hh, h0) -> (ys, hT)``; differentiable.
Requires B % 8 == 0 and H % 128 == 0 (``supported()``); callers fall back to
the lax.scan path otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(b, h):
    """Shape + VMEM gate. The backward kernel holds, per grid step:
    double-buffered streamed blocks (gx, dy, ys_prev in; dgx out — 8H*b
    floats each way) plus resident w_hh, dw scratch (2 x 3H*H), biases and
    the dh carry. Bound the total under the ~16 MB VMEM budget with margin;
    callers fall back to the lax.scan path otherwise."""
    if b % 8 != 0 or h % 128 != 0:
        return False
    streamed = 2 * 2 * (3 * h * b + h * b + h * b + 3 * h * b)  # dbl-buffered
    resident = 2 * (h * 3 * h) + 2 * (3 * h) + 3 * h * b
    vmem_bytes = 4 * (streamed + resident)
    return vmem_bytes < 13 * 1024 * 1024


def _gates(gx, gh, h_dim):
    r = jax.nn.sigmoid(gx[:, :h_dim] + gh[:, :h_dim])
    z = jax.nn.sigmoid(gx[:, h_dim:2 * h_dim] + gh[:, h_dim:2 * h_dim])
    n = jnp.tanh(gx[:, 2 * h_dim:] + r * gh[:, 2 * h_dim:])
    return r, z, n


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(gx_ref, whh_ref, bhh_ref, h0_ref, ys_ref, ht_ref, h_scr):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    h_dim = whh_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    gx = gx_ref[0]
    gh = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
    gh = gh + bhh_ref[0, :]
    r, z, n = _gates(gx, gh, h_dim)
    h_new = (1.0 - z) * n + z * h
    h_scr[:] = h_new
    ys_ref[0] = h_new

    @pl.when(t == nt - 1)
    def _():
        ht_ref[:] = h_new


def _fwd_call(gx, whh, bhh, h0):
    """gx arrives batch-major [B, L, 3H]; the kernel runs time-major
    [L, B, *] so each block's trailing dims are (B, 3H) — the TPU block
    tiling constraint (last two dims divisible by (8, 128))."""
    b, l, g3 = gx.shape
    h = g3 // 3
    gx_t = jnp.swapaxes(gx, 0, 1)  # [L, B, 3H]
    ys_t, ht = pl.pallas_call(
        _fwd_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((1, b, g3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, h), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
    )(gx_t, whh, bhh.reshape(1, g3), h0)
    return jnp.swapaxes(ys_t, 0, 1), ht


# ---------------------------------------------------------------------------
# Backward (reversed grid; recomputes gates from h_prev and gx_t)
# ---------------------------------------------------------------------------

def _bwd_kernel(gx_ref, whh_ref, bhh_ref, h0_ref, ys_prev_ref, dy_ref,
                dht_ref, dgx_ref, dh0_ref, dwhh_ref, dbhh_ref,
                dh_scr, dw_scr, db_scr):
    j = pl.program_id(0)
    nt = pl.num_programs(0)
    t = nt - 1 - j
    h_dim = whh_ref.shape[0]

    @pl.when(j == 0)
    def _():
        dh_scr[:] = dht_ref[:]
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    h_prev = jnp.where(t == 0, h0_ref[:], ys_prev_ref[0])
    gx = gx_ref[0]
    gh = jnp.dot(h_prev, whh_ref[:], preferred_element_type=jnp.float32)
    gh = gh + bhh_ref[0, :]
    r, z, n = _gates(gx, gh, h_dim)

    dh_total = dy_ref[0] + dh_scr[:]
    dn = dh_total * (1.0 - z)
    dz = dh_total * (h_prev - n)
    dn_pre = dn * (1.0 - n * n)
    dgh_n = dn_pre * r
    dr = dn_pre * gh[:, 2 * h_dim:]
    dz_pre = dz * z * (1.0 - z)
    dr_pre = dr * r * (1.0 - r)
    dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    dgh = jnp.concatenate([dr_pre, dz_pre, dgh_n], axis=1)

    dgx_ref[0] = dgx
    dh_prev = dh_total * z + jax.lax.dot_general(
        dgh, whh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_scr[:] = dh_prev
    dw_scr[:] += jax.lax.dot_general(
        h_prev, dgh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_scr[:] += jnp.sum(dgh, axis=0, keepdims=True)

    @pl.when(j == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dwhh_ref[:] = dw_scr[:]
        dbhh_ref[:] = db_scr[:]


def _bwd_call(gx, whh, bhh, h0, ys, dy, dht):
    b, l, g3 = gx.shape
    h = g3 // 3
    gx_t = jnp.swapaxes(gx, 0, 1)
    ys_t = jnp.swapaxes(ys, 0, 1)
    dy_t = jnp.swapaxes(dy, 0, 1)
    # h_prev stream: ys shifted one step back; index is clamped at t=0 and
    # the kernel selects h0 there instead.
    dgx_t, dh0, dwhh, dbhh = pl.pallas_call(
        _bwd_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((1, b, g3), lambda j, l=l: (l - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, b, h),
                lambda j, l=l: (jnp.maximum(l - 2 - j, 0), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), lambda j, l=l: (l - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, g3), lambda j, l=l: (l - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, b, g3), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((h, g3), jnp.float32),
            jax.ShapeDtypeStruct((1, g3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((h, g3), jnp.float32),
            pltpu.VMEM((1, g3), jnp.float32),
        ],
    )(gx_t, whh, bhh.reshape(1, g3), h0, ys_t, dy_t, dht)
    return jnp.swapaxes(dgx_t, 0, 1), dh0, dwhh, dbhh[0]


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gru_layer_scan(gx, whh, bhh, h0):
    """gx [B, L, 3H] f32, whh [H, 3H], bhh [3H], h0 [B, H]
    -> (ys [B, L, H], hT [B, H])."""
    return _fwd_call(gx, whh, bhh, h0)


def _fwd_rule(gx, whh, bhh, h0):
    ys, ht = _fwd_call(gx, whh, bhh, h0)
    return (ys, ht), (gx, whh, bhh, h0, ys)


def _bwd_rule(res, cots):
    gx, whh, bhh, h0, ys = res
    dy, dht = cots
    dgx, dh0, dwhh, dbhh = _bwd_call(gx, whh, bhh, h0, ys, dy, dht)
    return dgx, dwhh, dbhh, dh0


gru_layer_scan.defvjp(_fwd_rule, _bwd_rule)


def gru_layer_scan_sharded(gx, whh, bhh, h0, mesh=None):
    """``gru_layer_scan`` under a device mesh: the batch axis is sharded over
    'data' and each device runs the kernel on its shard (weights replicated;
    the recurrence is independent per batch row, so no collectives). Mosaic
    custom calls are not GSPMD-partitionable — without this wrapper a mesh
    run would have to fall back to the XLA lax.scan path."""
    if mesh is None or dict(mesh.shape).get("data", 1) <= 1:
        return gru_layer_scan(gx, whh, bhh, h0)
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        gru_layer_scan, mesh=mesh,
        in_specs=(P("data", None, None), P(), P(), P("data", None)),
        out_specs=(P("data", None, None), P("data", None)),
        check_vma=False)(gx, whh, bhh, h0)
