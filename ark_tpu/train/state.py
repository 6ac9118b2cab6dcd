"""Training state, optimizer and schedules.

Optimizer: Adam with torch defaults (betas 0.9/0.999, eps 1e-8 — reference
train.py:449 ``optim.Adam(model.parameters(), lr=...)``). The learning rate
enters as a per-epoch scalar argument to the jitted step so the cosine
schedule (torch ``CosineAnnealingLR(T_max=num_epochs, eta_min)``, reference
train.py:452-457, stepped once per epoch at train.py:560-562) needs no
recompilation.

β-annealing for SAIL: linear beta0 -> beta1 over epochs (reference
ablation_study.py:590-591); the main trainer hardcodes β=1 (train.py:465,
SURVEY quirk Q-7).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def adam_tx(state_dtype=None, m_dtype=None, v_dtype=None):
    """scale_by_adam only; the -lr scaling is applied in the step so lr can
    be a runtime scalar (one compilation for the whole cosine schedule).

    ``state_dtype``: dtype of BOTH stored Adam moments. Default (None/f32)
    is optax's scale_by_adam — bit-exact with torch Adam semantics, the
    parity configuration. 'bfloat16' keeps mu/nu in bf16 with all moment
    math in f32 (cast on load/store): the optimizer update is HBM-bound
    over the 30M-param embedding (the largest single line in the traced
    wd-articles step, docs/BENCH_NOTES.md) and bf16 moments remove ~29% of
    its traffic. A perf mode, not bit-identical — and measured to COLLAPSE
    wd-articles validity (docs/ROADMAP.md negative results).

    ``m_dtype`` / ``v_dtype`` (config ``adam_m_dtype`` / ``adam_v_dtype``)
    isolate the two moments: the round-2 collapse was attributed to bf16
    second-moment (per-parameter step-size) precision, so a bf16 FIRST
    moment with an f32 second moment recovers ~14% of the optimizer
    traffic while keeping exact step sizes — each knob is quality-gated
    by its own hardware A/B before any default changes. Explicit m/v
    dtypes override ``state_dtype`` for their moment."""
    md = m_dtype or state_dtype
    vd = v_dtype or state_dtype
    as_dt = lambda d: jnp.dtype(str(d)) if d is not None else jnp.float32
    md, vd = as_dt(md), as_dt(vd)
    if md == jnp.float32 and vd == jnp.float32:
        return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    return _scale_by_adam_cast(0.9, 0.999, 1e-8, md, vd)


def _scale_by_adam_cast(b1, b2, eps, m_dtype, v_dtype):
    """optax.scale_by_adam semantics with mu stored in ``m_dtype`` and nu
    in ``v_dtype`` (all moment math in f32; cast on store)."""

    def init(params):
        zm = lambda p: jnp.zeros_like(p, dtype=m_dtype)
        zv = lambda p: jnp.zeros_like(p, dtype=v_dtype)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=jax.tree.map(zm, params),
                                      nu=jax.tree.map(zv, params))

    def update(grads, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(f32)
                          + (1 - b1) * g.astype(f32)).astype(m_dtype),
            state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: (b2 * v.astype(f32)
                          + (1 - b2) * jnp.square(g.astype(f32))).astype(v_dtype),
            state.nu, grads)
        count = state.count + 1
        c = count.astype(f32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        updates = jax.tree.map(
            lambda m, v: (m.astype(f32) / bc1)
            / (jnp.sqrt(v.astype(f32) / bc2) + eps),
            mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _adam_dtypes(cfg):
    """(state_dtype, m_dtype, v_dtype) from an experiment config."""
    if not isinstance(cfg, dict):
        return None, None, None
    return (cfg.get("adam_state_dtype"), cfg.get("adam_m_dtype"),
            cfg.get("adam_v_dtype"))


def resolve_adam_dtypes(cfg):
    """Concrete (m_dtype, v_dtype) for an experiment config.

    Applies the round-5 measured + validity-gated TPU default: when no
    Adam dtype knob is set, the FIRST moment is stored in bfloat16 on
    accelerator backends (+7.4% train throughput on the wd-articles
    headline config; the 15-epoch validity gate held the f32 line at
    96.9% vs 96.5%/95.0% f32 controls — runs_r5/ab/TABLE.md stage E).
    The second moment (per-parameter step size, the round-2 collapse
    attribution) always stays f32 unless explicitly overridden. CPU keeps
    f32 moments — the torch-Adam bit-parity configuration — and an
    explicit ``adam_m_dtype: float32`` forces it on TPU. ``use_fused_adam``
    also suppresses the auto default (the Pallas/XLA fused optimizer A/B
    paths carry f32 moments)."""
    state, m, v = _adam_dtypes(cfg)
    md = m or state
    vd = v or state
    if (md is None and vd is None
            and not (cfg or {}).get("use_fused_adam")
            and jax.default_backend() not in ("cpu",)):
        md = "bfloat16"
    as_dt = lambda d: jnp.dtype(str(d) if d is not None else jnp.float32)
    return as_dt(md), as_dt(vd)


def create_train_state(model, rng) -> TrainState:
    params = model.init(rng)
    opt_state = adam_tx(None, *resolve_adam_dtypes(
        getattr(model, "config", None))).init(params)
    return TrainState(params=params, opt_state=opt_state)


def cosine_annealing_lr(base_lr: float, epoch: int, t_max: int,
                        eta_min: float = 1e-6) -> float:
    """Closed form of torch CosineAnnealingLR at integer epoch steps."""
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2


def lr_for_epoch(config: dict, epoch: int) -> float:
    base = float(config["learning_rate"])
    if config.get("lr_scheduler", False):
        return cosine_annealing_lr(base, epoch, int(config["num_epochs"]),
                                   float(config.get("eta_min", 1e-6)))
    return base


def beta_for_epoch(config: dict, epoch: int, annealed: bool) -> float:
    if not annealed or config.get("model_type") not in ("SAIL", "t-SAIL"):
        return 1.0
    b0 = float(config.get("beta0", 1.0))
    b1 = float(config.get("beta1", 1.0))
    return b0 + (b1 - b0) * epoch / int(config["num_epochs"])
