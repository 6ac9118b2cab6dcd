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

import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def adam_tx():
    # scale_by_adam only; the -lr scaling is applied in the step so lr can be
    # a runtime scalar (one compilation for the whole cosine schedule).
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(model, rng) -> TrainState:
    params = model.init(rng)
    opt_state = adam_tx().init(params)
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
