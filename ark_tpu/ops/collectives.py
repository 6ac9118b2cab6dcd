"""Shared cross-shard collective helpers used inside shard_map bodies."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def merge_lse(lse_local, axis_name: str):
    """Cross-shard flash-logsumexp merge (per row): each shard holds the
    logsumexp of ITS vocab slice; the global value is the same flash
    max-shift algebra applied once more across shards.

    The max shift is only for numerical range; its gradient contributions
    cancel exactly in d/d lse_local [m + log(sum exp(lse_local - m))], so
    ``stop_gradient`` keeps the math exact AND sidesteps pmax's missing
    differentiation rule. Single definition for all three users (training
    CE, fused sampling, compression eval) so the gradient subtlety lives
    in one place."""
    m = jax.lax.pmax(jax.lax.stop_gradient(lse_local), axis_name)
    return m + jnp.log(jax.lax.psum(jnp.exp(lse_local - m), axis_name))
