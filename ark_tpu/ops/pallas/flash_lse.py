"""The streaming (flash) log-sum-exp block update — THE single spec.

Every kernel that streams vocabulary blocks and needs a log-sum-exp
(the fused CE forward, the sampler's Gumbel pass A and CDF LSE pass)
must run exactly this update so their lse values are bitwise identical
— the sharded cross-shard merges (ops/collectives.merge_lse) and the
CE/sampler equivalence tests rely on it. Fix numerics here, never in a
per-kernel copy.

Masked/fully-masked-block behavior: masked columns carry NEG (-1e30);
a fully-masked block leaves m at NEG and adds exp(0)-order terms times
exp(NEG - m_new) = 0 once any live block has been seen, and while NO
live block has been seen the running (m=NEG, l=vb*1.0) state is
absorbed by the first live block's exp(NEG - m_new) = 0 rescale.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG = -1e30


def flash_lse_init(m_scr, l_scr):
    m_scr[:] = jnp.full_like(m_scr, NEG)
    l_scr[:] = jnp.zeros_like(l_scr)


def flash_lse_update(m_scr, l_scr, logits):
    """One block update: m_scr [N, 1] running max, l_scr [N, 1] running
    rescaled sum-exp, logits [N, VB] (masked columns = NEG)."""
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new


def flash_lse_final(m_scr, l_scr):
    return m_scr[:] + jnp.log(l_scr[:])
