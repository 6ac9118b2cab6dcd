"""Parameter initializers matching PyTorch's default distributions.

The reference relies entirely on torch defaults (SURVEY.md §7 "hard parts"
item 2 — initializer distributions shift training curves):

  - nn.Embedding: N(0, 1); padding_idx row zeroed
  - nn.Linear(in, out): W, b ~ U(-1/sqrt(in), 1/sqrt(in))
    (kaiming_uniform(a=sqrt(5)) reduces to this bound)
  - nn.GRU: every weight/bias ~ U(-1/sqrt(hidden), 1/sqrt(hidden))
  - nn.MultiheadAttention: in_proj xavier_uniform, in_proj bias 0,
    out_proj bias 0
  - nn.LayerNorm: gamma 1, beta 0
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform_fan(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def normal(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def embedding_init(key, num_embeddings, dim, padding_idx=None, dtype=jnp.float32):
    w = normal(key, (num_embeddings, dim), dtype)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return w


def linear_init(key, in_features, out_features, bias=True, dtype=jnp.float32):
    """Returns {'w': [in, out], 'b': [out]} (note: w stored input-major; a
    torch Linear.weight of shape [out, in] corresponds to w.T)."""
    kw, kb = jax.random.split(key)
    p = {"w": uniform_fan(kw, (in_features, out_features), in_features, dtype)}
    if bias:
        p["b"] = uniform_fan(kb, (out_features,), in_features, dtype)
    return p
