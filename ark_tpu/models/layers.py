"""Core functional layers: linear, layernorm, dropout, multi-head attention,
and torch-semantics Transformer encoder/decoder layers (post-LN, ReLU FFN,
dim_feedforward=2048 — the torch defaults the reference constructs with at
models.py:73, 104, 355).

All layers are (init, apply) pairs over plain dict pytrees. Activations run in
``dtype`` (config ``compute_dtype``) while parameters stay float32; matmuls
feed the MXU in the compute dtype with float32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ark_tpu.models.initializers import linear_init, uniform_fan, xavier_uniform

D_FF_DEFAULT = 2048  # torch nn.Transformer*Layer default dim_feedforward


def linear(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def layer_norm_init(dim):
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return y.astype(x.dtype)


def dropout(x, rate, rng, deterministic):
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Multi-head attention (torch nn.MultiheadAttention semantics: fused in_proj,
# out_proj, scaled dot-product, optional additive/boolean masks, attn dropout).
# ---------------------------------------------------------------------------

def mha_init(key, d_model):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "in_proj_w": xavier_uniform(k1, (d_model, 3 * d_model), d_model, d_model),
        "in_proj_b": jnp.zeros((3 * d_model,), jnp.float32),
        "out_proj": {
            "w": uniform_fan(k2, (d_model, d_model), d_model),
            "b": jnp.zeros((d_model,), jnp.float32),
        },
    }


def _split_heads(x, n_heads):
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def mha(p, q_in, kv_in, n_heads, *, attn_mask=None, key_padding_mask=None,
        dropout_rate=0.0, rng=None, deterministic=True):
    """q_in [B, Lq, D], kv_in [B, Lk, D].

    attn_mask: bool [Lq, Lk], True = masked (torch convention).
    key_padding_mask: bool [B, Lk], True = masked.
    """
    d = q_in.shape[-1]
    dh = d // n_heads
    w = p["in_proj_w"].astype(q_in.dtype)
    b = p["in_proj_b"]
    q = jnp.dot(q_in, w[:, :d], preferred_element_type=jnp.float32) + b[:d]
    k = jnp.dot(kv_in, w[:, d:2 * d], preferred_element_type=jnp.float32) + b[d:2 * d]
    v = jnp.dot(kv_in, w[:, 2 * d:], preferred_element_type=jnp.float32) + b[2 * d:]
    q, k, v = (_split_heads(t.astype(q_in.dtype), n_heads) for t in (q, k, v))

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.asarray(dh, jnp.float32))
    neg = jnp.asarray(-1e30, scores.dtype)
    if attn_mask is not None:
        scores = jnp.where(attn_mask[None, None, :, :], neg, scores)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        probs = dropout(probs, dropout_rate, rng, deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q_in.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(q_in.shape[0], q_in.shape[1], d)
    return linear(p["out_proj"], out)


# ---------------------------------------------------------------------------
# Transformer encoder layer (torch nn.TransformerEncoderLayer, post-norm):
#   x = LN1(x + Drop(SelfAttn(x)));  x = LN2(x + Drop(W2 Drop(relu(W1 x))))
# ---------------------------------------------------------------------------

def encoder_layer_init(key, d_model, d_ff=D_FF_DEFAULT):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks[0], d_model),
        "linear1": linear_init(ks[1], d_model, d_ff),
        "linear2": linear_init(ks[2], d_ff, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
    }


def encoder_layer(p, x, n_heads, *, attn_mask=None, key_padding_mask=None,
                  dropout_rate=0.1, rng=None, deterministic=True):
    if rng is None:
        rngs = [None] * 4
    else:
        rngs = list(jax.random.split(rng, 4))
    a = mha(p["self_attn"], x, x, n_heads, attn_mask=attn_mask,
            key_padding_mask=key_padding_mask, dropout_rate=dropout_rate,
            rng=rngs[0], deterministic=deterministic)
    x = layer_norm(p["norm1"], x + dropout(a, dropout_rate, rngs[1], deterministic))
    h = jax.nn.relu(linear(p["linear1"], x))
    h = dropout(h, dropout_rate, rngs[2], deterministic)
    h = linear(p["linear2"], h)
    x = layer_norm(p["norm2"], x + dropout(h, dropout_rate, rngs[3], deterministic))
    return x


# ---------------------------------------------------------------------------
# Transformer decoder layer (torch nn.TransformerDecoderLayer, post-norm):
# self-attn (causal) -> cross-attn over memory -> FFN, each with Add&Norm.
# ---------------------------------------------------------------------------

def decoder_layer_init(key, d_model, d_ff=D_FF_DEFAULT):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": mha_init(ks[0], d_model),
        "cross_attn": mha_init(ks[1], d_model),
        "linear1": linear_init(ks[2], d_model, d_ff),
        "linear2": linear_init(ks[3], d_ff, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
        "norm3": layer_norm_init(d_model),
    }


def decoder_layer(p, x, memory, n_heads, *, tgt_mask=None, dropout_rate=0.1,
                  rng=None, deterministic=True):
    if rng is None:
        rngs = [None] * 6
    else:
        rngs = list(jax.random.split(rng, 6))
    a = mha(p["self_attn"], x, x, n_heads, attn_mask=tgt_mask,
            dropout_rate=dropout_rate, rng=rngs[0], deterministic=deterministic)
    x = layer_norm(p["norm1"], x + dropout(a, dropout_rate, rngs[1], deterministic))
    c = mha(p["cross_attn"], x, memory, n_heads, dropout_rate=dropout_rate,
            rng=rngs[2], deterministic=deterministic)
    x = layer_norm(p["norm2"], x + dropout(c, dropout_rate, rngs[3], deterministic))
    h = jax.nn.relu(linear(p["linear1"], x))
    h = dropout(h, dropout_rate, rngs[4], deterministic)
    h = linear(p["linear2"], h)
    x = layer_norm(p["norm3"], x + dropout(h, dropout_rate, rngs[5], deterministic))
    return x


def causal_mask(length):
    """Boolean [L, L], True above the diagonal (masked) — torch triu(..., 1)."""
    return jnp.triu(jnp.ones((length, length), bool), 1)
