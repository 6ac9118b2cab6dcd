"""Autoregressive decoders: teacher-forced ``apply`` plus O(1)-per-token
incremental ``step`` functions for the on-device sampling scans.

Four decoders mirror the reference capability set:

  - ``gru_lm``       — DecoderOnlyGRU        (reference models.py:323-345)
  - ``txf_lm``       — DecoderOnlyTransformer (reference models.py:349-366)
  - ``gru_cond``     — AutoRegDecoderGRU, z-conditioned via h0 = tanh(z_proj(z))
                       (reference models.py:116-142)
  - ``txf_cond``     — AutoRegDecoder, z-conditioned via cross-attention memory
                       (reference models.py:98-114). The reference repeats the
                       projected z L times as memory; attention over L identical
                       keys equals attention over one key, so we keep memory
                       length 1 (mathematically identical, 1/L the FLOPs).

Sampling-time improvements over the reference (which re-encodes the full
prefix every step, reference models.py:429-463 / SURVEY §3.3): GRU decoders
carry their hidden state through the scan (true O(L)); transformer decoders
carry a KV cache.

Weight tying (``tie_weights``) mirrors the reference's silent-no-op-on-shape-
mismatch behavior (models.py:130-134, SURVEY quirk Q-9): tied heads compute
logits = y @ tok_emb.T + b.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ark_tpu.models.initializers import embedding_init, linear_init, uniform_fan
from ark_tpu.models.gru import gru_apply, gru_init, gru_step
from ark_tpu.ops.embed import take_rows
from ark_tpu.models.layers import (
    causal_mask,
    decoder_layer,
    decoder_layer_init,
    encoder_layer,
    encoder_layer_init,
    layer_norm,
    linear,
    mha,
)


def _head_init(key, d_model, vocab_size, tie_weights):
    """Output projection; when tied, only the bias is a fresh parameter."""
    if tie_weights:
        return {"b": uniform_fan(key, (vocab_size,), d_model)}
    return linear_init(key, d_model, vocab_size)


def _head_apply(p_head, tok_emb, y, tied, vocab_out=None):
    """vocab_out: true vocab size; when the embedding/head are padded to a
    multiple (TPU lane alignment / vocab sharding divisibility), logits are
    sliced back so the math is exactly the unpadded model's."""
    if tied:
        logits = jnp.dot(y, tok_emb.astype(y.dtype).T,
                         preferred_element_type=jnp.float32)
        logits = logits + p_head["b"]
    else:
        logits = jnp.dot(y, p_head["w"].astype(y.dtype),
                         preferred_element_type=jnp.float32)
        logits = logits + p_head["b"]
    if vocab_out is not None and logits.shape[-1] != vocab_out:
        logits = logits[..., :vocab_out]
    return logits


# ---------------------------------------------------------------------------
# Incremental MHA with KV cache (for transformer sampling steps)
# ---------------------------------------------------------------------------

def _mha_step(p, x_t, cache_k, cache_v, pos, n_heads, window=None):
    """x_t [B, 1, D]; cache_k/v [B, H, L, dh] — head-major, the TPU-native
    KV layout: the per-step attention einsums read the caches directly, so
    no [B, L, D] <-> [B, H, L, dh] transpose materializes a full-cache copy
    every token (at the wd-articles sampling geometry those copies were
    ~0.5 GB/token-step of pure HBM churn across the 3 layers — the round-4
    t-ARK sampler gap, runs_r4/ab/bench_tark.json). pos: scalar int index.

    Writes the new k/v at ``pos`` and attends the single query over
    cache[..., : pos+1, :] (masked beyond pos). Returns
    (out [B, 1, D], new caches).

    ``window``: optional STATIC prefix length — attend over only the first
    ``window`` cache slots. The caller guarantees pos < window (the
    sampler's segmented token scan, sample/samplers.py). Bitwise-exact vs
    the full read: every removed key was masked to -1e30, whose exp
    underflows to 0.0 exactly, so softmax sums and the probs @ V
    contraction are unchanged — this is pure HBM strength reduction (the
    round-5 t-ARK trace showed the per-step full-cache read rivaling the
    streamed head, docs/BENCH_NOTES.md)."""
    d = x_t.shape[-1]
    bsz = x_t.shape[0]
    dh = d // n_heads
    L = cache_k.shape[2]
    w = p["in_proj_w"].astype(x_t.dtype)
    b = p["in_proj_b"]
    q = jnp.dot(x_t, w[:, :d], preferred_element_type=jnp.float32) + b[:d]
    k = jnp.dot(x_t, w[:, d:2 * d], preferred_element_type=jnp.float32) + b[d:2 * d]
    v = jnp.dot(x_t, w[:, 2 * d:], preferred_element_type=jnp.float32) + b[2 * d:]
    q, k, v = (t.astype(x_t.dtype) for t in (q, k, v))
    # per-token [B, 1, D] -> [B, H, 1, dh] transposes are tiny; the caches
    # stay head-major for their whole lifetime
    kh_t = k.reshape(bsz, 1, n_heads, dh).transpose(0, 2, 1, 3)
    vh_t = v.reshape(bsz, 1, n_heads, dh).transpose(0, 2, 1, 3)
    cache_k = jax.lax.dynamic_update_slice(cache_k, kh_t, (0, 0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, vh_t, (0, 0, pos, 0))

    win = L if window is None else min(int(window), L)
    ck = (cache_k if win == L
          else jax.lax.slice_in_dim(cache_k, 0, win, axis=2))
    cv = (cache_v if win == L
          else jax.lax.slice_in_dim(cache_v, 0, win, axis=2))
    qh = q.reshape(bsz, 1, n_heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, ck,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.asarray(dh, jnp.float32))
    valid = jnp.arange(win)[None, None, None, :] <= pos
    scores = jnp.where(valid, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(cv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, cv,
                     preferred_element_type=jnp.float32).astype(x_t.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(bsz, 1, d)
    return linear(p["out_proj"], out), cache_k, cache_v


def _encoder_layer_step(p, x_t, cache, pos, n_heads, window=None):
    a, ck, cv = _mha_step(p["self_attn"], x_t, cache["k"], cache["v"], pos,
                          n_heads, window=window)
    x = layer_norm(p["norm1"], x_t + a)
    h = jax.nn.relu(linear(p["linear1"], x))
    h = linear(p["linear2"], h)
    x = layer_norm(p["norm2"], x + h)
    return x, {"k": ck, "v": cv}


def _decoder_layer_step(p, x_t, memory, cache, pos, n_heads, window=None):
    a, ck, cv = _mha_step(p["self_attn"], x_t, cache["k"], cache["v"], pos,
                          n_heads, window=window)
    x = layer_norm(p["norm1"], x_t + a)
    c = mha(p["cross_attn"], x, memory, n_heads)
    x = layer_norm(p["norm2"], x + c)
    h = jax.nn.relu(linear(p["linear1"], x))
    h = linear(p["linear2"], h)
    x = layer_norm(p["norm3"], x + h)
    return x, {"k": ck, "v": cv}


def _empty_caches(n_layers, batch, n_heads, seq_len, d_model, dtype):
    dh = d_model // n_heads
    return [
        {"k": jnp.zeros((batch, n_heads, seq_len, dh), dtype),
         "v": jnp.zeros((batch, n_heads, seq_len, dh), dtype)}
        for _ in range(n_layers)
    ]


# ---------------------------------------------------------------------------
# DecoderOnlyGRU (M-6)
# ---------------------------------------------------------------------------

def gru_lm_init(key, vocab_size, d_model, n_layers, seq_len, tie_weights=True):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "tok_emb": embedding_init(k1, vocab_size, d_model),
        "pos_emb": embedding_init(k2, seq_len, d_model),
        "gru": gru_init(k3, d_model, d_model, n_layers),
        "out": _head_init(k4, d_model, vocab_size, tie_weights),
    }


def gru_lm_features(p, seq, *, dropout_rate=0.1, rng=None,
                    deterministic=True, dtype=jnp.float32, use_pallas=False,
                    mesh=None, use_pallas_embed=False):
    """Hidden states before the output head (for the fused-CE kernel)."""
    b, l = seq.shape
    x = (take_rows(p["tok_emb"], seq, use_pallas_embed)
         + p["pos_emb"][jnp.arange(l)][None]).astype(dtype)
    y, _ = gru_apply(p["gru"], x, dropout_rate=dropout_rate, rng=rng,
                     deterministic=deterministic, use_pallas=use_pallas,
                     mesh=mesh)
    return y


def gru_lm_apply(p, seq, *, dropout_rate=0.1, rng=None, deterministic=True,
                 tied=True, dtype=jnp.float32, vocab_out=None,
                 use_pallas=False, mesh=None, use_pallas_embed=False):
    y = gru_lm_features(p, seq, dropout_rate=dropout_rate, rng=rng,
                        deterministic=deterministic, dtype=dtype,
                        use_pallas=use_pallas, mesh=mesh,
                        use_pallas_embed=use_pallas_embed)
    return _head_apply(p["out"], p["tok_emb"], y, tied, vocab_out)


def gru_lm_state(p, batch, dtype=jnp.float32):
    n_layers = len(p["gru"]["layers"])
    h = p["gru"]["layers"][0]["w_hh"].shape[0]
    return jnp.zeros((batch, n_layers, h), dtype)


def gru_lm_step_features(p, state, token, pos, *, dtype=jnp.float32):
    """token [B] -> (hidden y [B, D], state) — the pre-head decode step
    (for the fused sampling kernel, ops/pallas/sample_step.py)."""
    x = (p["tok_emb"][token] + p["pos_emb"][pos]).astype(dtype)
    return gru_step(p["gru"], x, state)


def gru_lm_step(p, state, token, pos, *, tied=True, dtype=jnp.float32,
                vocab_out=None):
    """token [B] -> (logits [B, V], state)."""
    y, state = gru_lm_step_features(p, state, token, pos, dtype=dtype)
    return _head_apply(p["out"], p["tok_emb"], y, tied, vocab_out), state


# ---------------------------------------------------------------------------
# DecoderOnlyTransformer (M-7)
# ---------------------------------------------------------------------------

def txf_lm_init(key, vocab_size, d_model, n_heads, n_layers, seq_len,
                tie_weights=True):
    ks = jax.random.split(key, n_layers + 3)
    return {
        "tok_emb": embedding_init(ks[0], vocab_size, d_model),
        "pos_emb": embedding_init(ks[1], seq_len, d_model),
        "txf": [encoder_layer_init(ks[2 + i], d_model) for i in range(n_layers)],
        "out": _head_init(ks[-1], d_model, vocab_size, tie_weights),
    }


def txf_lm_features(p, seq, n_heads, *, dropout_rate=0.1, rng=None,
                    deterministic=True, dtype=jnp.float32,
                    use_pallas_embed=False):
    b, l = seq.shape
    x = (take_rows(p["tok_emb"], seq, use_pallas_embed)
         + p["pos_emb"][jnp.arange(l)][None]).astype(dtype)
    mask = causal_mask(l)
    rngs = (list(jax.random.split(rng, len(p["txf"]))) if rng is not None
            else [None] * len(p["txf"]))
    for lp, lr in zip(p["txf"], rngs):
        x = encoder_layer(lp, x, n_heads, attn_mask=mask,
                          dropout_rate=dropout_rate, rng=lr,
                          deterministic=deterministic)
    return x


def txf_lm_apply(p, seq, n_heads, *, dropout_rate=0.1, rng=None,
                 deterministic=True, tied=True, dtype=jnp.float32,
                 vocab_out=None, use_pallas_embed=False):
    x = txf_lm_features(p, seq, n_heads, dropout_rate=dropout_rate, rng=rng,
                        deterministic=deterministic, dtype=dtype,
                        use_pallas_embed=use_pallas_embed)
    return _head_apply(p["out"], p["tok_emb"], x, tied, vocab_out)


def txf_lm_state(p, batch, seq_len, n_heads, dtype=jnp.float32):
    d = p["tok_emb"].shape[1]
    return _empty_caches(len(p["txf"]), batch, n_heads, seq_len, d, dtype)


def txf_lm_step_features(p, state, token, pos, n_heads, *,
                         dtype=jnp.float32, window=None):
    x = (p["tok_emb"][token] + p["pos_emb"][pos]).astype(dtype)[:, None, :]
    new_state = []
    for lp, cache in zip(p["txf"], state):
        x, cache = _encoder_layer_step(lp, x, cache, pos, n_heads,
                                       window=window)
        new_state.append(cache)
    return x[:, 0, :], new_state


def txf_lm_step(p, state, token, pos, n_heads, *, tied=True,
                dtype=jnp.float32, vocab_out=None, window=None):
    y, new_state = txf_lm_step_features(p, state, token, pos, n_heads,
                                        dtype=dtype, window=window)
    logits = _head_apply(p["out"], p["tok_emb"], y, tied, vocab_out)
    return logits, new_state


# ---------------------------------------------------------------------------
# AutoRegDecoderGRU (M-4): z-conditioned GRU
# ---------------------------------------------------------------------------

def gru_cond_init(key, vocab_size, d_model, d_latent, n_layers, tie_weights=True):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "tok_emb": embedding_init(k1, vocab_size, d_model),
        "z_proj": linear_init(k2, d_latent, d_model),
        "gru": gru_init(k3, d_model, d_model, n_layers),
        "out": _head_init(k4, d_model, vocab_size, tie_weights),
    }


def _gru_cond_h0(p, z, n_layers, dtype):
    h0 = jnp.tanh(linear(p["z_proj"], z.astype(dtype)))
    return jnp.broadcast_to(h0[None], (n_layers,) + h0.shape)


def gru_cond_features(p, z, seq, *, dropout_rate=0.1, rng=None,
                      deterministic=True, dtype=jnp.float32,
                      use_pallas=False, mesh=None, use_pallas_embed=False):
    """Hidden states before the output head (for the fused-CE kernel)."""
    n_layers = len(p["gru"]["layers"])
    x = take_rows(p["tok_emb"], seq, use_pallas_embed).astype(dtype)
    h0 = _gru_cond_h0(p, z, n_layers, dtype)
    y, _ = gru_apply(p["gru"], x, h0, dropout_rate=dropout_rate, rng=rng,
                     deterministic=deterministic, use_pallas=use_pallas,
                     mesh=mesh)
    return y


def gru_cond_apply(p, z, seq, *, dropout_rate=0.1, rng=None,
                   deterministic=True, tied=True, dtype=jnp.float32,
                   vocab_out=None, use_pallas=False, mesh=None,
                   use_pallas_embed=False):
    y = gru_cond_features(p, z, seq, dropout_rate=dropout_rate, rng=rng,
                          deterministic=deterministic, dtype=dtype,
                          use_pallas=use_pallas, mesh=mesh,
                          use_pallas_embed=use_pallas_embed)
    return _head_apply(p["out"], p["tok_emb"], y, tied, vocab_out)


def gru_cond_state(p, z, dtype=jnp.float32):
    h0 = _gru_cond_h0(p, z, len(p["gru"]["layers"]), dtype)
    return jnp.swapaxes(h0, 0, 1)  # batch-leading [B, n_layers, H]


def gru_cond_step_features(p, state, token, pos, *, dtype=jnp.float32):
    x = p["tok_emb"][token].astype(dtype)
    return gru_step(p["gru"], x, state)


def gru_cond_step(p, state, token, pos, *, tied=True, dtype=jnp.float32,
                  vocab_out=None):
    y, state = gru_cond_step_features(p, state, token, pos, dtype=dtype)
    return _head_apply(p["out"], p["tok_emb"], y, tied, vocab_out), state


# ---------------------------------------------------------------------------
# AutoRegDecoder (M-3): z-conditioned transformer with cross-attention
# ---------------------------------------------------------------------------

def txf_cond_init(key, vocab_size, d_model, d_latent, n_heads, n_layers, seq_len):
    ks = jax.random.split(key, n_layers + 4)
    return {
        "tok_emb": embedding_init(ks[0], vocab_size, d_model),
        "pos_emb": embedding_init(ks[1], seq_len, d_model),
        "z_proj": linear_init(ks[2], d_latent, d_model),
        "txf": [decoder_layer_init(ks[3 + i], d_model) for i in range(n_layers)],
        "out": linear_init(ks[-1], d_model, vocab_size),
    }


def txf_cond_memory(p, z, dtype=jnp.float32):
    return linear(p["z_proj"], z.astype(dtype))[:, None, :]  # [B, 1, D]


def txf_cond_features(p, z, seq, n_heads, *, dropout_rate=0.1, rng=None,
                      deterministic=True, dtype=jnp.float32,
                      use_pallas_embed=False):
    """Hidden states before the output head (for the fused-CE kernel)."""
    b, l = seq.shape
    x = (take_rows(p["tok_emb"], seq, use_pallas_embed)
         + p["pos_emb"][jnp.arange(l)][None]).astype(dtype)
    mem = txf_cond_memory(p, z, dtype)
    mask = causal_mask(l)
    rngs = (list(jax.random.split(rng, len(p["txf"]))) if rng is not None
            else [None] * len(p["txf"]))
    for lp, lr in zip(p["txf"], rngs):
        x = decoder_layer(lp, x, mem, n_heads, tgt_mask=mask,
                          dropout_rate=dropout_rate, rng=lr,
                          deterministic=deterministic)
    return x


def txf_cond_apply(p, z, seq, n_heads, *, dropout_rate=0.1, rng=None,
                   deterministic=True, dtype=jnp.float32, vocab_out=None,
                   use_pallas_embed=False):
    x = txf_cond_features(p, z, seq, n_heads, dropout_rate=dropout_rate,
                          rng=rng, deterministic=deterministic, dtype=dtype,
                          use_pallas_embed=use_pallas_embed)
    logits = linear(p["out"], x)
    if vocab_out is not None and logits.shape[-1] != vocab_out:
        logits = logits[..., :vocab_out]
    return logits


def txf_cond_state(p, z, seq_len, n_heads, dtype=jnp.float32):
    d = p["tok_emb"].shape[1]
    b = z.shape[0]
    return {
        "mem": txf_cond_memory(p, z, dtype),
        "caches": _empty_caches(len(p["txf"]), b, n_heads, seq_len, d, dtype),
    }


def txf_cond_step_features(p, state, token, pos, n_heads, *,
                           dtype=jnp.float32, window=None):
    x = (p["tok_emb"][token] + p["pos_emb"][pos]).astype(dtype)[:, None, :]
    new_caches = []
    for lp, cache in zip(p["txf"], state["caches"]):
        x, cache = _decoder_layer_step(lp, x, state["mem"], cache, pos,
                                       n_heads, window=window)
        new_caches.append(cache)
    return x[:, 0, :], {"mem": state["mem"], "caches": new_caches}


def txf_cond_step(p, state, token, pos, n_heads, *, dtype=jnp.float32,
                  vocab_out=None, window=None):
    y, state = txf_cond_step_features(p, state, token, pos, n_heads,
                                      dtype=dtype, window=window)
    logits = linear(p["out"], y)
    if vocab_out is not None and logits.shape[-1] != vocab_out:
        logits = logits[..., :vocab_out]
    return logits, state
