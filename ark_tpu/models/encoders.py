"""Graph encoders for the SAIL (VAE) family.

  - ``mlp_encoder``  — reference AutoRegEncoderMLP (models.py:13-64): embed
    (h, r, t), concat to 3*d_model, masked mean-pool over triples (PAD_RID
    mask), n-layer GELU MLP, mu / logv heads with logv clamped to [-10, 10].
  - ``txf_encoder``  — reference AutoRegEncoder (models.py:66-95): same
    embedding, torch-default TransformerEncoder over 3*d_model with
    src_key_padding_mask, masked mean-pool, mu / logv heads (no clamp).

Both return (z, mu, logv) with z = mu + eps * exp(0.5 * logv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ark_tpu.models.initializers import embedding_init, linear_init
from ark_tpu.models.layers import encoder_layer, encoder_layer_init, linear
from ark_tpu.ops.embed import take_triples


def _embed_triples(p, triples, dtype, use_pallas_embed=False):
    """(h|r|t) embed+concat — the BASELINE.json embedding-gather kernel
    target; ``use_pallas_embed`` routes it through the fused Pallas
    row-DMA kernel (ops/pallas/embed_gather.py), bit-identical."""
    return take_triples(p["e_emb"], p["r_emb"], triples,
                        use_pallas=use_pallas_embed, dtype=dtype)


def _masked_mean(x, triples, pad_rid):
    if pad_rid is None:
        return x.mean(axis=1)
    mask = (triples[:, :, 1] != pad_rid).astype(x.dtype)
    denom = jnp.clip(mask.sum(axis=1, keepdims=True), 1, None)
    return (x * mask[:, :, None]).sum(axis=1) / denom


def _reparam(mu, logv, rng):
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logv)


# -------------------------- MLP encoder (M-1) ------------------------------

def mlp_encoder_init(key, n_entities, n_relations, d_model, d_latent,
                     n_layers, pad_eid=None, pad_rid=None):
    d_in = d_model * 3
    hidden = max(d_in, d_model * 2)
    ks = jax.random.split(key, n_layers + 4)
    mlp = []
    in_dim = d_in
    for i in range(n_layers):
        mlp.append(linear_init(ks[i], in_dim, hidden))
        in_dim = hidden
    return {
        "e_emb": embedding_init(ks[-4], n_entities, d_model, padding_idx=pad_eid),
        "r_emb": embedding_init(ks[-3], n_relations, d_model, padding_idx=pad_rid),
        "mlp": mlp,
        "mu": linear_init(ks[-2], hidden, d_latent),
        "logv": linear_init(ks[-1], hidden, d_latent),
    }


def mlp_encoder_apply(p, triples, rng, pad_rid=None, dtype=jnp.float32,
                      use_pallas_embed=False):
    x = _embed_triples(p, triples, dtype, use_pallas_embed)
    g = _masked_mean(x, triples, pad_rid)
    for lp in p["mlp"]:
        g = jax.nn.gelu(linear(lp, g), approximate=False)
    mu = linear(p["mu"], g).astype(jnp.float32)
    logv = jnp.clip(linear(p["logv"], g).astype(jnp.float32), -10.0, 10.0)
    z = _reparam(mu, logv, rng)
    return z, mu, logv


# ----------------------- Transformer encoder (M-2) -------------------------

def txf_encoder_init(key, n_entities, n_relations, d_model, d_latent,
                     n_heads, n_layers, pad_eid=None, pad_rid=None):
    d = d_model * 3
    ks = jax.random.split(key, n_layers + 4)
    return {
        "e_emb": embedding_init(ks[-4], n_entities, d_model, padding_idx=pad_eid),
        "r_emb": embedding_init(ks[-3], n_relations, d_model, padding_idx=pad_rid),
        "txf": [encoder_layer_init(ks[i], d) for i in range(n_layers)],
        "mu": linear_init(ks[-2], d, d_latent),
        "logv": linear_init(ks[-1], d, d_latent),
    }


def txf_encoder_apply(p, triples, rng, n_heads, pad_rid=None,
                      dropout_rate=0.1, deterministic=True, dtype=jnp.float32,
                      use_pallas_embed=False):
    x = _embed_triples(p, triples, dtype, use_pallas_embed)
    key_padding_mask = None
    if pad_rid is not None:
        key_padding_mask = triples[:, :, 1] == pad_rid  # True = masked
    rngs = list(jax.random.split(rng, len(p["txf"]) + 1))
    for lp, lr in zip(p["txf"], rngs[:-1]):
        x = encoder_layer(lp, x, n_heads, key_padding_mask=key_padding_mask,
                          dropout_rate=dropout_rate, rng=lr,
                          deterministic=deterministic)
    x = _masked_mean(x, triples, pad_rid)
    mu = linear(p["mu"], x).astype(jnp.float32)
    logv = linear(p["logv"], x).astype(jnp.float32)
    z = _reparam(mu, logv, rngs[-1])
    return z, mu, logv
