"""Model families and the unified functional model API.

Two families, four model_types, matching the reference registry
(SAIL/t-SAIL: reference models.py:144-197; ARK/t-ARK: models.py:368-393):

  - 'SAIL'   = MLP graph encoder (M-1)          + GRU conditional decoder (M-4)
  - 't-SAIL' = Transformer graph encoder (M-2)  + Transformer cond decoder (M-3)
  - 'ARK'    = decoder-only GRU LM (M-6)
  - 't-ARK'  = decoder-only Transformer LM (M-7)

The returned ``Model`` exposes pure functions (all jit-able):

  init(rng) -> params
  apply:
     lm:  (params, seq, *, rng=None, deterministic=True) -> logits [B, L, V]
     vae: (params, triples, seq, *, rng, deterministic) -> (logits, mu, logv)
  encode (vae only): (params, triples, rng) -> (z, mu, logv)
  decode_state: lm (params, batch) -> state ; vae (params, z) -> state
  decode_step: (params, state, token [B], pos) -> (logits [B, V], state)

``decode_state``/``decode_step`` power the lax.scan samplers in
ark_tpu/sample (O(1) per token: GRU hidden-state carry / transformer KV
cache — improving on the reference's full-prefix recompute, models.py:429-463).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ark_tpu.models import decoders, encoders

MODEL_TYPES = ("SAIL", "t-SAIL", "ARK", "t-ARK")


@dataclasses.dataclass(frozen=True)
class Model:
    config: dict
    kind: str           # 'lm' | 'vae'
    decoder_arch: str   # 'gru' | 'txf'
    init: Callable
    apply: Callable
    decode_state: Callable
    decode_step: Callable
    encode: Optional[Callable] = None
    # fused-CE hooks: hidden states + embedding-layout head.
    #   lm:  features(params, seq, rng, deterministic) -> y [B, L, D]
    #   vae: features(params, triples, seq, rng, deterministic)
    #          -> (y [B, L, D], mu, logv)
    features: Optional[Callable] = None
    head: Optional[Callable] = None       # (params) -> (w [Vp, D], b [Vp])
    # pre-head decode step (params, state, token, pos) -> (y [B, D], state);
    # with ``head``, powers the fused sampling kernel
    # (ops/pallas/sample_step.py) which never materializes [B, V] logits
    decode_step_features: Optional[Callable] = None

    @property
    def model_type(self) -> str:
        return self.config["model_type"]


def kl_mean(mu, logv):
    """Batch-mean KL(q||N(0,I)) per dimension (reference models.py:199-200)."""
    return -0.5 * jnp.mean(1 + logv - jnp.square(mu) - jnp.exp(logv))


def kl_per_graph(mu, logv):
    """Per-graph KL in nats (reference models.py:240)."""
    return -0.5 * jnp.sum(1 + logv - jnp.square(mu) - jnp.exp(logv), axis=1)


def _dtype(config):
    return jnp.dtype(config.get("compute_dtype", "float32"))


def build_model(config: dict, mesh=None) -> Model:
    """``mesh``: optional jax.sharding.Mesh with a 'data' axis. The Pallas
    GRU kernel is then wrapped in shard_map per batch shard (Mosaic custom
    calls are not GSPMD-partitionable); all XLA ops partition via GSPMD from
    the input shardings, so a mesh-built model computes exactly the same
    values as a single-device one."""
    mt = config["model_type"]
    if mt not in MODEL_TYPES:
        raise NotImplementedError(
            f"Model type '{mt}' is not implemented. Use one of: {MODEL_TYPES}."
        )
    d_model = config["d_model"]
    n_layers = config["n_layers"]
    seq_len = config["seq_len"]
    vocab_size = config["vocab_size"]
    # pad the embedding/head vocab dimension to a multiple (TPU lane
    # alignment and mesh-divisibility for vocab sharding); logits are sliced
    # back to vocab_size so the math is exactly the unpadded model's
    mult = int(config.get("vocab_pad_multiple", 1))
    vocab_padded = ((vocab_size + mult - 1) // mult) * mult
    dtype = _dtype(config)
    dec_dropout = config.get("dec_dropout", 0.1)
    tied = bool(config.get("tie_weights", True))
    _pg = config.get("use_pallas_gru", "auto")
    if _pg == "auto":
        # on TPU: fused multi-layer stack kernel where shapes allow, else the
        # per-layer kernel (bit-matches the scan path), else lax.scan
        use_pallas_gru = "auto" if jax.default_backend() not in ("cpu",) \
            else False
    elif _pg in ("stack", "perlayer"):
        use_pallas_gru = _pg
    else:
        use_pallas_gru = bool(_pg)
    # Pallas embedding-gather (ops/pallas/embed_gather.py; BASELINE.json
    # kernel target). 'auto' currently resolves to off: the A/B vs XLA's
    # gather (scripts/bench_embed_gather.py) decides whether it defaults on.
    # Forced off under a mesh: Mosaic custom calls aren't GSPMD-partitionable
    # and the gather sites sit outside the GRU shard_map.
    _pe = config.get("use_pallas_embed", False)
    if _pe == "auto" or mesh is not None:
        use_pallas_embed = False
    elif _pe in ("block", "dma"):
        use_pallas_embed = _pe
    else:
        use_pallas_embed = bool(_pe)
    if use_pallas_embed and jax.default_backend() not in ("cpu",):
        # the 'block' schedule is interpret-only — its (1, D) blocks fail
        # Mosaic's (8, 128) block-shape rule at lowering (round-5 hardware
        # A/B; ops/pallas/embed_gather.py docstring)
        use_pallas_embed = "dma"

    if mt == "ARK":
        def init(rng):
            return decoders.gru_lm_init(rng, vocab_padded, d_model, n_layers,
                                        seq_len, tie_weights=tied)

        def apply(params, seq, *, rng=None, deterministic=True):
            return decoders.gru_lm_apply(
                params, seq, dropout_rate=dec_dropout, rng=rng,
                deterministic=deterministic, tied=tied, dtype=dtype,
                vocab_out=vocab_size, use_pallas=use_pallas_gru, mesh=mesh,
                use_pallas_embed=use_pallas_embed)

        def decode_state(params, batch):
            return decoders.gru_lm_state(params, batch, dtype)

        def decode_step(params, state, token, pos):
            return decoders.gru_lm_step(params, state, token, pos,
                                        tied=tied, dtype=dtype,
                                        vocab_out=vocab_size)

        features = head = None
        if tied:
            def features(params, seq, rng=None, deterministic=True):
                return decoders.gru_lm_features(
                    params, seq, dropout_rate=dec_dropout, rng=rng,
                    deterministic=deterministic, dtype=dtype,
                    use_pallas=use_pallas_gru, mesh=mesh,
                    use_pallas_embed=use_pallas_embed)

            def head(params):
                return params["tok_emb"], params["out"]["b"]

        def decode_step_features(params, state, token, pos):
            return decoders.gru_lm_step_features(params, state, token, pos,
                                                 dtype=dtype)

        return Model(config, "lm", "gru", init, apply, decode_state,
                     decode_step, features=features, head=head,
                     decode_step_features=decode_step_features)

    if mt == "t-ARK":
        n_heads = config["n_heads"]

        def init(rng):
            return decoders.txf_lm_init(rng, vocab_padded, d_model, n_heads,
                                        n_layers, seq_len, tie_weights=tied)

        def apply(params, seq, *, rng=None, deterministic=True):
            return decoders.txf_lm_apply(
                params, seq, n_heads, dropout_rate=dec_dropout, rng=rng,
                deterministic=deterministic, tied=tied, dtype=dtype,
                vocab_out=vocab_size, use_pallas_embed=use_pallas_embed)

        def decode_state(params, batch):
            return decoders.txf_lm_state(params, batch, seq_len, n_heads,
                                         dtype)

        def decode_step(params, state, token, pos, window=None):
            return decoders.txf_lm_step(params, state, token, pos, n_heads,
                                        tied=tied, dtype=dtype,
                                        vocab_out=vocab_size, window=window)

        features = head = None
        if tied:
            def features(params, seq, rng=None, deterministic=True):
                return decoders.txf_lm_features(
                    params, seq, n_heads, dropout_rate=dec_dropout, rng=rng,
                    deterministic=deterministic, dtype=dtype,
                    use_pallas_embed=use_pallas_embed)

            def head(params):
                return params["tok_emb"], params["out"]["b"]

        def decode_step_features(params, state, token, pos, window=None):
            return decoders.txf_lm_step_features(params, state, token, pos,
                                                 n_heads, dtype=dtype,
                                                 window=window)

        return Model(config, "lm", "txf", init, apply, decode_state,
                     decode_step, features=features, head=head,
                     decode_step_features=decode_step_features)

    # ------------------------------ VAE family ------------------------------
    d_latent = config["d_latent"]
    n_entities = config["n_entities"]
    n_relations = config["n_relations"]
    pad_eid = config.get("pad_eid")
    pad_rid = config.get("pad_rid")

    if mt == "SAIL":
        def init(rng):
            k_enc, k_dec = jax.random.split(rng)
            return {
                "enc": encoders.mlp_encoder_init(
                    k_enc, n_entities, n_relations, d_model, d_latent,
                    n_layers, pad_eid=pad_eid, pad_rid=pad_rid),
                "dec": decoders.gru_cond_init(
                    k_dec, vocab_padded, d_model, d_latent, n_layers,
                    tie_weights=tied),
            }

        def encode(params, triples, rng):
            return encoders.mlp_encoder_apply(
                params["enc"], triples, rng, pad_rid=pad_rid, dtype=dtype,
                use_pallas_embed=use_pallas_embed)

        def apply(params, triples, seq, *, rng, deterministic=True):
            k_enc, k_dec = jax.random.split(rng)
            z, mu, logv = encode(params, triples, k_enc)
            logits = decoders.gru_cond_apply(
                params["dec"], z, seq, dropout_rate=dec_dropout, rng=k_dec,
                deterministic=deterministic, tied=tied, dtype=dtype,
                vocab_out=vocab_size, use_pallas=use_pallas_gru, mesh=mesh,
                use_pallas_embed=use_pallas_embed)
            return logits, mu, logv

        def decode_state(params, z):
            return decoders.gru_cond_state(params["dec"], z, dtype)

        def decode_step(params, state, token, pos):
            return decoders.gru_cond_step(params["dec"], state, token, pos,
                                          tied=tied, dtype=dtype,
                                          vocab_out=vocab_size)

        features = head = None
        if tied:
            def features(params, triples, seq, rng=None, deterministic=True):
                k_enc, k_dec = jax.random.split(rng)
                z, mu, logv = encode(params, triples, k_enc)
                y = decoders.gru_cond_features(
                    params["dec"], z, seq, dropout_rate=dec_dropout,
                    rng=k_dec, deterministic=deterministic, dtype=dtype,
                    use_pallas=use_pallas_gru, mesh=mesh,
                    use_pallas_embed=use_pallas_embed)
                return y, mu, logv

            def head(params):
                return params["dec"]["tok_emb"], params["dec"]["out"]["b"]

        def decode_step_features(params, state, token, pos):
            return decoders.gru_cond_step_features(params["dec"], state,
                                                   token, pos, dtype=dtype)

        return Model(config, "vae", "gru", init, apply, decode_state,
                     decode_step, encode=encode, features=features, head=head,
                     decode_step_features=decode_step_features)

    # t-SAIL
    n_heads = config["n_heads"]

    def init(rng):
        k_enc, k_dec = jax.random.split(rng)
        return {
            "enc": encoders.txf_encoder_init(
                k_enc, n_entities, n_relations, d_model, d_latent, n_heads,
                n_layers, pad_eid=pad_eid, pad_rid=pad_rid),
            "dec": decoders.txf_cond_init(
                k_dec, vocab_padded, d_model, d_latent, n_heads, n_layers,
                seq_len),
        }

    def encode(params, triples, rng, deterministic=True):
        return encoders.txf_encoder_apply(
            params["enc"], triples, rng, n_heads, pad_rid=pad_rid,
            deterministic=deterministic, dtype=dtype,
            use_pallas_embed=use_pallas_embed)

    def apply(params, triples, seq, *, rng, deterministic=True):
        k_enc, k_dec = jax.random.split(rng)
        z, mu, logv = encode(params, triples, k_enc, deterministic=deterministic)
        logits = decoders.txf_cond_apply(
            params["dec"], z, seq, n_heads, rng=k_dec,
            deterministic=deterministic, dtype=dtype, vocab_out=vocab_size,
            use_pallas_embed=use_pallas_embed)
        return logits, mu, logv

    def decode_state(params, z):
        return decoders.txf_cond_state(params["dec"], z, seq_len, n_heads,
                                       dtype)

    def decode_step(params, state, token, pos, window=None):
        return decoders.txf_cond_step(params["dec"], state, token, pos,
                                      n_heads, dtype=dtype,
                                      vocab_out=vocab_size, window=window)

    def features(params, triples, seq, rng=None, deterministic=True):
        k_enc, k_dec = jax.random.split(rng)
        z, mu, logv = encode(params, triples, k_enc,
                             deterministic=deterministic)
        y = decoders.txf_cond_features(
            params["dec"], z, seq, n_heads, rng=k_dec,
            deterministic=deterministic, dtype=dtype,
            use_pallas_embed=use_pallas_embed)
        return y, mu, logv

    def head(params):
        # the conditional transformer head is untied (reference
        # models.py:98-114); transpose [D, Vp] -> embedding layout [Vp, D]
        return params["dec"]["out"]["w"].T, params["dec"]["out"]["b"]

    def decode_step_features(params, state, token, pos, window=None):
        return decoders.txf_cond_step_features(params["dec"], state, token,
                                               pos, n_heads, dtype=dtype,
                                               window=window)

    return Model(config, "vae", "txf", init, apply, decode_state, decode_step,
                 encode=encode, features=features, head=head,
                 decode_step_features=decode_step_features)
