"""Numerical parity of the JAX layers against torch modules (the reference's
building blocks). SURVEY.md §7 hard-parts 2 and 4: GRU gate conventions and
transformer layer semantics must match torch or training curves diverge.

Strategy: build the torch module, copy its weights into the ark_tpu pytree
layout, and compare forward outputs on random inputs (eval mode, f32).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ark_tpu.models import gru as jgru
from ark_tpu.models import layers as jlayers

torch.manual_seed(0)
RTOL, ATOL = 1e-4, 1e-5


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def _copy_gru(tg, n_layers):
    layers = []
    for l in range(n_layers):
        layers.append({
            "w_ih": t2j(getattr(tg, f"weight_ih_l{l}")).T,
            "w_hh": t2j(getattr(tg, f"weight_hh_l{l}")).T,
            "b_ih": t2j(getattr(tg, f"bias_ih_l{l}")),
            "b_hh": t2j(getattr(tg, f"bias_hh_l{l}")),
        })
    return {"layers": layers}


def test_gru_matches_torch():
    d, h, n_layers, b, L = 16, 16, 3, 4, 11
    tg = torch.nn.GRU(d, h, num_layers=n_layers, batch_first=True).eval()
    params = _copy_gru(tg, n_layers)
    x = torch.randn(b, L, d)
    h0 = torch.randn(n_layers, b, h)
    with torch.no_grad():
        ty, th = tg(x, h0)
    jy, jh = jgru.gru_apply(params, t2j(x), t2j(h0))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), rtol=RTOL, atol=ATOL)


def test_gru_step_matches_apply():
    d, n_layers, b, L = 8, 2, 3, 7
    params = jgru.gru_init(jax.random.key(0), d, d, n_layers)
    x = jax.random.normal(jax.random.key(1), (b, L, d))
    y_full, hT = jgru.gru_apply(params, x)
    h = jnp.zeros((b, n_layers, d))  # decode states are batch-leading
    ys = []
    for t in range(L):
        y, h = jgru.gru_step(params, x[:, t], h)
        ys.append(y)
    np.testing.assert_allclose(np.asarray(jnp.stack(ys, 1)),
                               np.asarray(y_full), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(h, 0, 1)),
                               np.asarray(hT), rtol=1e-5, atol=1e-6)


def _copy_mha(tm):
    return {
        "in_proj_w": t2j(tm.in_proj_weight).T,
        "in_proj_b": t2j(tm.in_proj_bias),
        "out_proj": {"w": t2j(tm.out_proj.weight).T, "b": t2j(tm.out_proj.bias)},
    }


def _copy_encoder_layer(tl):
    return {
        "self_attn": _copy_mha(tl.self_attn),
        "linear1": {"w": t2j(tl.linear1.weight).T, "b": t2j(tl.linear1.bias)},
        "linear2": {"w": t2j(tl.linear2.weight).T, "b": t2j(tl.linear2.bias)},
        "norm1": {"g": t2j(tl.norm1.weight), "b": t2j(tl.norm1.bias)},
        "norm2": {"g": t2j(tl.norm2.weight), "b": t2j(tl.norm2.bias)},
    }


def test_encoder_layer_matches_torch():
    d, nh, b, L = 24, 4, 3, 9
    tl = torch.nn.TransformerEncoderLayer(d, nh, batch_first=True).eval()
    p = _copy_encoder_layer(tl)
    x = torch.randn(b, L, d)
    causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)
    with torch.no_grad():
        ty = tl(x, src_mask=causal)
    jy = jlayers.encoder_layer(p, t2j(x), nh, attn_mask=jlayers.causal_mask(L))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=RTOL, atol=1e-4)

    # key padding mask variant (used by the t-SAIL encoder, models.py:87)
    kpm = torch.zeros(b, L, dtype=torch.bool)
    kpm[:, -2:] = True
    with torch.no_grad():
        ty2 = tl(x, src_key_padding_mask=kpm)
    jy2 = jlayers.encoder_layer(p, t2j(x), nh, key_padding_mask=t2j(kpm))
    np.testing.assert_allclose(np.asarray(jy2), ty2.numpy(), rtol=RTOL, atol=1e-4)


def _copy_decoder_layer(tl):
    p = _copy_encoder_layer(tl)
    p["cross_attn"] = _copy_mha(tl.multihead_attn)
    p["norm3"] = {"g": t2j(tl.norm3.weight), "b": t2j(tl.norm3.bias)}
    return p


def test_decoder_layer_matches_torch_with_length1_memory():
    """The reference repeats z_proj(z) L times as decoder memory
    (models.py:112); attention over identical keys equals attention over one
    key, so ark_tpu uses memory length 1. Verify both against torch."""
    d, nh, b, L = 24, 4, 3, 9
    tl = torch.nn.TransformerDecoderLayer(d, nh, batch_first=True).eval()
    p = _copy_decoder_layer(tl)
    x = torch.randn(b, L, d)
    mem1 = torch.randn(b, 1, d)
    memL = mem1.repeat(1, L, 1)
    causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)
    with torch.no_grad():
        ty = tl(x, memL, tgt_mask=causal)
    jy = jlayers.decoder_layer(p, t2j(x), t2j(mem1), nh,
                               tgt_mask=jlayers.causal_mask(L))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=RTOL, atol=1e-4)


def test_linear_and_layernorm_match_torch():
    tl = torch.nn.Linear(10, 20).eval()
    x = torch.randn(5, 10)
    p = {"w": t2j(tl.weight).T, "b": t2j(tl.bias)}
    np.testing.assert_allclose(np.asarray(jlayers.linear(p, t2j(x))),
                               tl(x).detach().numpy(), rtol=RTOL, atol=ATOL)
    tn = torch.nn.LayerNorm(10).eval()
    pn = {"g": t2j(tn.weight), "b": t2j(tn.bias)}
    np.testing.assert_allclose(np.asarray(jlayers.layer_norm(pn, t2j(x))),
                               tn(x).detach().numpy(), rtol=RTOL, atol=ATOL)


def test_incremental_step_equals_full_apply():
    """KV-cache decode must reproduce teacher-forced logits exactly
    (the sampler correctness precondition)."""
    from ark_tpu.models import build_model

    base = dict(d_model=16, d_latent=6, n_heads=2, n_layers=2, seq_len=11,
                vocab_size=40, n_entities=20, n_relations=4, dec_dropout=0.0)
    seq = jax.random.randint(jax.random.key(5), (3, 11), 0, 40)
    for mt in ["ARK", "t-ARK"]:
        m = build_model(dict(base, model_type=mt))
        params = m.init(jax.random.key(0))
        full = m.apply(params, seq)
        state = m.decode_state(params, 3)
        for t in range(seq.shape[1] - 1):
            logits, state = m.decode_step(params, state, seq[:, t], t)
            np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, t]),
                                       rtol=2e-4, atol=2e-4, err_msg=f"{mt} t={t}")
    for mt in ["SAIL", "t-SAIL"]:
        m = build_model(dict(base, model_type=mt))
        params = m.init(jax.random.key(0))
        triples = jax.random.randint(jax.random.key(6), (3, 3, 3), 0, 4)
        z, mu, logv = m.encode(params, triples, jax.random.key(7))
        if m.decoder_arch == "gru":
            from ark_tpu.models.decoders import gru_cond_apply
            full = gru_cond_apply(params["dec"], z, seq, deterministic=True)
        else:
            from ark_tpu.models.decoders import txf_cond_apply
            full = txf_cond_apply(params["dec"], z, seq, 2, deterministic=True)
        state = m.decode_state(params, z)
        for t in range(seq.shape[1] - 1):
            logits, state = m.decode_step(params, state, seq[:, t], t)
            np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, t]),
                                       rtol=2e-4, atol=2e-4, err_msg=f"{mt} t={t}")
