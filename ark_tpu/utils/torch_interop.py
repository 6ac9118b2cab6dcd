"""Legacy torch-checkpoint interop: load reference ``.pt`` payloads.

The reference's conditioned.py:16-25 and interpolation.py:140-141 load
``torch.save``d checkpoints whose ``model_state_dict`` keys may carry a
historical ``module.`` prefix (single-process ``nn.DataParallel`` training,
SURVEY §2 row P-1). This module maps such a torch state_dict onto the
ark_tpu parameter pytrees so conditioned / interpolation / evaluate work on
reference checkpoints unchanged:

    ckpt = load_torch_checkpoint("wd-movies_SAIL_best_model.pt")
    model = build_model(ckpt["config"]); params = ckpt["model_state_dict"]

Key-name sources (behavioral contract, studied not copied):
  - ARK wraps ``self.dec = DecoderOnlyGRU|DecoderOnlyTransformer``
    (reference models.py:374-385): keys ``dec.tok_emb.weight``,
    ``dec.gru.weight_ih_l{k}`` / ``dec.txf.layers.{i}.*``, ``dec.out.*``.
  - SAIL wraps ``self.enc = AutoRegEncoderMLP|AutoRegEncoder`` and
    ``self.dec = AutoRegDecoderGRU|AutoRegDecoder``
    (models.py:150-196): ``enc.e_emb/r_emb/mlp.{j}/txf.layers.{i}/mu/logv``
    and ``dec.tok_emb/z_proj/gru/txf.layers.{i}/pos_emb/out``.
  - torch Linear stores ``weight`` as [out, in]; ark_tpu uses [in, out] —
    every linear/GRU/attention weight transposes on the way in (the same
    convention as tests/test_torch_parity.py).

Optimizer / scheduler state is torch-specific and dropped (loading a torch
checkpoint supports generation and evaluation, not training resume — the
reference itself never resumes, SURVEY §5).
"""

from __future__ import annotations

import pickle

import numpy as np

__all__ = ["is_torch_checkpoint", "load_torch_checkpoint",
           "torch_state_dict_to_params", "params_to_torch_state_dict",
           "save_torch_checkpoint"]

# torch zipfile serialization starts with a local-file header; the legacy
# (_use_new_zipfile_serialization=False, reference train.py:589) stream is a
# pickle whose FIRST pickled object is torch's magic number
# 0x1950a86a20f9469cfc6c (LONG1 opcode, 10 little-endian bytes, STOP).
# Sniffing that exact header (not a substring) avoids misrouting native
# ark_tpu pickles whose bytes merely contain 'torch' somewhere. Each pickle
# protocol frames the magic differently (protocols >= 4 insert a FRAME
# opcode), so all plausible prefixes are precomputed.
import pickle as _pickle

_ZIP_MAGIC = b"PK\x03\x04"
_LEGACY_MAGICS = tuple(
    _pickle.dumps(0x1950A86A20F9469CFC6C, protocol=p) for p in range(2, 6))
_LEGACY_MAGIC = _LEGACY_MAGICS[0]  # protocol 2: torch's default


def is_torch_checkpoint(path: str) -> bool:
    """Cheap sniff: torch zip container, or the legacy-serialization magic
    (any pickle protocol)."""
    with open(path, "rb") as f:
        head = f.read(max(len(m) for m in _LEGACY_MAGICS))
    return head.startswith(_ZIP_MAGIC) or any(
        head.startswith(m) for m in _LEGACY_MAGICS)


def _t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _strip_module(sd: dict) -> dict:
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _linear(sd, prefix):
    return {"w": _t2n(sd[f"{prefix}.weight"]).T,
            "b": _t2n(sd[f"{prefix}.bias"])}


def _layer_norm(sd, prefix):
    return {"g": _t2n(sd[f"{prefix}.weight"]), "b": _t2n(sd[f"{prefix}.bias"])}


def _mha(sd, prefix):
    return {
        "in_proj_w": _t2n(sd[f"{prefix}.in_proj_weight"]).T,
        "in_proj_b": _t2n(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _encoder_layer(sd, prefix):
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
        "norm1": _layer_norm(sd, f"{prefix}.norm1"),
        "norm2": _layer_norm(sd, f"{prefix}.norm2"),
    }


def _decoder_layer(sd, prefix):
    p = _encoder_layer(sd, prefix)
    p["cross_attn"] = _mha(sd, f"{prefix}.multihead_attn")
    p["norm3"] = _layer_norm(sd, f"{prefix}.norm3")
    return p


def _txf_stack(sd, prefix):
    idx = sorted({int(k[len(prefix) + 1:].split(".")[0])
                  for k in sd if k.startswith(prefix + ".")})
    kind = (_decoder_layer
            if any(k.startswith(f"{prefix}.{idx[0]}.multihead_attn")
                   for k in sd) else _encoder_layer)
    return [kind(sd, f"{prefix}.{i}") for i in idx]


def _gru(sd, prefix):
    layers = []
    for k in range(64):
        if f"{prefix}.weight_ih_l{k}" not in sd:
            break
        layers.append({
            "w_ih": _t2n(sd[f"{prefix}.weight_ih_l{k}"]).T,
            "w_hh": _t2n(sd[f"{prefix}.weight_hh_l{k}"]).T,
            "b_ih": _t2n(sd[f"{prefix}.bias_ih_l{k}"]),
            "b_hh": _t2n(sd[f"{prefix}.bias_hh_l{k}"]),
        })
    return {"layers": layers}


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] >= rows:
        return x
    return np.concatenate(
        [x, np.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)], axis=0)


def _head(sd, prefix, tok_emb_key, config):
    """Tied heads keep only the bias (ark_tpu computes logits = y @ E.T + b);
    the reference ties whenever shapes match (quirk Q-9) — out.weight and
    tok_emb.weight are both [V, D], so ``tie_weights`` alone decides."""
    tied = bool(config.get("tie_weights", True))
    b = _t2n(sd[f"{prefix}.bias"])
    mult = int(config.get("vocab_pad_multiple", 1))
    v_pad = -(-b.shape[0] // mult) * mult
    if tied and tok_emb_key is not None:
        return {"b": _pad_rows(b, v_pad)}
    w = _t2n(sd[f"{prefix}.weight"]).T  # [D, V]
    w = np.concatenate(
        [w, np.zeros((w.shape[0], v_pad - w.shape[1]), w.dtype)], axis=1) \
        if v_pad > w.shape[1] else w
    return {"w": w, "b": _pad_rows(b, v_pad)}


def _emb(sd, key, config, pad_vocab=False):
    e = _t2n(sd[key])
    if pad_vocab:
        mult = int(config.get("vocab_pad_multiple", 1))
        e = _pad_rows(e, -(-e.shape[0] // mult) * mult)
    return e


def _mlp_encoder(sd, config):
    j_idx = sorted({int(k.split(".")[2]) for k in sd
                    if k.startswith("enc.mlp.") and k.endswith(".weight")})
    return {
        "e_emb": _emb(sd, "enc.e_emb.weight", config),
        "r_emb": _emb(sd, "enc.r_emb.weight", config),
        "mlp": [_linear(sd, f"enc.mlp.{j}") for j in j_idx],
        "mu": _linear(sd, "enc.mu"),
        "logv": _linear(sd, "enc.logv"),
    }


def _txf_encoder(sd, config):
    return {
        "e_emb": _emb(sd, "enc.e_emb.weight", config),
        "r_emb": _emb(sd, "enc.r_emb.weight", config),
        "txf": _txf_stack(sd, "enc.txf.layers"),
        "mu": _linear(sd, "enc.mu"),
        "logv": _linear(sd, "enc.logv"),
    }


def torch_state_dict_to_params(state_dict: dict, config: dict) -> dict:
    """Map a (possibly ``module.``-prefixed) reference state_dict onto the
    pytree layout of ``build_model(config).init`` — numpy leaves, f32. When
    ``config['vocab_pad_multiple']`` > 1 the vocab-indexed tensors are
    zero-padded to the aligned size (padded rows are never indexed and
    padded logits are sliced off by ``vocab_out``)."""
    sd = _strip_module(state_dict)
    mt = config["model_type"]
    if mt == "ARK":
        return {
            "tok_emb": _emb(sd, "dec.tok_emb.weight", config, pad_vocab=True),
            "pos_emb": _emb(sd, "dec.pos_emb.weight", config),
            "gru": _gru(sd, "dec.gru"),
            "out": _head(sd, "dec.out", "dec.tok_emb.weight", config),
        }
    if mt == "t-ARK":
        return {
            "tok_emb": _emb(sd, "dec.tok_emb.weight", config, pad_vocab=True),
            "pos_emb": _emb(sd, "dec.pos_emb.weight", config),
            "txf": _txf_stack(sd, "dec.txf.layers"),
            "out": _head(sd, "dec.out", "dec.tok_emb.weight", config),
        }
    if mt == "SAIL":
        return {
            "enc": _mlp_encoder(sd, config),
            "dec": {
                "tok_emb": _emb(sd, "dec.tok_emb.weight", config,
                                pad_vocab=True),
                "z_proj": _linear(sd, "dec.z_proj"),
                "gru": _gru(sd, "dec.gru"),
                "out": _head(sd, "dec.out", "dec.tok_emb.weight", config),
            },
        }
    if mt == "t-SAIL":
        return {
            "enc": _txf_encoder(sd, config),
            "dec": {
                "tok_emb": _emb(sd, "dec.tok_emb.weight", config,
                                pad_vocab=True),
                "pos_emb": _emb(sd, "dec.pos_emb.weight", config),
                "z_proj": _linear(sd, "dec.z_proj"),
                "txf": _txf_stack(sd, "dec.txf.layers"),
                # AutoRegDecoder never ties (reference models.py:98-114)
                "out": _head(sd, "dec.out", None,
                             dict(config, tie_weights=False)),
            },
        }
    raise ValueError(f"unknown model_type for torch interop: {mt!r}")


# ---------------------------------------------------------------------------
# Export: ark_tpu params -> reference torch checkpoint (the inverse of the
# reader above). Closes the interop loop: checkpoints trained here load in
# the reference's own tooling (conditioned.py:16-25 torch.load + strict
# load_state_dict into the reference modules, train.py:576-589 payload).
# ---------------------------------------------------------------------------

def _inv_linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(p["w"].T)
    sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _inv_layer_norm(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["g"])
    sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _inv_mha(sd, prefix, p):
    sd[f"{prefix}.in_proj_weight"] = np.ascontiguousarray(p["in_proj_w"].T)
    sd[f"{prefix}.in_proj_bias"] = np.asarray(p["in_proj_b"])
    _inv_linear(sd, f"{prefix}.out_proj", p["out_proj"])


def _inv_txf_stack(sd, prefix, layers):
    for i, lp in enumerate(layers):
        base = f"{prefix}.{i}"
        _inv_mha(sd, f"{base}.self_attn", lp["self_attn"])
        if "cross_attn" in lp:
            _inv_mha(sd, f"{base}.multihead_attn", lp["cross_attn"])
        _inv_linear(sd, f"{base}.linear1", lp["linear1"])
        _inv_linear(sd, f"{base}.linear2", lp["linear2"])
        _inv_layer_norm(sd, f"{base}.norm1", lp["norm1"])
        _inv_layer_norm(sd, f"{base}.norm2", lp["norm2"])
        if "norm3" in lp:
            _inv_layer_norm(sd, f"{base}.norm3", lp["norm3"])


def _inv_gru(sd, prefix, p):
    for k, lp in enumerate(p["layers"]):
        sd[f"{prefix}.weight_ih_l{k}"] = np.ascontiguousarray(lp["w_ih"].T)
        sd[f"{prefix}.weight_hh_l{k}"] = np.ascontiguousarray(lp["w_hh"].T)
        sd[f"{prefix}.bias_ih_l{k}"] = np.asarray(lp["b_ih"])
        sd[f"{prefix}.bias_hh_l{k}"] = np.asarray(lp["b_hh"])


def _inv_head(sd, prefix, head, tok_emb_true, config):
    """Reference Linear head [V, D]; tied heads store the embedding as
    ``out.weight`` too (torch state_dict materializes tied tensors under
    both names)."""
    v = int(config["vocab_size"])
    sd[f"{prefix}.bias"] = np.asarray(head["b"])[:v]
    if "w" in head:
        sd[f"{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(head["w"])[:, :v].T)
    else:
        sd[f"{prefix}.weight"] = tok_emb_true


def _inv_mlp_encoder(sd, enc):
    sd["enc.e_emb.weight"] = np.asarray(enc["e_emb"])
    sd["enc.r_emb.weight"] = np.asarray(enc["r_emb"])
    # reference MLP is Sequential(Linear, GELU, ...): Linears at 0, 2, 4...
    # (models.py:13-64; mirrored by tests/test_torch_interop.TorchMLPEnc)
    for j, lp in enumerate(enc["mlp"]):
        _inv_linear(sd, f"enc.mlp.{2 * j}", lp)
    _inv_linear(sd, "enc.mu", enc["mu"])
    _inv_linear(sd, "enc.logv", enc["logv"])


def _inv_txf_encoder(sd, enc):
    sd["enc.e_emb.weight"] = np.asarray(enc["e_emb"])
    sd["enc.r_emb.weight"] = np.asarray(enc["r_emb"])
    _inv_txf_stack(sd, "enc.txf.layers", enc["txf"])
    _inv_linear(sd, "enc.mu", enc["mu"])
    _inv_linear(sd, "enc.logv", enc["logv"])


def params_to_torch_state_dict(params, config: dict) -> dict:
    """ark_tpu parameter pytree -> reference state_dict (numpy f32 values,
    reference key names/layouts; vocab padding rows sliced off). Exact
    inverse of torch_state_dict_to_params — round-trip asserted in
    tests/test_torch_interop.py."""
    params = jax_tree_to_numpy(params)
    mt = config["model_type"]
    v = int(config["vocab_size"])
    sd = {}
    if mt in ("ARK", "t-ARK"):
        tok = params["tok_emb"][:v]
        sd["dec.tok_emb.weight"] = tok
        sd["dec.pos_emb.weight"] = params["pos_emb"]
        if mt == "ARK":
            _inv_gru(sd, "dec.gru", params["gru"])
        else:
            _inv_txf_stack(sd, "dec.txf.layers", params["txf"])
        _inv_head(sd, "dec.out", params["out"], tok, config)
        return sd
    if mt == "SAIL":
        _inv_mlp_encoder(sd, params["enc"])
    elif mt == "t-SAIL":
        _inv_txf_encoder(sd, params["enc"])
    else:
        raise ValueError(f"unknown model_type for torch export: {mt!r}")
    dec = params["dec"]
    tok = dec["tok_emb"][:v]
    sd["dec.tok_emb.weight"] = tok
    if "pos_emb" in dec:
        sd["dec.pos_emb.weight"] = dec["pos_emb"]
    _inv_linear(sd, "dec.z_proj", dec["z_proj"])
    if "gru" in dec:
        _inv_gru(sd, "dec.gru", dec["gru"])
    else:
        _inv_txf_stack(sd, "dec.txf.layers", dec["txf"])
    _inv_head(sd, "dec.out", dec["out"], tok, config)
    return sd


def jax_tree_to_numpy(tree):
    """Device arrays -> contiguous float32/... numpy, leaving numpy alone."""
    def one(x):
        a = np.asarray(x)
        return np.ascontiguousarray(
            a.astype(np.float32) if a.dtype.kind == "f" else a)
    import jax
    return jax.tree.map(one, tree)


def save_torch_checkpoint(path: str, *, params, config: dict, epoch=0,
                          val_loss=None, vocabs=None, dataset_meta=None):
    """Write a reference-format torch checkpoint (payload schema
    train.py:576-585, legacy serialization train.py:589) loadable by the
    reference's conditioned.py / interpolation.py and by this repo's own
    torch reader. Optimizer/scheduler state is torch-specific and written
    as None (the reference never resumes; SURVEY §5)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_torch_state_dict(params, config).items()}
    payload = {
        "epoch": epoch,
        "model_state_dict": sd,
        "optimizer_state_dict": None,
        "scheduler_state_dict": None,
        "val_loss": val_loss,
        "config": dict(config),
        "vocabs": vocabs or {},
        "dataset_meta": dataset_meta or {},
    }
    torch.save(payload, path, _use_new_zipfile_serialization=False)


def load_torch_checkpoint(path: str) -> dict:
    """torch.load the payload (reference schema, train.py:576-585) and
    convert ``model_state_dict`` to an ark_tpu pytree. Torch-only optimizer/
    scheduler state is replaced by None (no training resume from torch)."""
    import torch

    # weights_only=True: the reference payload (train.py:576-585) is tensors
    # plus plain containers, which the restricted unpickler supports for both
    # the zip and legacy serializations — never execute arbitrary pickle code.
    try:
        payload = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError as e:
        raise ValueError(
            f"{path} looks like a torch checkpoint but is not loadable with "
            f"weights_only=True; refusing to unpickle arbitrary code: {e}"
        ) from e
    config = dict(payload["config"])
    out = {
        "epoch": payload.get("epoch"),
        "model_state_dict": torch_state_dict_to_params(
            payload["model_state_dict"], config),
        "optimizer_state_dict": None,
        "scheduler_state_dict": None,
        "val_loss": payload.get("val_loss"),
        "config": config,
        "vocabs": payload.get("vocabs"),
        "dataset_meta": payload.get("dataset_meta"),
        "format": "torch.interop",
    }
    return out
