"""Legacy torch-checkpoint interop (reference conditioned.py:16-25,
interpolation.py:140-141): a ``torch.save``d payload in the reference schema
— ``module.``-prefixed state_dict included — loads through the ordinary
``load_checkpoint`` and reproduces the torch model's forward logits."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ark_tpu.models import build_model
from ark_tpu.utils.checkpoint import load_checkpoint, to_device_tree

V, D, L, NL, NH, DLAT = 23, 16, 11, 2, 2, 6
BASE = dict(d_model=D, d_latent=DLAT, n_heads=NH, n_layers=NL, seq_len=L,
            vocab_size=V, n_entities=10, n_relations=4, pad_eid=9, pad_rid=3,
            dec_dropout=0.0, tie_weights=True)


class TorchGRULM(torch.nn.Module):
    """Twin of reference DecoderOnlyGRU (models.py:323-345)."""

    def __init__(self):
        super().__init__()
        self.tok_emb = torch.nn.Embedding(V, D)
        self.pos_emb = torch.nn.Embedding(L, D)
        self.gru = torch.nn.GRU(D, D, num_layers=NL, batch_first=True)
        self.out = torch.nn.Linear(D, V)
        self.out.weight = self.tok_emb.weight

    def forward(self, s):
        x = self.tok_emb(s) + self.pos_emb(torch.arange(s.shape[1]))[None]
        y, _ = self.gru(x)
        return self.out(y)


class TorchTxfLM(torch.nn.Module):
    """Twin of reference DecoderOnlyTransformer (models.py:349-366)."""

    def __init__(self):
        super().__init__()
        self.tok_emb = torch.nn.Embedding(V, D)
        self.pos_emb = torch.nn.Embedding(L, D)
        layer = torch.nn.TransformerEncoderLayer(D, NH, batch_first=True)
        self.txf = torch.nn.TransformerEncoder(layer, NL)
        self.out = torch.nn.Linear(D, V)
        self.out.weight = self.tok_emb.weight

    def forward(self, s):
        Ls = s.shape[1]
        x = self.tok_emb(s) + self.pos_emb(torch.arange(Ls))[None]
        mask = torch.triu(torch.ones(Ls, Ls, dtype=torch.bool), 1)
        return self.out(self.txf(x, mask=mask))


class TorchMLPEnc(torch.nn.Module):
    """Twin of reference AutoRegEncoderMLP (models.py:13-64)."""

    def __init__(self):
        super().__init__()
        self.e_emb = torch.nn.Embedding(BASE["n_entities"], D)
        self.r_emb = torch.nn.Embedding(BASE["n_relations"], D)
        hidden = max(D * 3, D * 2)
        mlp, d_in = [], D * 3
        for _ in range(NL):
            mlp += [torch.nn.Linear(d_in, hidden), torch.nn.GELU()]
            d_in = hidden
        self.mlp = torch.nn.Sequential(*mlp)
        self.mu = torch.nn.Linear(hidden, DLAT)
        self.logv = torch.nn.Linear(hidden, DLAT)

    def stats(self, triples):
        h = self.e_emb(triples[:, :, 0])
        r = self.r_emb(triples[:, :, 1])
        t = self.e_emb(triples[:, :, 2])
        x = torch.cat([h, r, t], -1)
        mask = (triples[:, :, 1] != BASE["pad_rid"]).float()
        g = (x * mask.unsqueeze(-1)).sum(1) / mask.sum(1, keepdim=True).clamp(min=1)
        g = self.mlp(g)
        return self.mu(g), self.logv(g).clamp(-10, 10)


class TorchGRUCond(torch.nn.Module):
    """Twin of reference AutoRegDecoderGRU (models.py:116-142)."""

    def __init__(self):
        super().__init__()
        self.tok_emb = torch.nn.Embedding(V, D)
        self.z_proj = torch.nn.Linear(DLAT, D)
        self.gru = torch.nn.GRU(D, D, num_layers=NL, batch_first=True)
        self.out = torch.nn.Linear(D, V)
        self.out.weight = self.tok_emb.weight

    def forward(self, z, tgt):
        x = self.tok_emb(tgt)
        h0 = torch.tanh(self.z_proj(z)).unsqueeze(0).repeat(NL, 1, 1)
        y, _ = self.gru(x, h0)
        return self.out(y)


class TorchSAIL(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.enc = TorchMLPEnc()
        self.dec = TorchGRUCond()


class _ARKWrap(torch.nn.Module):
    """Reference ARK wraps its LM as ``self.dec`` (models.py:374-385), so
    state_dict keys carry a ``dec.`` prefix."""

    def __init__(self, dec):
        super().__init__()
        self.dec = dec

    def forward(self, s):
        return self.dec(s)


class TorchTxfCond(torch.nn.Module):
    """Twin of reference AutoRegDecoder (models.py:98-114)."""

    def __init__(self):
        super().__init__()
        self.tok_emb = torch.nn.Embedding(V, D)
        self.pos_emb = torch.nn.Embedding(L, D)
        self.z_proj = torch.nn.Linear(DLAT, D)
        layer = torch.nn.TransformerDecoderLayer(D, NH, batch_first=True)
        self.txf = torch.nn.TransformerDecoder(layer, NL)
        self.out = torch.nn.Linear(D, V)

    def forward(self, z, tgt):
        B, Ls = tgt.shape
        x = self.tok_emb(tgt) + self.pos_emb(torch.arange(Ls))[None]
        mem = self.z_proj(z).unsqueeze(1).repeat(1, Ls, 1)
        mask = torch.triu(torch.ones(Ls, Ls, dtype=torch.bool), 1)
        return self.out(self.txf(x, mem, tgt_mask=mask))


class TorchTxfEnc(torch.nn.Module):
    """Twin of reference AutoRegEncoder (models.py:66-95)."""

    def __init__(self):
        super().__init__()
        self.e_emb = torch.nn.Embedding(BASE["n_entities"], D)
        self.r_emb = torch.nn.Embedding(BASE["n_relations"], D)
        layer = torch.nn.TransformerEncoderLayer(D * 3, NH, batch_first=True)
        self.txf = torch.nn.TransformerEncoder(layer, NL)
        self.mu = torch.nn.Linear(D * 3, DLAT)
        self.logv = torch.nn.Linear(D * 3, DLAT)

    def stats(self, triples):
        h = self.e_emb(triples[:, :, 0])
        r = self.r_emb(triples[:, :, 1])
        t = self.e_emb(triples[:, :, 2])
        x = torch.cat([h, r, t], -1)
        mask = triples[:, :, 1] != BASE["pad_rid"]
        x = self.txf(x, src_key_padding_mask=~mask)
        denom = mask.sum(1, keepdim=True).clamp(min=1).unsqueeze(-1)
        x = (x * mask.unsqueeze(-1).float()).sum(1) / denom.squeeze(-1)
        return self.mu(x), self.logv(x)


class TorchTSAIL(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.enc = TorchTxfEnc()
        self.dec = TorchTxfCond()


def _save_reference_payload(path, tm, config, prefix=True):
    sd = tm.state_dict()
    if prefix:  # historical nn.DataParallel checkpoints (SURVEY P-1)
        sd = {f"module.{k}": v for k, v in sd.items()}
    torch.save({
        "epoch": 7,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "scheduler_state_dict": None,
        "val_loss": 1.5,
        "config": config,
        "vocabs": {"e2i": {"a": 0}, "i2e": {0: "a"},
                   "r2i": {"r": 0}, "i2r": {0: "r"}},
        "dataset_meta": {"dataset": "syn-paths", "n_entities": 10,
                         "n_relations": 4},
    }, str(path), _use_new_zipfile_serialization=False)


def _rand_seq(key):
    return jax.random.randint(key, (3, L), 0, V)


@pytest.mark.parametrize("pad_mult", [1, 8])
def test_ark_gru_torch_checkpoint_roundtrip(tmp_path, pad_mult):
    torch.manual_seed(0)
    tm = _ARKWrap(TorchGRULM()).eval()
    cfg = dict(BASE, model_type="ARK", vocab_pad_multiple=pad_mult)
    path = tmp_path / "syn-paths_ARK_best_model.pt"
    _save_reference_payload(path, tm, cfg)

    ckpt = load_checkpoint(str(path))
    assert ckpt["format"] == "torch.interop"
    assert ckpt["epoch"] == 7 and ckpt["vocabs"]["e2i"] == {"a": 0}
    model = build_model(ckpt["config"])
    params = to_device_tree(ckpt["model_state_dict"])
    seq = _rand_seq(jax.random.key(1))
    got = model.apply(params, seq, deterministic=True)
    with torch.no_grad():
        want = tm(torch.tensor(np.asarray(seq), dtype=torch.long)).numpy()
    assert got.shape[-1] == V  # padding sliced off
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_t_ark_torch_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(1)
    tm = _ARKWrap(TorchTxfLM()).eval()
    cfg = dict(BASE, model_type="t-ARK")
    path = tmp_path / "syn-paths_t-ARK_best_model.pt"
    _save_reference_payload(path, tm, cfg, prefix=False)

    ckpt = load_checkpoint(str(path))
    model = build_model(ckpt["config"])
    params = to_device_tree(ckpt["model_state_dict"])
    seq = _rand_seq(jax.random.key(2))
    got = model.apply(params, seq, deterministic=True)
    with torch.no_grad():
        want = tm(torch.tensor(np.asarray(seq), dtype=torch.long)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_sail_torch_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(2)
    tm = TorchSAIL().eval()
    cfg = dict(BASE, model_type="SAIL")
    path = tmp_path / "syn-paths_SAIL_best_model.pt"
    _save_reference_payload(path, tm, cfg)

    ckpt = load_checkpoint(str(path))
    model = build_model(ckpt["config"])
    params = to_device_tree(ckpt["model_state_dict"])

    triples = jax.random.randint(jax.random.key(3), (3, 4, 3), 0, 4)
    _, mu, logv = model.encode(params, triples, jax.random.key(4))
    with torch.no_grad():
        tmu, tlogv = tm.enc.stats(torch.tensor(np.asarray(triples),
                                               dtype=torch.long))
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(logv), tlogv.numpy(), rtol=1e-4,
                               atol=1e-4)

    from ark_tpu.models.decoders import gru_cond_apply
    seq = _rand_seq(jax.random.key(5))
    z = jnp.asarray(tmu.numpy())
    got = gru_cond_apply(params["dec"], z, seq, deterministic=True)
    with torch.no_grad():
        want = tm.dec(tmu, torch.tensor(np.asarray(seq),
                                        dtype=torch.long)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_t_sail_torch_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(3)
    tm = TorchTSAIL().eval()
    cfg = dict(BASE, model_type="t-SAIL")
    path = tmp_path / "syn-paths_t-SAIL_best_model.pt"
    _save_reference_payload(path, tm, cfg)

    ckpt = load_checkpoint(str(path))
    model = build_model(ckpt["config"])
    params = to_device_tree(ckpt["model_state_dict"])

    triples = jax.random.randint(jax.random.key(6), (3, 4, 3), 0, 4)
    _, mu, _ = model.encode(params, triples, jax.random.key(7))
    with torch.no_grad():
        tmu, _ = tm.enc.stats(torch.tensor(np.asarray(triples),
                                           dtype=torch.long))
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy(), rtol=1e-4,
                               atol=2e-4)

    from ark_tpu.models.decoders import txf_cond_apply
    seq = _rand_seq(jax.random.key(8))
    z = jnp.asarray(tmu.numpy())
    got = txf_cond_apply(params["dec"], z, seq, NH, deterministic=True)
    with torch.no_grad():
        want = tm.dec(tmu, torch.tensor(np.asarray(seq),
                                        dtype=torch.long)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-4)


def test_new_zipfile_format_also_loads(tmp_path):
    """torch's default zip container (newer checkpoints) is detected too."""
    torch.manual_seed(4)
    tm = _ARKWrap(TorchGRULM()).eval()
    cfg = dict(BASE, model_type="ARK")
    path = tmp_path / "zipfmt.pt"
    sd = tm.state_dict()
    torch.save({"epoch": 1, "model_state_dict": sd, "val_loss": 9.9,
                "config": cfg, "vocabs": {}, "dataset_meta": {}}, str(path))
    ckpt = load_checkpoint(str(path))
    assert ckpt["format"] == "torch.interop"
    model = build_model(ckpt["config"])
    params = to_device_tree(ckpt["model_state_dict"])
    seq = _rand_seq(jax.random.key(9))
    got = model.apply(params, seq, deterministic=True)
    with torch.no_grad():
        want = tm(torch.tensor(np.asarray(seq), dtype=torch.long)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_ark_tpu_checkpoints_not_misrouted(tmp_path):
    """Native pickles keep loading through the restricted unpickler."""
    from ark_tpu.utils.checkpoint import save_checkpoint
    from ark_tpu.utils.torch_interop import is_torch_checkpoint

    cfg = dict(BASE, model_type="ARK")
    model = build_model(cfg)
    params = model.init(jax.random.key(0))
    path = tmp_path / "native.pt"
    save_checkpoint(str(path), epoch=1, params=params, opt_state={},
                    scheduler_state=None, val_loss=1.0, config=cfg,
                    vocabs={}, dataset_meta={})
    assert not is_torch_checkpoint(str(path))
    ckpt = load_checkpoint(str(path))
    assert ckpt["format"] == "ark_tpu.pickle.v1"


def test_native_pickle_with_torch_substring_not_misrouted(tmp_path):
    """A native pickle whose bytes contain 'torch' (e.g. a config string)
    must not be sniffed as a torch checkpoint (ADVICE r2: substring match
    false-positived; the sniff now checks torch's actual magic number)."""
    from ark_tpu.utils.checkpoint import save_checkpoint
    from ark_tpu.utils.torch_interop import is_torch_checkpoint

    cfg = dict(BASE, model_type="ARK",
               experiment_name="torch comparison baseline")
    model = build_model(cfg)
    params = model.init(jax.random.key(0))
    path = tmp_path / "native_torchy.pt"
    save_checkpoint(str(path), epoch=1, params=params, opt_state={},
                    scheduler_state=None, val_loss=1.0, config=cfg,
                    vocabs={}, dataset_meta={})
    raw = open(path, "rb").read()
    assert b"torch" in raw  # the substring IS present in the payload
    assert not is_torch_checkpoint(str(path))
    assert load_checkpoint(str(path))["format"] == "ark_tpu.pickle.v1"


def test_malicious_torch_pickle_refused(tmp_path):
    """A torch-magic-prefixed pickle carrying a code-executing payload must
    raise, not execute (ADVICE r2 medium: weights_only=True enforced)."""
    import pickle

    import pytest

    from ark_tpu.utils.torch_interop import (_LEGACY_MAGIC,
                                             load_torch_checkpoint)

    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, (f"touch {marker}",))

    path = tmp_path / "evil.pt"
    # torch's legacy stream pickles the magic number first, then protocol,
    # sys_info, then the object — a crafted object must not execute
    proto = pickle.dumps(1001, protocol=2)
    sysinfo = pickle.dumps({"little_endian": True}, protocol=2)
    payload = pickle.dumps({"config": {}, "boom": Evil()}, protocol=2)
    with open(path, "wb") as f:
        f.write(_LEGACY_MAGIC + proto + sysinfo + payload)
    with pytest.raises(Exception):
        load_torch_checkpoint(str(path))
    assert not marker.exists(), "malicious pickle payload was executed"


def test_generate_cli_serves_torch_checkpoint(tmp_path):
    """The serving CLI works directly on a legacy torch checkpoint."""
    from ark_tpu.experiments.generate import generate_graphs

    torch.manual_seed(7)
    tm = _ARKWrap(TorchGRULM()).eval()
    # vocab layout must be consistent for decoding: entities 10 (incl pad),
    # relations 4 (incl pad), max_edges from seq_len
    cfg = dict(BASE, model_type="ARK", use_padding=True,
               min_edges=1, max_edges=(L - 2) // 3,
               ENT_BASE=3, REL_BASE=3 + BASE["n_entities"],
               special_tokens={"PAD": 0, "BOS": 1, "EOS": 2})
    path = tmp_path / "legacy.pt"
    _save_reference_payload(path, tm, cfg)
    # vocabs with enough labels to decode any sampled id
    import torch as _t
    payload = _t.load(str(path), weights_only=False)
    payload["vocabs"] = {
        "e2i": {f"e{i}": i for i in range(BASE["n_entities"])},
        "i2e": {i: f"e{i}" for i in range(BASE["n_entities"])},
        "r2i": {f"r{i}": i for i in range(BASE["n_relations"])},
        "i2r": {i: f"r{i}" for i in range(BASE["n_relations"])},
    }
    _t.save(payload, str(path), _use_new_zipfile_serialization=False)

    graphs = generate_graphs(str(path), num_samples=4, batch=4, seed=1)
    assert len(graphs) == 4


# ---------------------------------------------------------------------------
# Export (round-3 VERDICT item 5): ark_tpu-trained params -> reference torch
# format. Gold test: torch twin modules load the exported state_dict with
# strict=True and reproduce the ark model's forward logits.
# ---------------------------------------------------------------------------

def _export_roundtrip(tmp_path, mt, twin_factory, fwd, pad_mult=8):
    from ark_tpu.utils.torch_interop import save_torch_checkpoint

    cfg = dict(BASE, model_type=mt, vocab_pad_multiple=pad_mult)
    model = build_model(cfg)
    params = model.init(jax.random.key(3))
    path = tmp_path / f"export_{mt}.pt"
    save_torch_checkpoint(str(path), params=params, config=cfg, epoch=5,
                          val_loss=2.5,
                          vocabs={"e2i": {"a": 0}, "i2e": {0: "a"},
                                  "r2i": {"r": 0}, "i2r": {0: "r"}},
                          dataset_meta={"dataset": "syn-paths",
                                        "n_entities": 10, "n_relations": 4})

    # 1) reference-tooling load: torch.load + strict load_state_dict into
    #    the reference twin module (conditioned.py:16-25, 58-70 semantics)
    payload = torch.load(str(path), map_location="cpu", weights_only=True)
    assert payload["epoch"] == 5 and payload["val_loss"] == 2.5
    assert payload["vocabs"]["e2i"] == {"a": 0}
    tm = twin_factory()
    tm.load_state_dict(payload["model_state_dict"], strict=True)
    tm.eval()

    # 2) forward parity torch twin vs ark model
    seq = _rand_seq(jax.random.key(4))
    got, want = fwd(model, params, tm, seq)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # 3) this repo's own reader reads it back (full round trip). Vocab
    # PADDING rows differ by construction (native init randomizes them,
    # the reader zero-fills; they are never indexed) — so compare the
    # models' behavior, then the trees with padding rows masked out.
    ckpt = load_checkpoint(str(path))
    assert ckpt["format"] == "torch.interop"
    back = to_device_tree(ckpt["model_state_dict"])
    got2, _ = fwd(model, back, tm, seq)
    got1, _ = fwd(model, params, tm, seq)
    np.testing.assert_allclose(got2, got1, rtol=1e-5, atol=1e-5)
    flat_a = jax.tree.flatten_with_path(params)[0]
    flat_b = dict(jax.tree.flatten_with_path(back)[0])
    for path_k, a in flat_a:
        b = flat_b[path_k]
        a, b = np.asarray(a), np.asarray(b)
        keys = "/".join(str(k) for k in path_k)
        if "tok_emb" in keys or ("out" in keys and a.ndim == 1):
            a, b = a[:V], b[:V]  # drop vocab padding rows
        elif "out" in keys and "w" in keys:
            a, b = a[:, :V], b[:, :V]
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6,
                                   err_msg=keys)


def _fwd_lm(model, params, tm, seq):
    got = np.asarray(model.apply(params, seq, deterministic=True))
    with torch.no_grad():
        want = tm(torch.tensor(np.asarray(seq), dtype=torch.long)).numpy()
    return got, want


def _fwd_vae(model, params, tm, seq):
    z = jax.random.normal(jax.random.key(5), (3, DLAT))
    from ark_tpu.models.decoders import gru_cond_apply, txf_cond_apply
    if model.decoder_arch == "gru":
        got = gru_cond_apply(params["dec"], z, seq, deterministic=True,
                             vocab_out=V)
    else:
        got = txf_cond_apply(params["dec"], z, seq, NH, deterministic=True,
                             vocab_out=V)
    with torch.no_grad():
        want = tm.dec(torch.tensor(np.asarray(z)),
                      torch.tensor(np.asarray(seq), dtype=torch.long)).numpy()
    # encoder parity too
    triples = np.stack([
        np.random.default_rng(0).integers(0, 9, (3, 3)),
        np.random.default_rng(1).integers(0, 3, (3, 3)),
        np.random.default_rng(2).integers(0, 9, (3, 3))], axis=-1)
    tt = jnp.asarray(triples, jnp.int32)
    _, mu, logv = model.encode(params, tt, jax.random.key(6))
    with torch.no_grad():
        tmu, tlogv = tm.enc.stats(torch.tensor(triples, dtype=torch.long))
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logv), tlogv.numpy(),
                               rtol=2e-4, atol=2e-4)
    return np.asarray(got), want


def test_export_ark_gru(tmp_path):
    _export_roundtrip(tmp_path, "ARK", lambda: _ARKWrap(TorchGRULM()),
                      _fwd_lm)


def test_export_t_ark(tmp_path):
    _export_roundtrip(tmp_path, "t-ARK", lambda: _ARKWrap(TorchTxfLM()),
                      _fwd_lm)


def test_export_sail(tmp_path):
    _export_roundtrip(tmp_path, "SAIL", TorchSAIL, _fwd_vae)


def test_export_t_sail(tmp_path):
    _export_roundtrip(tmp_path, "t-SAIL", TorchTSAIL, _fwd_vae)


def test_export_cli(tmp_path):
    """export_torch CLI: native checkpoint in, reference format out."""
    from ark_tpu.experiments.export_torch import main as export_main
    from ark_tpu.utils.checkpoint import save_checkpoint
    from ark_tpu.utils.torch_interop import is_torch_checkpoint

    cfg = dict(BASE, model_type="ARK")
    model = build_model(cfg)
    params = model.init(jax.random.key(0))
    src = tmp_path / "native.pt"
    dst = tmp_path / "exported.pt"
    save_checkpoint(str(src), epoch=3, params=params, opt_state={},
                    scheduler_state=None, val_loss=1.0, config=cfg,
                    vocabs={}, dataset_meta={})
    export_main([str(src), str(dst)])
    assert is_torch_checkpoint(str(dst))
    ckpt = load_checkpoint(str(dst))
    assert ckpt["format"] == "torch.interop"
    got = build_model(ckpt["config"]).apply(
        to_device_tree(ckpt["model_state_dict"]),
        _rand_seq(jax.random.key(1)), deterministic=True)
    want = model.apply(params, _rand_seq(jax.random.key(1)),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
