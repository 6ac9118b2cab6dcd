"""Posterior compression bits per graph — the reference's headline metric.

Reference semantics (ARK: models.py:473-520; SAIL: models.py:202-260):
  - evaluate the first ``max(1, sample_frac * N)`` graphs of the split
  - AR bits  = sum over targets t=1.. (stopping at the first PAD) of
    -log2 p(seq_t | seq_<t) under teacher forcing
  - KL bits (SAIL only) = KL(q(z|triples) || N(0, I)) / ln 2, with the AR
    bits computed from ONE sampled z ~ q(z|x)
  - returns avg/min/max total bits + per-graph records

The reference recomputes the full prefix forward per token at batch size 1 —
O(L^2) decoder work per graph with a ``.item()`` sync per token (SURVEY
quirk Q-2). Mathematically this equals ONE teacher-forced forward pass
summing masked per-token NLL; that is what we compute, batched and jitted
(verified equivalent in tests/test_compression.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ark_tpu.ops.losses import LN2, token_nll


_BITS_CACHE: dict = {}


def _make_bits_fn(model, pad_id, mesh=None, shard_vocab=False):
    key = (id(model), pad_id, id(mesh), bool(shard_vocab))
    if key in _BITS_CACHE:
        return _BITS_CACHE[key]
    fn = _build_bits_fn(model, pad_id, mesh, shard_vocab)
    _BITS_CACHE[key] = fn
    return fn


def _build_bits_fn(model, pad_id, mesh=None, shard_vocab=False):
    nd = 1 if mesh is None else dict(mesh.shape).get("data", 1)
    nm = 1 if mesh is None else dict(mesh.shape).get("model", 1)
    vocab_sharded = bool(shard_vocab and nm > 1)

    def _v_pad():
        mult = int(model.config.get("vocab_pad_multiple", 1))
        return -(-int(model.config["vocab_size"]) // mult) * mult

    def _use_fused(seq):
        """The fused per-row NLL kernel (ops/pallas/logit_ce.py) never
        materializes the [B*L, V] logits the XLA path round-trips through
        HBM (~5 GB per 256-graph batch on wd-articles). Same numbers —
        both are exact f32 NLL (tests/test_pallas_ce.py). The flag follows
        the trainer's use_fused_ce semantics ('auto' = TPU only; True
        forces, e.g. interpret-mode tests)."""
        if model.features is None or model.head is None:
            return False
        flag = model.config.get("use_fused_ce", "auto")
        if flag == "auto":
            if jax.default_backend() in ("cpu",):
                return False
        elif not flag:
            return False
        from ark_tpu.ops.pallas.logit_ce import supported

        bsz, lm1 = seq.shape[0], seq.shape[1] - 1
        if bsz % nd != 0:
            return False
        v_pad = _v_pad()
        if vocab_sharded and v_pad % nm != 0:
            return False
        return supported((bsz // nd) * lm1, int(model.config["d_model"]),
                         v_pad // nm if vocab_sharded else v_pad)

    def _ar_bits_fused(params, y, seq):
        """Per-graph AR bits via the fused kernel. Under a mesh the kernel
        runs per shard via shard_map (Mosaic custom calls are not
        GSPMD-partitionable): batch rows split over 'data'; with a
        vocab-sharded head each device additionally streams only its
        V/n_model slice and the per-row (logsumexp, target-logit)
        statistics merge over 'model' (round-3 VERDICT item 6 — no silent
        all-gather of the ~120 MB wd-articles head during compression
        eval)."""
        from ark_tpu.ops.pallas.logit_ce import (fused_ce_lse_t_rows,
                                                 fused_ce_nll_rows)

        w, b = model.head(params)
        bsz, lm1 = seq.shape[0], seq.shape[1] - 1
        v_true = int(model.config["vocab_size"])
        tgt = seq[:, 1:].astype(jnp.int32)

        def rows_local(y, w, b, tgt):
            x = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
            t = tgt.reshape(-1)
            wf, bf = w.astype(jnp.float32), b.astype(jnp.float32)
            if vocab_sharded:
                ofs = (jax.lax.axis_index("model") * w.shape[0]
                       ).astype(jnp.int32)
                lse_s, t_s = fused_ce_lse_t_rows(x, wf, bf, t, pad_id,
                                                 v_true, ofs)
                from ark_tpu.ops.collectives import merge_lse

                nll = merge_lse(lse_s, "model") - jax.lax.psum(t_s, "model")
            else:
                nll = fused_ce_nll_rows(x, wf, bf, t, pad_id, v_true)
            return nll.reshape(tgt.shape)

        if mesh is not None and (nd > 1 or vocab_sharded):
            from jax.sharding import PartitionSpec as P

            wspec = P("model", None) if vocab_sharded else P()
            bspec = P("model") if vocab_sharded else P()
            nll = jax.shard_map(
                rows_local, mesh=mesh,
                in_specs=(P("data", None, None), wspec, bspec,
                          P("data", None)),
                out_specs=P("data", None), check_vma=False)(y, w, b, tgt)
        else:
            nll = rows_local(y, w, b, tgt)
        mask = (seq[:, 1:] != pad_id).astype(jnp.float32)
        return jnp.sum(nll * mask, axis=1) / LN2

    if model.kind == "lm":
        @jax.jit
        def bits(params, triples, seq, rng):
            del triples, rng
            if _use_fused(seq):
                y = model.features(params, seq[:, :-1], deterministic=True)
                ar_bits = _ar_bits_fused(params, y, seq)
                return ar_bits, jnp.zeros_like(ar_bits)
            logits = model.apply(params, seq[:, :-1], deterministic=True)
            nll = token_nll(logits, seq[:, 1:])
            mask = (seq[:, 1:] != pad_id).astype(jnp.float32)
            ar_bits = jnp.sum(nll * mask, axis=1) / LN2
            return ar_bits, jnp.zeros_like(ar_bits)
    else:
        @jax.jit
        def bits(params, triples, seq, rng):
            from ark_tpu.models.api import kl_per_graph

            if _use_fused(seq):
                y, mu, logv = model.features(params, triples, seq[:, :-1],
                                             rng=rng, deterministic=True)
                ar_bits = _ar_bits_fused(params, y, seq)
                return ar_bits, kl_per_graph(mu, logv) / LN2
            # model.apply splits rng into (k_enc, k_dec) and encodes with
            # k_enc — the same z the fused path's model.features draws for
            # the same seed (deterministic=True leaves k_dec unused)
            logits, mu, logv = model.apply(params, triples, seq[:, :-1],
                                           rng=rng, deterministic=True)
            nll = token_nll(logits, seq[:, 1:])
            mask = (seq[:, 1:] != pad_id).astype(jnp.float32)
            ar_bits = jnp.sum(nll * mask, axis=1) / LN2
            kl_bits = kl_per_graph(mu, logv) / LN2
            return ar_bits, kl_bits
    return bits


def posterior_bits(model, params, data, layout, *, sample_frac=0.1, rng=None,
                   batch_size=256, desc="posterior bits", mesh=None,
                   shard_vocab=False):
    """Returns the reference stats dict (models.py:511-520): avg_total_bits /
    avg_ar_bits / avg_kl_bits / min_total_bits / max_total_bits / records.

    With ``mesh``, batches are placed over the 'data' axis and the fused
    per-row NLL kernel runs per shard (with ``shard_vocab``, per vocab
    shard with a cross-shard logsumexp merge) — the same numbers as the
    single-device path (tests/test_parallel.py)."""
    pad_id = layout.special_tokens["PAD"]
    n = max(1, int(sample_frac * len(data)))
    sub = data.subset(n)
    if data.permute and not layout.use_padding:
        # reference semantics: posterior_bits iterates the dataset through
        # GraphSeqDataset.__getitem__, which re-permutes each graph's triples
        # (models.py:495-497 + utils.py:131-146)
        from ark_tpu.data.dataset import _permute_batch

        host_rng = np.random.default_rng(0)
        triples, seq = _permute_batch(sub.triples, layout, host_rng)
        sub = type(sub)(triples=triples, seq=seq, n_edges=sub.n_edges,
                        layout=layout)
    if rng is None:
        rng = jax.random.key(0)
    bits_fn = _make_bits_fn(model, pad_id, mesh, shard_vocab)
    if mesh is not None:
        from ark_tpu.parallel import place_batch

    ar_all, kl_all = [], []
    bs = min(batch_size, n)
    if mesh is not None:
        # the batch splits over 'data' (padded rows are PAD-masked anyway)
        nd = dict(mesh.shape).get("data", 1)
        bs = ((bs + nd - 1) // nd) * nd
    for start in range(0, n, bs):
        stop = min(start + bs, n)
        take = stop - start
        # pad the ragged tail to the fixed batch size (avoids a recompile)
        tr = np.zeros((bs,) + sub.triples.shape[1:], sub.triples.dtype)
        sq = np.zeros((bs,) + sub.seq.shape[1:], sub.seq.dtype)
        tr[:take] = sub.triples[start:stop]
        sq[:take] = sub.seq[start:stop]
        rng, k = jax.random.split(rng)
        if mesh is not None:
            tr, sq = place_batch(tr, mesh), place_batch(sq, mesh)
        ar, kl = bits_fn(params, jnp.asarray(tr), jnp.asarray(sq), k)
        # per-row bits come back 'data'-sharded on a mesh; multihost.fetch
        # all-gathers across hosts (plain np.asarray when single-process)
        from ark_tpu.parallel import multihost as _mh
        ar_all.append(_mh.fetch(ar)[:take])
        kl_all.append(_mh.fetch(kl)[:take])
    ar = np.concatenate(ar_all)
    kl = np.concatenate(kl_all)
    total = ar + kl
    records = [
        {"ar_bits": float(a), "kl_bits": float(k), "total_bits": float(t)}
        for a, k, t in zip(ar, kl, total)
    ]
    return {
        "avg_total_bits": float(total.mean()),
        "avg_ar_bits": float(ar.mean()),
        "avg_kl_bits": float(kl.mean()),
        "min_total_bits": float(total.min()),
        "max_total_bits": float(total.max()),
        "records": records,
    }
