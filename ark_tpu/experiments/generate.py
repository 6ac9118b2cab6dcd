"""Standalone graph generation (serving) CLI — checkpoint in, graphs out.

New tooling beyond the reference surface: the reference can only sample
inside its training loop (train.py:513-532) or with forced tokens
(conditioned.py). This CLI serves any checkpoint — ark_tpu pickles or
legacy torch ``.pt`` payloads (utils/torch_interop.py) — with NO dataset
dependency (the vocabs embedded in the checkpoint are the decoder):

    python -m ark_tpu.experiments.generate --checkpoint <path>.pt \
        [--num-samples N] [--batch B] [--temperature T] [--top-p P]
        [--top-k K] [--greedy] [--seed S] [--format tsv|jsonl|pretty]
        [--output FILE]

LM checkpoints (ARK/t-ARK) sample token sequences on-device (single
lax.scan, fused Pallas top-p kernel where supported); VAE checkpoints
(SAIL/t-SAIL) decode z ~ N(0, I) greedily (the reference's latent-sampling
evaluation path, ablation_study.py:682-720). Output: one graph per record
as (head, relation, tail) label triples.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import numpy as np

from ark_tpu.experiments.conditioned import (
    _layout_from_config,
    build_from_checkpoint,
    load_run_checkpoint,
    to_labeled_triples,
)
from ark_tpu.sample import make_sampler


def make_serving_mesh(mesh: str, shard_vocab: bool, params):
    """Build the serving mesh (shared by the generate and serve CLIs) and
    place ``params`` on it: 'auto' shards the request batch over all local
    devices ('data' axis); ``shard_vocab`` additionally splits the
    embedding/logit head 2-way over a 'model' axis (big-vocab layout —
    the fused sampler streams per-shard head slices with cross-shard
    merges, ops/pallas/sample_step.py). Returns the possibly-degraded
    ``(device_mesh, shard_vocab, params)``: single device (or mesh='off')
    serves mesh-less and must drop shard_vocab too (SamplerBank fails fast
    on shard_vocab without a mesh); odd device counts drop shard_vocab."""
    device_mesh = None
    n_dev = jax.device_count()
    if mesh == "off" or n_dev <= 1:
        shard_vocab = False
    if mesh != "off" and n_dev > 1:
        from ark_tpu.parallel import make_mesh, param_shardings

        if shard_vocab and n_dev % 2 == 0:
            axes = {"data": n_dev // 2, "model": 2}
        else:
            shard_vocab = False
            axes = {"data": n_dev}
        device_mesh = make_mesh(axes)
        params = jax.device_put(
            params, param_shardings(params, device_mesh, shard_vocab))
        print(f"Serving mesh: {axes} over {n_dev} devices"
              + (" (vocab-sharded head)" if shard_vocab else ""),
              file=sys.stderr)
    return device_mesh, shard_vocab, params


def generate_graphs(ckpt_path: str, num_samples: int = 100, batch: int = 256,
                    temperature: float = 1.0, top_p: float = 0.9,
                    top_k: int = 0, greedy: bool = False, seed: int = 0,
                    model_type: str | None = None,
                    sample_strategy: str = "auto", mesh: str = "auto",
                    shard_vocab: bool = False):
    """Returns a list of labeled graphs (each a list of (h, r, t) labels).

    ``mesh='auto'`` shards the serving batch over all local devices when
    more than one is attached (SPMD generation, no cross-chip comms on the
    DP axis); ``shard_vocab`` additionally splits the embedding/logit head
    2-way over a 'model' axis — the big-vocab layout where the fused
    sampling kernel streams per-shard head slices with cross-shard merges
    instead of all-gathering the head (ops/pallas/sample_step.py)."""
    config, state, vocabs = load_run_checkpoint(ckpt_path)
    model, params, cfg, kind = build_from_checkpoint(config, state,
                                                     model_type)
    layout = _layout_from_config(cfg)
    batch = max(1, min(batch, num_samples))
    rng = jax.random.key(seed)
    device_mesh, shard_vocab, params = make_serving_mesh(mesh, shard_vocab,
                                                         params)

    if kind == "decoder_only" and greedy:
        # greedy LM decode (no SamplerBank path for sample=False LMs);
        # ride the serving mesh when the batch divides its 'data' axis —
        # otherwise a mesh-less sampler still computes correctly over the
        # (possibly sharded) params via GSPMD, just without batch sharding
        nd = (1 if device_mesh is None
              else dict(device_mesh.shape).get("data", 1))
        smp_mesh = device_mesh if batch % nd == 0 else None
        sampler = make_sampler(model, layout, sample=False, mesh=smp_mesh,
                               shard_vocab=shard_vocab and smp_mesh is not None)
        seqs, got = [], 0
        while got < num_samples:
            rng, k = jax.random.split(rng)
            seqs.append(np.asarray(sampler(params, k, batch)))
            got += batch
        seqs = np.concatenate(seqs)[:num_samples]
    else:
        # production path: all chunks of the request run in ONE device
        # dispatch (SamplerBank chunk scan). LM outputs are bitwise the
        # prior release's for a given --seed (same per-chunk rng splits);
        # the VAE path's z-key derivation changed (3-way split per chunk),
        # so a fixed seed draws different — equally distributed — graphs
        # than pre-round-3 releases.
        from ark_tpu.train.loop import SamplerBank

        bank = SamplerBank(model, layout,
                           dict(cfg, sample_chunk=batch,
                                temperature=temperature, top_p=top_p,
                                top_k=top_k,
                                fused_sample_strategy=sample_strategy),
                           mesh=device_mesh, shard_vocab=shard_vocab)
        if kind == "decoder_only":
            seqs = bank.sample_sequences(params, rng, num_samples)
        else:
            seqs = bank.sample_latent_sequences(params, rng, num_samples)
    return to_labeled_triples(seqs, cfg, vocabs)


def _emit(graphs, fmt, out):
    if fmt == "jsonl":
        for g in graphs:
            out.write(json.dumps([list(t) for t in g]) + "\n")
    elif fmt == "tsv":
        # intelligraphs-style: one triple per line, blank line between graphs
        for g in graphs:
            for h, r, t in g:
                out.write(f"{h}\t{r}\t{t}\n")
            out.write("\n")
    else:
        for i, g in enumerate(graphs):
            out.write(f"[{i}]\n")
            for t in g:
                out.write(f"   {t}\n")


def main(argv=None):
    p = argparse.ArgumentParser("ARK-TPU graph generation")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model-type", default=None,
                   help="override legacy model_type aliases")
    p.add_argument("--mesh", default="auto", choices=["auto", "off"],
                   help="shard the serving batch over all local devices "
                        "(auto, when >1 attached)")
    p.add_argument("--shard-vocab", action="store_true",
                   help="also split the embedding/logit head 2-way over a "
                        "'model' mesh axis (big-vocab serving layout)")
    p.add_argument("--sample-strategy", default="auto",
                   choices=["auto", "gumbel", "expmin", "cdf"],
                   help="fused-kernel candidate draw (expmin = same draw, "
                        "cheaper noise arithmetic; cdf compiles ~45x faster "
                        "at ~0.84x throughput; docs/BENCH_NOTES.md)")
    p.add_argument("--format", choices=["tsv", "jsonl", "pretty"],
                   default="pretty")
    p.add_argument("--output", default=None, help="file (default: stdout)")
    args = p.parse_args(argv)
    # one TPU job at a time (no-op on the cpu platform)
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="generate")

    graphs = generate_graphs(
        args.checkpoint, num_samples=args.num_samples, batch=args.batch,
        temperature=args.temperature, top_p=args.top_p, top_k=args.top_k,
        greedy=args.greedy, seed=args.seed, model_type=args.model_type,
        sample_strategy=args.sample_strategy, mesh=args.mesh,
        shard_vocab=args.shard_vocab)
    if args.output:
        with open(args.output, "w") as f:
            _emit(graphs, args.format, f)
        print(f"Wrote {len(graphs)} graphs to {args.output}")
    else:
        _emit(graphs, args.format, sys.stdout)
    return graphs


if __name__ == "__main__":
    main()
