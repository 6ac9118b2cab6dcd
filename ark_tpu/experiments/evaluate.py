"""Standalone checkpoint evaluation CLI.

The reference evaluates only inside its training loop (final_validation,
train.py:132-239); this tool runs the same evaluation suite — split loss,
posterior compression bits, sampling + semantic verification (+ diversity
for the VAE family) — against any saved checkpoint:

    python -m ark_tpu.experiments.evaluate --checkpoint <path>.pt \
        [--split validation|test] [--num-samples N] [--seed S]

Prints the final_{split}/* metric dict as one JSON line (same metric names
as the trainer's final evaluation, SURVEY §5).
"""

from __future__ import annotations

import argparse
import json

import jax

from ark_tpu.models import build_model
from ark_tpu.train.loop import DataBundle, SamplerBank, sample_and_evaluate
from ark_tpu.train.state import TrainState
from ark_tpu.train.steps import make_epoch_fns
from ark_tpu.data.tokenizer import canonical_graph_string
from ark_tpu.eval import posterior_bits
from ark_tpu.utils.checkpoint import load_checkpoint, to_device_tree


def eval_row_cap(config, layout, seq, w, device_mesh):
    """Per-shard live-row bound for the fused-CE eval path, computed for
    THIS process's mesh and THIS split. A checkpoint's stored
    ``ce_row_cap_eval`` is a per-shard bound from the TRAINING shard
    count — reused on fewer devices it under-caps and the fused kernel's
    violation guard would poison the eval loss to +inf, so the stored
    value is always ignored here (the trainer computes caps at every
    vocab size, train/loop.py, and so does this)."""
    import numpy as np

    from ark_tpu.ops.losses import compute_ce_row_cap
    n_shards = (1 if device_mesh is None
                else dict(device_mesh.shape).get("data", 1))
    return compute_ce_row_cap(
        np.asarray(seq), layout.special_tokens["PAD"],
        config["batch_size"], row_weights=np.asarray(w), n_shards=n_shards)


def evaluate_checkpoint(ckpt_path: str, split: str = "validation",
                        num_samples: int | None = None, seed: int = 0,
                        mesh: str = "auto",
                        overrides: dict | None = None) -> dict:
    ckpt = load_checkpoint(ckpt_path)
    config = dict(ckpt["config"])
    # config overrides (e.g. sampler perf knobs) — the hardware-A/B hook:
    # evaluate the SAME checkpoint under two sampler configurations and
    # compare validity (the quality gate for distribution-affecting knobs
    # like fused_sample_dtype=bfloat16; docs/BENCH_NOTES.md)
    config.update(overrides or {})

    # multi-device evaluation: batch over 'data' (same auto-mesh policy as
    # the trainer; eval loss, compression and sampling all ride it). The
    # mesh must exist BEFORE build_model — the Pallas GRU is shard_map-
    # wrapped per data shard only when the model knows the mesh (Mosaic
    # custom calls are not GSPMD-partitionable, models/api.py)
    device_mesh = None
    n_dev = jax.device_count()
    if mesh != "off" and n_dev > 1 \
            and int(config["batch_size"]) % n_dev == 0:
        from ark_tpu.parallel import make_mesh

        device_mesh = make_mesh({"data": n_dev})

    model = build_model(config, mesh=device_mesh)
    params = to_device_tree(ckpt["model_state_dict"])
    bundle = DataBundle(config)
    layout = bundle.layout
    is_vae = model.kind == "vae"

    if device_mesh is not None:
        from ark_tpu.parallel import replicate

        params = replicate(params, device_mesh)

    data_split = "test" if split == "test" else "val"
    rng = jax.random.key(seed)
    rng, k_eval, k_comp, k_sample = jax.random.split(rng, 4)

    # compute the row cap on the HOST copies before device placement —
    # pulling the split back from the device just for numpy is a wasted
    # multi-MB tunnel round-trip
    h_triples, h_seq, h_w = bundle.host_eval(data_split,
                                             config["batch_size"])
    config["ce_row_cap_eval"] = eval_row_cap(config, layout, h_seq, h_w,
                                             device_mesh)
    import jax.numpy as jnp

    if device_mesh is not None:
        from ark_tpu.parallel import replicate

        # host arrays straight onto the (possibly multi-host) mesh
        triples, seq, w = replicate((h_triples, h_seq, h_w), device_mesh)
    else:
        triples, seq, w = (jnp.asarray(h_triples), jnp.asarray(h_seq),
                           jnp.asarray(h_w))
    _, eval_epoch = make_epoch_fns(model, layout, config, mesh=device_mesh)
    from ark_tpu.parallel import multihost as mh

    m = eval_epoch(params, triples, seq, w, k_eval, 1.0)
    m = {k: float(mh.fetch(v)) for k, v in m.items()}

    stats = posterior_bits(model, params, getattr(bundle, data_split), layout,
                           sample_frac=float(config.get("sample_frac", 0.1)),
                           rng=k_comp, mesh=device_mesh)

    # family-dependent reference default (ablation_study.py:255,299)
    target_n = int(num_samples
                   or config.get("num_generated_latent_graphs",
                                 10000 if is_vae else 1000))
    sampler_bank = SamplerBank(model, layout, config, mesh=device_mesh)
    title = "graphs from random latent" if is_vae else "ARK samples"
    res, graphs = sample_and_evaluate(model, params, bundle, config, k_sample,
                                      target_n, sampler_bank, title)

    name = "test" if split == "test" else "validation"
    prefix = "latent_" if is_vae else ""
    out = {
        f"final_{name}/loss": float(m["loss"]),
        f"final_{name}/reconstruction_loss": float(m["reconstruction_loss"]),
        f"final_{name}/kl_loss": float(m["kl_loss"]),
        f"final_{name}/entity_loss": 0.0,
        f"final_{name}/compression_bits": stats["avg_total_bits"],
        f"final_{name}/compression_kl_bits": stats["avg_kl_bits"],
        f"final_{name}/compression_edge_bits": stats["avg_ar_bits"],
        f"final_{name}/compression_entity_bits": stats["avg_ar_bits"],
        f"final_{name}/{prefix}validity_rate": res.get("semantics", 0.0) / 100.0,
        f"final_{name}/{prefix}novelty_rate": res.get("novel", 0.0) / 100.0,
        f"final_{name}/{prefix}valid_novelty_rate":
            res.get("novel_semantics", 0.0) / 100.0,
    }
    if is_vae:
        uniq = {canonical_graph_string(g) for g in graphs}
        out["diversity/unique_graphs"] = len(uniq)
        out["diversity/ratio"] = len(uniq) / max(1, len(graphs))
    out["checkpoint"] = ckpt_path
    out["epoch"] = int(ckpt.get("epoch", -1))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser("ARK-TPU checkpoint evaluation")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--split", type=str, default="validation",
                        choices=["validation", "test"])
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--mesh", default="auto", choices=["auto", "off"],
                        help="shard evaluation over all local devices "
                             "(auto, when >1 attached and batch divides)")
    parser.add_argument("--override", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="config override (repeatable), e.g. "
                             "--override fused_sample_dtype=bfloat16 — "
                             "values parse as YAML scalars (ints/floats/"
                             "bools/strings)")
    args = parser.parse_args(argv)
    import yaml
    overrides = {}
    for kv in args.override:
        key, sep, val = kv.partition("=")
        if not sep:
            parser.error(f"--override expects KEY=VALUE, got {kv!r}")
        overrides[key] = yaml.safe_load(val)
    # multi-host launch contract (same as the trainer's): ARK_TPU_* env
    # vars; after this the auto-mesh spans all hosts
    from ark_tpu.parallel import multihost as mh
    mh.initialize_from_env()
    # one TPU job at a time (no-op on the cpu platform)
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="evaluate")
    out = evaluate_checkpoint(args.checkpoint, split=args.split,
                              num_samples=args.num_samples, seed=args.seed,
                              mesh=args.mesh, overrides=overrides)
    if overrides:
        out["overrides"] = overrides
    if mh.is_primary():
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
