"""Conditioned decoding (reference kgvae/experiments/conditioned.py:1-294):
load checkpoints, force the first triple's relation and tail entity by
logit masking at generation steps 2 and 3, print labeled graphs.

Defaults force relation "has_director" and tail "Tim Burton"
(reference conditioned.py:12-13) — both exist in the wd-movies vocabulary.

TPU-native differences: generation is the lax.scan sampler with static
forced-token hooks (ark_tpu/sample/samplers.py) instead of a per-step host
loop; checkpoints are ark_tpu pickles (same payload schema).
"""

from __future__ import annotations

import argparse
import copy
from pathlib import Path

import jax

from ark_tpu.data.tokenizer import (
    VocabLayout,
    build_vocab_layout,
    ints_to_labels,
    seqs_to_triples_batch,
)
from ark_tpu.models import build_model
from ark_tpu.sample import make_sampler
from ark_tpu.utils.checkpoint import load_checkpoint, to_device_tree

CONDITION_RELATION = "has_director"
CONDITION_OBJECT = "Tim Burton"


def load_run_checkpoint(path):
    """Reference conditioned.py:16-25 (module.-prefix handling is a torch
    DataParallel artifact with no ark_tpu equivalent)."""
    ckpt = load_checkpoint(path)
    config = ckpt["config"]
    state = ckpt["model_state_dict"]
    vocabs = ckpt.get("vocabs")
    if vocabs is None:
        raise KeyError(f"Checkpoint {path} is missing 'vocabs'.")
    return config, state, vocabs


def normalize_config(config, model_type_override=None):
    """Legacy model_type alias resolution (reference conditioned.py:28-49)."""
    cfg = copy.deepcopy(config)
    raw_type = model_type_override or cfg.get("model_type", "ARK")
    lower = str(raw_type).lower()
    if lower in {"sail", "autoreg", "autoregressive"}:
        resolved = "SAIL"
    elif lower in {"t-sail", "tsail"}:
        resolved = "t-SAIL"
    elif lower == "ark":
        resolved = "ARK"
    elif lower in {"t-ark", "tark"}:
        resolved = "t-ARK"
    elif lower == "dec_only":
        decoder = str(cfg.get("ablation_decoder", "Transformer")).lower()
        resolved = "ARK" if decoder == "gru" else "t-ARK"
    else:
        raise ValueError(f"Unsupported model_type '{raw_type}'.")
    cfg["model_type"] = resolved
    return cfg, resolved


def resolve_model_variant(config, raw_type=None):
    _, resolved = normalize_config(config, raw_type)
    return resolved


def build_from_checkpoint(config, state, model_type_override=None):
    cfg, resolved = normalize_config(config, model_type_override)
    model = build_model(cfg)
    params = to_device_tree(state)
    kind = "autoreg" if resolved in ("SAIL", "t-SAIL") else "decoder_only"
    return model, params, cfg, kind


def _layout_from_config(cfg) -> VocabLayout:
    return build_vocab_layout(
        cfg["n_entities"] - (1 if cfg.get("use_padding") else 0),
        cfg["n_relations"] - (1 if cfg.get("use_padding") else 0),
        cfg.get("min_edges", 1), cfg["max_edges"],
        bool(cfg.get("use_padding")))


def ids_for_condition(vocabs, cfg, relation_label, object_label):
    """Reference conditioned.py:158-171."""
    e2i, r2i = vocabs.get("e2i"), vocabs.get("r2i")
    if e2i is None or r2i is None:
        raise KeyError("Checkpoint vocabs require 'e2i' and 'r2i'.")
    try:
        rid = r2i[relation_label] + cfg["REL_BASE"]
    except KeyError as err:
        raise KeyError(f"Relation '{relation_label}' not found in checkpoint vocab.") from err
    try:
        oid = e2i[object_label] + cfg["ENT_BASE"]
    except KeyError as err:
        raise KeyError(f"Entity '{object_label}' not found in checkpoint vocab.") from err
    return rid, oid


def conditional_generate(model, kind, cfg, layout, params,
                         forced_relation_id, forced_object_id,
                         num_samples, seed=0):
    """Reference conditional_generate (conditioned.py:109-155): force the
    relation at index 2 and the tail at index 3 of the sequence. Decoder-only
    models sample (reference default cfg 'sample'=True); SAIL draws one
    z ~ N(0, I) and decodes greedily."""
    forced = ((2, int(forced_relation_id)), (3, int(forced_object_id)))
    rng = jax.random.key(seed)
    temperature = cfg.get("temperature", 1.0)
    top_p = cfg.get("top_p", 0.0)
    top_k = cfg.get("top_k", 0)
    if kind == "decoder_only":
        do_sample = bool(cfg.get("sample", True) or (top_p and top_p > 0.0)
                         or (top_k and top_k > 0)
                         or (temperature and temperature != 1.0))
        sampler = make_sampler(model, layout, sample=do_sample,
                               temperature=temperature, top_p=top_p,
                               top_k=top_k, forced=forced,
                               fused_strategy=cfg.get(
                                   "fused_sample_strategy", "auto"))
        return sampler(params, rng, num_samples)
    rng, kz, ks = jax.random.split(rng, 3)
    z = jax.random.normal(kz, (num_samples, cfg["d_latent"]))
    sampler = make_sampler(model, layout, sample=False, forced=forced)
    return sampler(params, ks, z)


def to_labeled_triples(seqs, cfg, vocabs, verbose=True):
    """Reference conditioned.py:174-183. ``verbose=False`` silences the
    skipped-triple stdout warning (the serve daemon speaks JSONL on stdout)."""
    graphs = seqs_to_triples_batch(seqs, cfg["special_tokens"],
                                   cfg["ENT_BASE"], cfg["REL_BASE"])
    i2e, i2r = vocabs.get("i2e"), vocabs.get("i2r")
    if i2e is None or i2r is None:
        raise KeyError("Checkpoint vocabs require 'i2e' and 'i2r' for decoding.")
    return ints_to_labels(graphs, i2e, i2r, verbose=verbose)


def discover_checkpoints(explicit, checkpoint_dir):
    """Reference conditioned.py:186-192."""
    if explicit:
        return [Path(p) for p in explicit]
    directory = Path(checkpoint_dir)
    if not directory.exists():
        return []
    return sorted(directory.glob("*.pt")) + sorted(directory.glob("*/*.pt"))


def main(argv=None):
    parser = argparse.ArgumentParser("Conditioned decoding for WD Movies")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoints", nargs="+", default=None)
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--num-samples", type=int, default=4)
    parser.add_argument("--device", type=str, default=None,
                        help="unused (JAX manages device placement)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--relation", type=str, default=CONDITION_RELATION)
    parser.add_argument("--tail", type=str, default=CONDITION_OBJECT)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--model-type", type=str, default=None,
                        choices=["SAIL", "t-SAIL", "ARK", "t-ARK"])
    args = parser.parse_args(argv)
    # one TPU job at a time (no-op on the cpu platform)
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="conditioned")

    import yaml

    with open(args.config) as f:
        cfg_file = yaml.safe_load(f)
    dataset_filter = args.dataset or cfg_file.get("dataset")
    model_type_override = args.model_type or cfg_file.get("model_type")

    checkpoints = discover_checkpoints(args.checkpoints, args.checkpoint_dir)
    if not checkpoints:
        raise SystemExit("No checkpoints found. Provide --checkpoints or "
                         "populate the checkpoint directory.")

    for ckpt_path in checkpoints:
        config, state, vocabs = load_run_checkpoint(ckpt_path)
        dataset = config.get("dataset")
        if dataset_filter and dataset != dataset_filter:
            print(f"Skipping {ckpt_path} (dataset={dataset}).")
            continue
        try:
            resolved_ckpt = resolve_model_variant(config)
        except ValueError as err:
            print(f"Skipping {ckpt_path}: {err}")
            continue
        override = model_type_override
        if override is not None:
            try:
                if resolve_model_variant(config, override) != resolved_ckpt:
                    print(f"Warning: override '{override}' does not match "
                          f"checkpoint type {resolved_ckpt}; using checkpoint type.")
                    override = None
            except ValueError:
                override = None

        model, params, cfg, kind = build_from_checkpoint(config, state, override)
        required = {"PAD", "BOS", "EOS"}
        if not required.issubset(cfg.get("special_tokens", {})):
            print(f"Skipping {ckpt_path}: missing special tokens")
            continue
        try:
            rid, oid = ids_for_condition(vocabs, cfg, args.relation, args.tail)
        except KeyError as err:
            print(f"Skipping {ckpt_path}: {err}")
            continue

        layout = _layout_from_config(cfg)
        seqs = conditional_generate(model, kind, cfg, layout, params, rid, oid,
                                    args.num_samples, seed=args.seed)
        labeled = to_labeled_triples(seqs, cfg, vocabs)
        print("\n===", ckpt_path, "===")
        for idx, triples in enumerate(labeled, start=1):
            print(f"[{idx}]")
            if not triples:
                print("  (empty graph)")
                continue
            for triple in triples:
                print("  ", triple)
        print("---")


if __name__ == "__main__":
    main()
