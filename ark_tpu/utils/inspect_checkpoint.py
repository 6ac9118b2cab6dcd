"""Checkpoint inspector CLI:

    python -m ark_tpu.utils.inspect_checkpoint <checkpoint.pt> [--params]

Prints the payload schema (reference train.py:576-585 keys), dataset/vocab
metadata, and optionally every parameter leaf with shape/dtype and the total
parameter count.
"""

from __future__ import annotations

import argparse

import numpy as np

from ark_tpu.utils.checkpoint import load_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser("ARK-TPU checkpoint inspector")
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("--params", action="store_true",
                        help="list every parameter leaf")
    args = parser.parse_args(argv)

    ckpt = load_checkpoint(args.checkpoint)
    print(f"format:   {ckpt.get('format', 'unknown')}")
    print(f"epoch:    {ckpt.get('epoch')}")
    print(f"val_loss: {ckpt.get('val_loss')}")
    meta = ckpt.get("dataset_meta", {})
    print(f"dataset:  {meta.get('dataset')} "
          f"(entities={meta.get('n_entities')}, "
          f"relations={meta.get('n_relations')})")
    cfg = ckpt.get("config", {})
    print(f"model:    {cfg.get('model_type')} d_model={cfg.get('d_model')} "
          f"n_layers={cfg.get('n_layers')} d_latent={cfg.get('d_latent')} "
          f"vocab={cfg.get('vocab_size')} seq_len={cfg.get('seq_len')}")
    vocabs = ckpt.get("vocabs", {})
    print(f"vocabs:   {sorted(vocabs)} "
          f"(|e2i|={len(vocabs.get('e2i', {}))}, "
          f"|r2i|={len(vocabs.get('r2i', {}))})")
    sched = ckpt.get("scheduler_state_dict")
    print(f"sched:    {sched}")

    import jax

    leaves = jax.tree_util.tree_flatten_with_path(ckpt["model_state_dict"])[0]
    total = 0
    for path, leaf in leaves:
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        total += n
        if args.params:
            print(f"  {jax.tree_util.keystr(path)}: "
                  f"{np.shape(leaf)} {getattr(leaf, 'dtype', type(leaf))}")
    print(f"params:   {len(leaves)} leaves, {total:,} parameters")
    return ckpt


if __name__ == "__main__":
    main()
