"""Export an ark_tpu checkpoint to the reference's torch format.

    python -m ark_tpu.experiments.export_torch <in.pt> <out.pt>

The output is a ``torch.save``d payload with the reference schema
(train.py:576-585, legacy serialization train.py:589) whose
``model_state_dict`` uses the reference module key names — loadable by the
reference's own conditioned.py / interpolation.py tooling with
``load_state_dict(strict=True)``, and by this repo's torch reader
(round-trip parity tested for all four families in
tests/test_torch_interop.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Export an ark_tpu checkpoint to reference torch format")
    ap.add_argument("input", help="ark_tpu checkpoint (.pt)")
    ap.add_argument("output", help="torch-format output path (.pt)")
    args = ap.parse_args(argv)

    from ark_tpu.utils.checkpoint import load_checkpoint
    from ark_tpu.utils.torch_interop import save_torch_checkpoint

    ckpt = load_checkpoint(args.input)
    if ckpt.get("format") == "torch.interop":
        raise SystemExit(f"{args.input} is already a torch checkpoint")
    save_torch_checkpoint(
        args.output,
        params=ckpt["model_state_dict"],
        config=ckpt["config"],
        epoch=ckpt.get("epoch", 0),
        val_loss=ckpt.get("val_loss"),
        vocabs=ckpt.get("vocabs"),
        dataset_meta=ckpt.get("dataset_meta"),
    )
    print(f"Exported {args.input} -> {args.output} "
          f"(model_type={ckpt['config'].get('model_type')})")


if __name__ == "__main__":
    main()
