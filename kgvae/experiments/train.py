"""Compatibility entry point: ``python -m kgvae.experiments.train`` —
the reference's public CLI (reference train.py:241; README.md:42) —
forwards to the TPU-native trainer."""
from ark_tpu.experiments.train import main

if __name__ == "__main__":
    main()
