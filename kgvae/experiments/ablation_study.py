"""Compatibility entry point for ``python -m kgvae.experiments.ablation_study``
(reference ablation_study.py:348)."""
from ark_tpu.experiments.train import main

if __name__ == "__main__":
    main()
