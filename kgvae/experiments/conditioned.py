"""Compatibility entry point for ``python -m kgvae.experiments.conditioned``
(reference conditioned.py:195)."""
from ark_tpu.experiments.conditioned import main

if __name__ == "__main__":
    main()
