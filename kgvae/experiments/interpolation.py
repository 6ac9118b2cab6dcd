"""Compatibility entry point for ``python -m kgvae.experiments.interpolation``
(reference interpolation.py:897)."""
from ark_tpu.experiments.interpolation import main

if __name__ == "__main__":
    main()
