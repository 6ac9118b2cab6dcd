"""Ablation-study CLI (reference ablation_study.py:348-354).

The reference's ablation trainer is a strict superset of its main trainer
(adds SAIL/t-SAIL with β-annealed ELBO; SURVEY quirk Q-6). ark_tpu unifies
both behind one trainer, so this entry point is the same program as
``ark_tpu.experiments.train``.
"""

from ark_tpu.experiments.train import main

if __name__ == "__main__":
    main()
