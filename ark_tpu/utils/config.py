"""Config handling: YAML file -> flat dict -> sweep overrides -> derived-key
mutation -> effective-config dump (reference L0 layer, train.py:249-283).
"""

from __future__ import annotations

import os

import yaml


def load_config(path: str) -> dict:
    with open(path, "r") as f:
        config = yaml.safe_load(f)
    config["learning_rate"] = float(config.get("learning_rate", 1e-3))
    return config


def apply_overrides(cfg: dict, overrides) -> dict:
    """Reference train.py:252-255."""
    for k, v in dict(overrides).items():
        cfg[k] = v
    return cfg


def dump_effective_config(config: dict, run_dir: str) -> None:
    os.makedirs(run_dir, exist_ok=True)
    dumpable = {k: v for k, v in config.items()
                if isinstance(v, (str, int, float, bool, list, dict, type(None)))}
    with open(os.path.join(run_dir, "effective_config.yaml"), "w") as f:
        yaml.safe_dump(dumpable, f)
