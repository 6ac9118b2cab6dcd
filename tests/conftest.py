"""Test configuration: run JAX on CPU with 8 virtual devices so data-parallel
sharding is testable without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before the CPU backend initializes. Note: this environment's
# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon,
# so the env var alone is too late — force the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Small procedurally-generated datasets for tests (full-size generation of
# wd-articles takes a while; tests use a dedicated scratch data dir).
import pathlib
import tempfile

_TEST_DATA_DIR = pathlib.Path(tempfile.gettempdir()) / "ark_tpu_test_data"
os.environ.setdefault("ARK_TPU_DATA_DIR", str(_TEST_DATA_DIR))

import pytest  # noqa: E402

TEST_SPLIT_SIZES = {
    "syn-paths": (400, 100, 100),
    "syn-types": (400, 100, 100),
    "syn-tipr": (400, 100, 100),
    "wd-movies": (300, 80, 80),
    "wd-articles": (200, 60, 60),
}


@pytest.fixture(scope="session")
def small_datasets():
    """Materialize small versions of all five datasets once per session."""
    from ark_tpu.data.loader import DatasetDownloader

    dl = DatasetDownloader()
    for name, sizes in TEST_SPLIT_SIZES.items():
        meta = dl._meta_path(name)
        if not meta.exists():
            dl.download_dataset(name, sizes=sizes)
    dl.verify_datasets()
    return _TEST_DATA_DIR
