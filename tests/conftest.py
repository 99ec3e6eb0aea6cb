import os

# force CPU with 8 virtual devices BEFORE jax import — sharding tests run on
# a virtual mesh (SURVEY.md §4); bench/real-TPU runs bypass pytest.
# overwrite, not setdefault: the environment exports JAX_PLATFORMS=axon
# (the real-TPU tunnel) globally, and the axon plugin ignores the env var —
# only the programmatic config update reliably forces CPU here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def sample_train_dir():
    return "/root/reference/data/sample_data/train"


@pytest.fixture(scope="session")
def sample_test_dir():
    return "/root/reference/data/sample_data/test"


@pytest.fixture()
def base_argv(sample_train_dir, sample_test_dir, tmp_path):
    return [
        "--train-data-path", sample_train_dir,
        "--test-data-path", sample_test_dir,
        "--dir-result", str(tmp_path / "results"),
        "--batch-size", "2", "--num-workers", "1",
    ]


@pytest.fixture(autouse=True)
def _isolate_test_index_cache(tmp_path, monkeypatch):
    """Eval index caches write to ./data/testIndexes relative to cwd
    (reference contract) — keep them inside the test tmpdir."""
    monkeypatch.chdir(tmp_path)
    (tmp_path / "data").mkdir(exist_ok=True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end regressions "
        "(golden parity, learning-sanity)")
