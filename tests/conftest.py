"""Test configuration: force CPU JAX with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh), isolate the model registry in a tmp dir."""

import os
import sys
from pathlib import Path

# must happen before jax import
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def data_root(tmp_path, monkeypatch):
    """Isolated xspect-data root for registry-touching tests."""
    root = tmp_path / "xspect-data"
    monkeypatch.setenv("XSPECT_DATA_ROOT", str(root))
    return root


def random_dna(rng: np.random.Generator, length: int) -> str:
    return "".join(rng.choice(list("ACGT"), size=length))


@pytest.fixture()
def rng():
    return np.random.default_rng(12345)
