"""Test configuration: force CPU JAX with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh), isolate the model registry in a tmp dir."""

import os
import sys
from pathlib import Path

# must happen before jax import; FORCE cpu (the ambient environment pins
# JAX_PLATFORMS to the axon TPU tunnel, which makes every test compile
# remotely — slow and intermittently stalling)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XSPECT_QUERY_CHUNK", "4096")
# persistent compilation cache: repeat suite runs skip XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/xspect2-jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# The environment's axon TPU plugin force-overrides JAX_PLATFORMS at import
# time; config.update after import wins and pins tests to the local CPU
# backend (8 virtual devices via xla_force_host_platform_device_count).
jax.config.update("jax_platforms", "cpu")

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


@pytest.fixture(scope="session")
def session_registry(tmp_path_factory):
    """A trained synthetic registry (SVM species + genus model), built once
    per session.  Yields (data_root, genomes).  Tests using it must set
    XSPECT_DATA_ROOT via the companion ``session_data_root`` fixture."""
    root = tmp_path_factory.mktemp("shared-xspect-data")
    train_dir = tmp_path_factory.mktemp("shared-train")
    rng_ = np.random.default_rng(4242)

    old = os.environ.get("XSPECT_DATA_ROOT")
    os.environ["XSPECT_DATA_ROOT"] = str(root)
    try:
        from xspect2_tpu import train
        from xspect2_tpu.io.fasta import SeqRecord, write_fasta

        genomes = {}
        for label in ("470", "471"):
            base = random_dna(rng_, 8000)
            genomes[label] = base
            (train_dir / "cobs" / label).mkdir(parents=True)
            write_fasta(
                [SeqRecord(base, id=label)], train_dir / "cobs" / label / "a.fasta"
            )
            (train_dir / "svm" / label).mkdir(parents=True)
            for j in range(2):
                variant = list(base)
                variant[500 * (j + 1) : 500 * (j + 1) + 300] = random_dna(rng_, 300)
                write_fasta(
                    [SeqRecord("".join(variant), id=f"{label}v{j}")],
                    train_dir / "svm" / label / f"ACC{j}.fasta",
                )
        train.train_from_directory(
            "Synthetic",
            train_dir,
            meta=True,
            translation_dict={
                "470": "Synthetic baumannii",
                "471": "Synthetic pittii",
            },
        )
    finally:
        if old is None:
            os.environ.pop("XSPECT_DATA_ROOT", None)
        else:
            os.environ["XSPECT_DATA_ROOT"] = old
    return root, genomes


@pytest.fixture()
def session_data_root(session_registry, monkeypatch):
    """Point XSPECT_DATA_ROOT at the shared trained registry."""
    root, genomes = session_registry
    monkeypatch.setenv("XSPECT_DATA_ROOT", str(root))
    return root, genomes
