"""SVM model tests: scores.csv format, prediction, exclusion, JAX head parity."""

import numpy as np
import pytest

from xspect2_tpu.io.fasta import SeqRecord, write_fasta
from xspect2_tpu.models.svm_head import JaxSVMHead, fit_svc
from xspect2_tpu.models.svm_model import ProbabilisticFilterSVMModel
from tests.conftest import random_dna


@pytest.fixture()
def svm_training_dirs(tmp_path, rng):
    """cobs/ and svm/ dirs: 3 species, svm genomes are mutated variants."""
    cobs = tmp_path / "cobs"
    svm = tmp_path / "svm"
    genomes = {}
    for si, label in enumerate(("470", "471", "480")):
        base = random_dna(rng, 8000)
        genomes[label] = base
        (cobs / label).mkdir(parents=True)
        write_fasta([SeqRecord(base, id=label)], cobs / label / f"G{si}.fasta")
        (svm / label).mkdir(parents=True)
        for j in range(2):
            # svm variant: genome with a block replaced
            variant = list(base)
            start = 1000 * (j + 1)
            variant[start : start + 500] = random_dna(rng, 500)
            write_fasta(
                [SeqRecord("".join(variant), id=f"{label}v{j}")],
                svm / label / f"ACC_{label}_{j}.fasta",
            )
    # concatenated per-species training file (mirrors train_from_directory)
    species_dir = tmp_path / "species"
    species_dir.mkdir()
    for label in genomes:
        write_fasta(
            [SeqRecord(genomes[label], id=label)], species_dir / f"{label}.fasta"
        )
    return species_dir, svm, genomes


def _make_model(tmp_path):
    return ProbabilisticFilterSVMModel(
        k=21,
        model_display_name="Synthetic",
        author=None,
        author_email=None,
        model_type="Species",
        base_path=tmp_path / "models",
        kernel="rbf",
        c=1.0,
    )


def test_svm_fit_scores_csv(tmp_path, svm_training_dirs):
    species_dir, svm_dir, genomes = svm_training_dirs
    model = _make_model(tmp_path)
    model.fit(species_dir, svm_dir)

    csv_path = tmp_path / "models" / "synthetic-species" / "scores.csv"
    lines = csv_path.read_text().splitlines()
    assert lines[0] == "file,470,471,480,label_id"
    assert len(lines) == 7  # header + 3 species x 2 svm genomes
    # own-species score is the row max and high (variants share ~94%)
    for line in lines[1:]:
        parts = line.split(",")
        label = parts[-1]
        scores = dict(zip(["470", "471", "480"], map(float, parts[1:-1])))
        assert scores[label] == max(scores.values())
        assert scores[label] > 0.85


def test_svm_predict_recovers_label(tmp_path, svm_training_dirs):
    species_dir, svm_dir, genomes = svm_training_dirs
    model = _make_model(tmp_path)
    model.fit(species_dir, svm_dir)
    model.save()

    res = model.predict(species_dir / "471.fasta")
    assert res.prediction == "471"
    assert res.get_scores()["total"]["471"] == 1.0

    loaded = ProbabilisticFilterSVMModel.load(
        tmp_path / "models" / "synthetic-species.json"
    )
    res2 = loaded.predict(species_dir / "471.fasta")
    assert res2.prediction == "471"

    # exclusion: excluding the true label forces another prediction
    res3 = loaded.predict(species_dir / "471.fasta", exclude_ids=["471"])
    assert res3.prediction in ("470", "480")
    assert "471" not in res3.hits[next(iter(res3.hits))]


def test_jax_head_matches_sklearn(rng):
    import jax.numpy as jnp

    for trial in range(5):
        n_classes = int(rng.integers(2, 6))
        x = rng.normal(size=(40, n_classes)).astype(np.float64)
        y = [str(rng.integers(0, n_classes)) for _ in range(40)]
        if len(set(y)) < 2:
            continue
        svc = fit_svc(x, y, "rbf", 1.0)
        head = JaxSVMHead.from_sklearn(svc)

        xt = rng.normal(size=(64, n_classes)).astype(np.float64)
        expected = list(svc.predict(xt))
        got_np = head.predict(xt, xp=np)
        assert got_np == expected, f"trial {trial} (numpy)"
        got_jax = head.predict(xt, xp=jnp)
        assert got_jax == expected, f"trial {trial} (jax)"


def test_jax_head_linear_kernel(rng):
    x = rng.normal(size=(30, 4))
    y = [str(i % 3) for i in range(30)]
    svc = fit_svc(x, y, "linear", 1.0)
    head = JaxSVMHead.from_sklearn(svc)
    xt = rng.normal(size=(20, 4))
    assert head.predict(xt) == list(svc.predict(xt))
