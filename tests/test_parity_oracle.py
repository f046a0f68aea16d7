"""Reference-parity oracle: pinned numbers from the reference's own suite.

The reference pins exact outputs on four NCBI fixture assemblies and on
its downloadable production models (reference: tests/test_cli.py:26-86,
tests/test_probabilistic_filter_model.py:73-161,
tests/test_probabilistic_filter_mlst_model.py:82-99).  This environment
has zero egress, so the fixtures and the reference's native libraries
(xxhash / rbloom / cobs_index) cannot exist here — every test below
therefore SELF-ACTIVATES: it runs whenever its inputs are present and
skips with an exact shopping list otherwise.  In any networked checkout
the whole oracle is:

    pip install xxhash rbloom cobs-index-reloaded
    python tools/fetch_parity_fixtures.py        # NCBI fixture assemblies
    xspect2 models download                      # production model bundle
    xspect2 models train mlst                    # A. baumannii Oxford scheme
    pytest tests/test_parity_oracle.py -v

Scores here are structural (equal fpr, no false negatives, identical
rounding) rather than hash-bit-identical — PARITY.md "Known deviations"
— so a 2-dp mismatch in a pure-noise cell (0.00 vs 0.01) is possible in
principle; these assertions exist precisely to find out.
"""

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# Reference fixture assemblies (reference: tests/conftest.py:12-48).
FIXTURES = {
    "salmonella": "GCF_000006945.2_ASM694v2_genomic.fna",
    "baumannii_acicu": "GCF_000018445.1_ASM1844v1_genomic.fna",
    "baumannii_aye": "GCF_000069245.1_ASM6924v1_genomic.fna",
    "calcoaceticus": "GCA_900444805.1_58932_B01_genomic.fna",
}
FIXTURE_DIR = REPO / "tests" / "test_assemblies"

# 80 bp Salmonella probe pinned to 60/60 k-mer hits
# (reference: tests/test_probabilistic_filter_model.py:76-93,137-161).
SALMONELLA_PROBE = (
    "AGAGATTACGTCTGGTTGCAAGAGATCATGACAGGGGGAATTGGTTGAAAATAAATATATCGCC"
    "AGCAGCACATGAACAA"
)

# 421 bp Oxf_cpn60 Allele_ID_4 prefix pinned to 401 k-mer hits
# (reference: tests/test_probabilistic_filter_mlst_model.py:82-99).
CPN60_ALLELE_4 = (
    "ATGAACCCAATGGATTTAAAACGCGGTATCGACATTGCAGTAAAAACTGTAGTTGAAAAT"
    "ATCCGTTCTATTGCTAAACCAGCTGATGATTTCAAAGCAATTGAACAAGTAGGTTCAATC"
    "TCTGCTAACTCTGATACTACTGTTGGTAAACTTATTGCTCAAGCAATGGAAAAAGTAGGT"
    "AAAGAAGGCGTAATCACTGTAGAAGAAGGTTCTGGCTTCGAAGACGCATTAGACGTTGTA"
    "GAAGGTATGCAGTTTGACCGTGGTTATATCTCTCCGTACTTTGCAAACAAACAAGATACT"
    "TTAACTGCTGAACTTGAAAATCCGTTCATTCTTCTTGTTGATAAAAAAATCAGCAACATT"
    "CGTGAATTGATTTCTGTTTTAGAAGCAGTTGCTAAAACTGGTAAACCACTTCTTATCATC"
    "G"
)


def _missing_fixtures(*keys: str) -> list[str]:
    wanted = keys or tuple(FIXTURES)
    return [
        FIXTURES[key]
        for key in wanted
        if not (FIXTURE_DIR / FIXTURES[key]).exists()
    ]


def _require_fixtures(*keys: str) -> None:
    missing = _missing_fixtures(*keys)
    if missing:
        pytest.skip(
            "missing NCBI fixture assemblies under tests/test_assemblies/: "
            + ", ".join(missing)
            + " (download them in a networked checkout: "
            "python tools/fetch_parity_fixtures.py)"
        )


def _require_model(json_path: Path, how_to_get: str) -> None:
    if not json_path.exists():
        pytest.skip(f"model {json_path} not in registry (run: {how_to_get})")


# --------------------------------------------------------------- hash goldens


def test_hash_goldens_dump_and_verify(tmp_path):
    """Golden hash/score vectors from the reference's native libraries.

    Dumps goldens with whichever of xxhash / rbloom / cobs_index import,
    then verifies this framework against them (tools/make_hash_goldens.py).
    """
    libs = ["xxhash", "rbloom", "cobs_index"]
    present = [m for m in libs if importlib.util.find_spec(m) is not None]
    if not present:
        pytest.skip(
            "none of the reference's native libraries are importable: "
            "pip install xxhash rbloom cobs-index-reloaded "
            "(any subset activates its goldens section)"
        )
    tool = REPO / "tools" / "make_hash_goldens.py"
    goldens = tmp_path / "goldens_hash.json"
    dump = subprocess.run(
        [sys.executable, str(tool), "dump", "--out", str(goldens)],
        capture_output=True,
        text=True,
        timeout=600,
        check=False,
    )
    assert dump.returncode == 0, f"goldens dump failed:\n{dump.stderr}"
    sections = json.loads(goldens.read_text())
    assert sections, "dump produced no goldens despite importable libraries"
    verify = subprocess.run(
        [sys.executable, str(tool), "verify", "--in", str(goldens)],
        capture_output=True,
        text=True,
        timeout=600,
        check=False,
    )
    assert verify.returncode == 0, (
        f"hash-parity verification failed "
        f"(sections from {present}):\n{verify.stdout}\n{verify.stderr}"
    )


# ------------------------------------------------- fixture-trained score pins


@pytest.fixture(scope="module")
def fixture_species_model(tmp_path_factory):
    """A 3-class species model trained on the reference fixture assemblies

    exactly like the reference's ``trained_filter_model`` fixture
    (reference: tests/test_probabilistic_filter_model.py:24-41)."""
    _require_fixtures("salmonella", "baumannii_acicu", "baumannii_aye")
    from xspect2_tpu.models.filter_model import ProbabilisticFilterModel

    root = tmp_path_factory.mktemp("oracle_models")
    training = root / "training"
    training.mkdir()
    for key in ("salmonella", "baumannii_acicu", "baumannii_aye"):
        src = FIXTURE_DIR / FIXTURES[key]
        (training / src.name).symlink_to(src)
    model = ProbabilisticFilterModel(
        k=21,
        model_display_name="oracle-filter",
        author=None,
        author_email=None,
        model_type="Species",
        base_path=root,
    )
    model.fit(training)
    return model


def test_salmonella_probe_total_hits(fixture_species_model):
    """The 80 bp probe hits all 60 k-mers in Salmonella and none elsewhere

    (reference pins: tests/test_probabilistic_filter_model.py:76-93)."""
    from xspect2_tpu.io.fasta import SeqRecord

    res = fixture_species_model.predict(SeqRecord(SALMONELLA_PROBE, "test"))
    assert res.get_total_hits() == {
        "GCF_000006945": 60,
        "GCF_000069245": 0,
        "GCF_000018445": 0,
    }
    assert res.get_scores()["total"] == {
        "GCF_000006945": 1.0,
        "GCF_000069245": 0.0,
        "GCF_000018445": 0.0,
    }


def test_salmonella_probe_hits_scale_with_step(fixture_species_model):
    """Sparse sampling: hits == 60/step for steps 1..4

    (reference pins: tests/test_probabilistic_filter_model.py:149-161)."""
    for step in range(1, 5):
        hits = fixture_species_model.calculate_hits(SALMONELLA_PROBE, step=step)
        assert hits == {
            "GCF_000006945": 60 / step,
            "GCF_000069245": 0,
            "GCF_000018445": 0,
        }, f"step={step}"


@pytest.mark.parametrize(
    ["fixture_key", "expected_totals"],
    [
        (
            "baumannii_aye",
            {"GCF_000006945": 0.01, "GCF_000018445": 0.63, "GCF_000069245": 1.0},
        ),
        (
            "baumannii_acicu",
            {"GCF_000006945": 0.01, "GCF_000018445": 1.0, "GCF_000069245": 0.64},
        ),
        (
            "salmonella",
            {"GCF_000006945": 1.0, "GCF_000018445": 0.0, "GCF_000069245": 0.0},
        ),
    ],
)
def test_whole_assembly_score_totals(
    fixture_species_model, fixture_key, expected_totals
):
    """Whole-assembly total scores pinned by the reference

    (reference: tests/test_probabilistic_filter_model.py:96-118)."""
    res = fixture_species_model.predict(FIXTURE_DIR / FIXTURES[fixture_key])
    assert res.get_scores()["total"] == expected_totals


# ------------------------------------------- production-model CLI-level pins


def test_production_genus_score(tmp_path):
    """Acinetobacter genus score on GCF_000069245 pinned to 0.85

    (reference: tests/test_cli.py:26-45, production model bundle)."""
    import xspect2_tpu.model_management as mm

    _require_fixtures("baumannii_aye")
    _require_model(
        mm.get_genus_model_path("Acinetobacter"), "xspect2 models download"
    )
    from xspect2_tpu.classify import classify_genus

    out = tmp_path / "classify_genus.json"
    classify_genus(
        "Acinetobacter", FIXTURE_DIR / FIXTURES["baumannii_aye"], out
    )
    result = json.loads(out.read_text())
    assert result["scores"]["total"]["Acinetobacter"] == 0.85


@pytest.mark.parametrize(
    ["fixture_key", "genus", "expected_prediction"],
    [
        ("baumannii_aye", "Acinetobacter", "470"),
        ("baumannii_acicu", "Acinetobacter", "470"),
        ("salmonella", "Salmonella", "28901"),
    ],
)
def test_production_species_prediction(
    tmp_path, fixture_key, genus, expected_prediction
):
    """Species predictions pinned to NCBI tax ids 470 / 28901

    (reference: tests/test_cli.py:48-86, production model bundle)."""
    import xspect2_tpu.model_management as mm

    _require_fixtures(fixture_key)
    _require_model(
        mm.get_species_model_path(genus), "xspect2 models download"
    )
    from xspect2_tpu.classify import classify_species

    out = tmp_path / "classify_species.json"
    classify_species(genus, FIXTURE_DIR / FIXTURES[fixture_key], out)
    result = json.loads(out.read_text())
    assert result["prediction"] == expected_prediction


def test_mlst_cpn60_allele_4_hits_401():
    """Oxf_cpn60 Allele_ID_4 probe pinned to 401 k-mer hits

    (reference: tests/test_probabilistic_filter_mlst_model.py:82-99;
    the scheme trains from live PubMLST alleles)."""
    import xspect2_tpu.model_management as mm

    schemes = mm.get_available_mlst_schemes()
    organism = next((o for o in schemes if "baumannii" in o.lower()), None)
    scheme = (
        next((s for s in schemes[organism] if "oxf" in s.lower()), None)
        if organism
        else None
    )
    if scheme is None:
        pytest.skip(
            "no A. baumannii Oxford MLST scheme in the registry "
            "(run in a networked checkout: xspect2 models train mlst)"
        )
    from xspect2_tpu.io.fasta import SeqRecord
    from xspect2_tpu.models.mlst_model import ProbabilisticFilterMlstSchemeModel

    model = ProbabilisticFilterMlstSchemeModel.load(
        mm.get_mlst_model_path(organism, scheme)
    )
    res = model.predict(SeqRecord(CPN60_ALLELE_4, "test"))
    strain = res.hits["test"][0]["Strain type"]
    assert strain["Oxf_cpn60"].get("Allele_ID_4") == 401


def test_rbloom_membership_parity_with_compat_filter(tmp_path):
    """Self-activating rbloom CONTRACT oracle for the xxh3 compat family.

    Builds the reference's exact genus filter — ``rbloom.Bloom(n, fpr,
    hash_func=xxh3_64_intdigest)`` over canonical k-mer strings
    (reference: src/xspect/models/probabilistic_single_filter_model.py:82-96)
    — next to our ``XXH3BloomFilter`` at the same (n, fpr).  What this
    establishes (and all it can establish while rbloom's in-Rust
    digest→bit mapping differs from ``derive_probe_positions``): the
    shared membership CONTRACT — zero false negatives on both sides,
    false-positive rates within the fpr budget, and the two FP counts
    statistically consistent with the same (n, fpr) design point.  It
    is not a bit-level filter oracle; that requires the real bit
    mapping (PARITY.md, `tools/make_hash_goldens.py`).
    """
    for mod in ("rbloom", "xxhash"):
        if importlib.util.find_spec(mod) is None:
            pytest.skip(f"{mod} not importable (run: pip install rbloom xxhash)")
    import random

    from rbloom import Bloom
    from xxhash import xxh3_64_intdigest

    from xspect2_tpu.core import compat, dna

    k = 21
    rng = random.Random(17)
    genome = "".join(rng.choice("ACGT") for _ in range(50_000))
    probe = "".join(rng.choice("ACGT") for _ in range(50_000))
    n_items = len(genome) - k + 1

    comp = str.maketrans("ACGT", "TGCA")

    def canon(seq):
        for i in range(len(seq) - k + 1):
            kmer = seq[i : i + k]
            yield min(kmer, kmer.translate(comp)[::-1])

    ref = Bloom(n_items, 0.01, hash_func=xxh3_64_intdigest)
    for kmer in canon(genome):
        ref.add(kmer)

    ours = compat.XXH3BloomFilter.for_items(n_items, 0.01, k)
    ours.insert_sequence(genome)

    # no false negatives on either side
    assert all(kmer in ref for kmer in canon(genome))
    hi, lo, valid = dna.canonical_kmers(dna.encode(genome), k)
    assert ours.count_hits_host(hi, lo, valid) == int(valid.sum())

    # false-positive noise within the fpr budget on both sides
    ref_fp = sum(1 for kmer in canon(probe) if kmer in ref)
    hi2, lo2, valid2 = dna.canonical_kmers(dna.encode(probe), k)
    our_fp = ours.count_hits_host(hi2, lo2, valid2)
    n_probe = int(valid2.sum())
    assert ref_fp / n_probe < 0.03
    assert our_fp / n_probe < 0.03
    # same (n, fpr) design point ⇒ the two FP counts must agree within
    # binomial noise: |p1 - p2| < 6 * sigma of a p≈0.01 binomial on
    # n_probe trials (a different geometry or a broken hash family
    # shows up as an order-of-magnitude FPR gap, which this catches)
    sigma = (2 * 0.01 * 0.99 / n_probe) ** 0.5
    assert abs(ref_fp - our_fp) / n_probe < 6 * sigma
