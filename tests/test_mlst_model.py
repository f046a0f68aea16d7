"""MLST model tests with a synthetic PubMLST-style scheme.

Structural analogues of the reference's MLST tests (reference:
tests/test_probabilistic_filter_mlst_model.py): per-locus allele
indices, exact probe scores (len - k + 1 hits for a full allele),
sequence splitting, sufficiency rule.
"""

from pathlib import Path

import numpy as np
import pytest

from xspect2_tpu.io.fasta import SeqRecord, write_fasta
from xspect2_tpu.models.mlst_model import ProbabilisticFilterMlstSchemeModel
from tests.conftest import random_dna

K = 31
ALLELE_LEN = 450


@pytest.fixture()
def scheme_dir(tmp_path, rng):
    """Two loci x four alleles, written as Allele_ID_<n>.fasta files."""
    scheme = tmp_path / "scheme"
    alleles = {}
    for locus in ("Oxf_cpn60", "Oxf_gltA"):
        locus_dir = scheme / locus
        locus_dir.mkdir(parents=True)
        base = random_dna(rng, ALLELE_LEN)
        for n in range(1, 5):
            # alleles are point-mutation variants of the same base
            variant = list(base)
            for _ in range(n * 3):
                pos = int(rng.integers(0, ALLELE_LEN))
                variant[pos] = "ACGT"[int(rng.integers(0, 4))]
            seq = "".join(variant)
            alleles[(locus, n)] = seq
            write_fasta(
                [SeqRecord(seq, id=f"{locus}_{n}")],
                locus_dir / f"Allele_ID_{n}.fasta",
            )
    return scheme, alleles


def _make_model(tmp_path) -> ProbabilisticFilterMlstSchemeModel:
    return ProbabilisticFilterMlstSchemeModel(
        K,
        "Oxford",
        tmp_path / "models",
        "https://example.org/schemes/1",
        "abaumannii",
    )


def test_fit_and_allele_probe(tmp_path, scheme_dir):
    scheme, alleles = scheme_dir
    model = _make_model(tmp_path)
    (tmp_path / "models").mkdir(exist_ok=True)
    model.fit(scheme)

    assert list(model.loci.keys()) == ["Oxf_cpn60", "Oxf_gltA"]
    assert model.loci["Oxf_cpn60"] == 4
    assert model.avg_locus_bp_size == [ALLELE_LEN, ALLELE_LEN]

    # query allele 2 of cpn60 directly: argmax is Allele_ID_2 with the
    # full k-mer count (ALLELE_LEN - K + 1 = 420; the reference pins 401
    # hits for a 421 bp allele the same way)
    probe = alleles[("Oxf_cpn60", 2)]
    result = model.calculate_hits(probe)
    strain = result[0]["Strain type"]
    assert strain["Oxf_cpn60"] == {"Allele_ID_2": ALLELE_LEN - K + 1}
    # short sequence, no N/A, sufficiency met for cpn60
    assert "Attention:" not in strain
    all_results = result[1]["All results"]
    assert all_results["Oxf_cpn60"]["Allele_ID_2"] == ALLELE_LEN - K + 1


def test_long_sequence_split_path(tmp_path, scheme_dir, rng):
    scheme, alleles = scheme_dir
    model = _make_model(tmp_path)
    model.fit(scheme)

    # a 20 kb "genome" containing allele 3 of each locus
    genome = (
        random_dna(rng, 9000)
        + alleles[("Oxf_cpn60", 3)]
        + random_dna(rng, 5000)
        + alleles[("Oxf_gltA", 3)]
        + random_dna(rng, 5000)
    )
    assert len(genome) >= 10000
    result = model.calculate_hits(genome)
    strain = result[0]["Strain type"]
    assert next(iter(strain["Oxf_cpn60"])) == "Allele_ID_3"
    assert next(iter(strain["Oxf_gltA"])) == "Allele_ID_3"
    # chunks holding the allele have well over threshold hits; the total
    # must be >= a chunk-boundary-split lower bound
    assert strain["Oxf_cpn60"]["Allele_ID_3"] > 0.5 * (ALLELE_LEN - K + 1)


def test_sequence_splitter_counts(tmp_path, scheme_dir):
    scheme, _ = scheme_dir
    model = _make_model(tmp_path)
    seq = "A" * 25000
    parts = model.sequence_splitter(seq, 450)
    # chunks overlap by k-1 and cover the sequence
    assert all(len(p) >= K for p in parts)
    stitched_len = sum(len(p) for p in parts) - (len(parts) - 1) * (K - 1)
    assert stitched_len == len(seq)
    # ~ len / (450 - 30) chunks
    assert len(parts) == int(np.ceil((25000 - K + 1) / (450 - K + 1)))


def test_has_sufficient_score(tmp_path, scheme_dir):
    scheme, _ = scheme_dir
    model = _make_model(tmp_path)
    sizes = [450, 450]
    assert model.has_sufficient_score(
        {"a": {"Allele_ID_1": 300}, "b": {"Allele_ID_2": 10}}, sizes
    )
    assert not model.has_sufficient_score(
        {"a": {"Allele_ID_1": 100}, "b": {"Allele_ID_2": 10}}, sizes
    )
    assert not model.has_sufficient_score({"a": {}, "b": {}}, sizes)


def test_save_load_and_predict(tmp_path, scheme_dir):
    scheme, alleles = scheme_dir
    model = _make_model(tmp_path)
    model.fit(scheme)
    model.save()

    loaded = ProbabilisticFilterMlstSchemeModel.load(
        tmp_path / "models" / "abaumannii-oxford-mlst.json"
    )
    assert loaded.loci == model.loci

    rec = SeqRecord(alleles[("Oxf_gltA", 1)], id="<unknown id>")
    result = loaded.predict(rec)
    d = result.to_dict()
    assert d["Scheme"] == "Oxford"
    assert "test" in d["Results"]  # "<unknown id>" renamed to "test"
    strain = d["Results"]["test"][0]["Strain type"]
    assert next(iter(strain["Oxf_gltA"])) == "Allele_ID_1"


def test_loci_share_one_prepared_batch(tmp_path, scheme_dir, rng):
    """Loci with identical chunk geometry reuse ONE prepared batch, and
    its packed device wire is transferred once (PreparedBatch._device_wire
    cache): the per-locus host->device transfer dominated multi-locus
    typing on high-latency links."""
    scheme, _ = scheme_dir
    model = _make_model(tmp_path)
    model.base_path.mkdir(parents=True, exist_ok=True)
    model.fit(scheme)

    genome = random_dna(rng, 30_000)  # >= split threshold
    dispatched = model._dispatch_loci(genome, step=1)
    assert len(dispatched) == 2
    # equal avg allele lengths + equal engine chunks => one shared batch
    sizes = set(model.avg_locus_bp_size)
    chunks = {e.chunk for e in model.engines}
    assert len(sizes) == 1 and len(chunks) == 1
    # direct check: prepare one batch, query it through both engines and
    # confirm the device wire is computed once
    from xspect2_tpu.core import dna as dna_mod
    from xspect2_tpu.ops import query as q

    pieces = model.sequence_splitter(genome, model.avg_locus_bp_size[0])
    records = [(f"p{i}", dna_mod.encode(p)) for i, p in enumerate(pieces)]
    batch = q.prepare_batch(records, model.k, step=1, chunk=model.engines[0].chunk)
    assert batch._device_wire == {}
    out0 = model.engines[0].count_hits(batch, block=False)
    assert len(batch._device_wire) == 1
    wire_before = next(iter(batch._device_wire.values()))
    out1 = model.engines[1].count_hits(batch, block=False)
    assert next(iter(batch._device_wire.values())) is wire_before
    # and the shared-wire results equal fresh-batch results exactly
    fresh = q.prepare_batch(records, model.k, step=1, chunk=model.engines[1].chunk)
    ref = model.engines[1].count_hits(fresh, block=True)
    np.testing.assert_array_equal(
        np.asarray(out1)[: batch.num_records].astype(np.int64), ref
    )


def test_device_reduction_matches_host_reduction(tmp_path, scheme_dir, rng):
    """The fused program's on-device chunk-score reduction is exactly the
    host rule it replaced: zero per-piece counts <= threshold, sum over
    pieces (split path) / raw first-record counts (short path)."""
    from xspect2_tpu.models import mlst_model as mm

    scheme, _ = scheme_dir
    model = _make_model(tmp_path)
    model.base_path.mkdir(parents=True, exist_ok=True)
    model.fit(scheme)

    genome = random_dna(rng, 30_000)  # split path
    dispatched = model._dispatch_loci(genome, step=1)
    reduced = model._fetch_counts(dispatched)
    for li, totals in enumerate(reduced):
        assert totals.ndim == 1  # device-reduced [C]
        # raw per-piece counts via the engine path, reduced on host
        pieces = model.sequence_splitter(genome, model.avg_locus_bp_size[li])
        from xspect2_tpu.core import dna as dna_mod
        from xspect2_tpu.ops import query as q

        records = [(f"p{i}", dna_mod.encode(p)) for i, p in enumerate(pieces)]
        batch = q.prepare_batch(
            records, model.k, step=1, chunk=model.engines[li].chunk
        )
        raw = model.engines[li].count_hits(batch)  # [pieces, C] int64
        want = np.where(raw > mm.CHUNK_SCORE_THRESHOLD, raw, 0).sum(axis=0)
        np.testing.assert_array_equal(totals, want)

    short = random_dna(rng, 900)  # single-piece path: raw row 0
    dispatched = model._dispatch_loci(short, step=1)
    reduced = model._fetch_counts(dispatched)
    for li, row in enumerate(reduced):
        assert row.ndim == 1
        from xspect2_tpu.core import dna as dna_mod
        from xspect2_tpu.ops import query as q

        batch = q.prepare_batch(
            [("p0", dna_mod.encode(short))],
            model.k,
            step=1,
            chunk=model.engines[li].chunk,
        )
        raw = model.engines[li].count_hits(batch)
        np.testing.assert_array_equal(row, raw[0])


def _strip_st_name(hits: dict) -> dict:
    """Drop the network-resolved ST_Name (offline fallback text varies)."""
    out = {}
    for rid, payload in hits.items():
        strain = dict(payload[0]["Strain type"])
        strain.pop("ST_Name", None)
        out[rid] = [{"Strain type": strain}, payload[1]]
    return out


def test_grouped_predict_matches_per_genome_path(tmp_path, scheme_dir, rng):
    """Multi-genome fused dispatch == the per-genome round-4 path, exactly.

    predict(batch_genomes=3) routes B genomes' chunks through ONE
    device program per locus group with an on-device per-genome segment
    reduction; every score must equal the per-genome calculate_hits
    path (which dispatches one fused program per genome).  Mixed-length
    input exercises the split-status flush: >=10 kb genomes chunk with
    the score>50 rule, short ones report raw counts.
    """
    scheme, alleles = scheme_dir
    model = _make_model(tmp_path)
    model.base_path.mkdir(parents=True, exist_ok=True)
    model.fit(scheme)

    records = []
    for g in range(3):  # long genomes with one known allele per locus
        seq = random_dna(rng, 25_000)
        pos = 2_000
        for locus in ("Oxf_cpn60", "Oxf_gltA"):
            a = int(rng.integers(1, 5))
            seq = seq[:pos] + alleles[(locus, a)] + seq[pos + ALLELE_LEN :]
            pos += 8_000
        records.append(SeqRecord(seq, id=f"long{g}"))
    for g in range(2):  # short inputs: raw-count path
        records.append(SeqRecord(random_dna(rng, 900), id=f"short{g}"))

    grouped = model.predict(iter(records), batch_genomes=3)
    assert set(grouped.hits) == {r.id for r in records}

    per_genome = {
        r.id: model.calculate_hits(r.seq, step=1) for r in records
    }
    assert _strip_st_name(grouped.hits) == _strip_st_name(per_genome)

    # batch_genomes=1 through the same grouped machinery is also exact
    single = model.predict(iter(records), batch_genomes=1)
    assert _strip_st_name(single.hits) == _strip_st_name(per_genome)
