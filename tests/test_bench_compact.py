"""The bench's self-defending compact summary line.

The round driver keeps only the last ~2000 chars of stdout and parses
the LAST line; these tests pin the contract that keeps the artifact
self-defending: every emission parses, never exceeds 1900 chars (even
with every section populated), carries all configs + the designed-out
rows, and marks partial emissions.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _full_state():
    configs = [
        {"config": "species-8class-headline", "value": 1631441, "unit": "reads/s", "vs_baseline": 76.6},
        {"config": "species-40class-reference-scale", "value": 569602, "unit": "reads/s", "vs_baseline": 53.8},
        {"config": "genus-1class-filter", "value": 1622520, "unit": "reads/s", "vs_baseline": 80.6},
        {"config": "mlst-7locus", "value": 19.8, "unit": "genomes/s", "vs_baseline": 19.8},
        {"config": "read-accuracy-noisy", "value": 0.676, "unit": "accuracy", "vs_baseline": None},
        {"config": "pangenome-256class-2gb", "value": 1124808, "unit": "reads/s (projected v5e-32, blk8 x dp4)", "vs_baseline": 144.4},
    ]
    headline_details = {
        "e2e_vs_device": 0.56,
        "wire_mbps": 34.3,
        "vs_ref_layout_baseline": 112.4,
        "vs_packed_layout_baseline": 76.6,
        "vs_reference_style_path": 877.6,
    }
    details = {
        "species_headline": headline_details,
        "species_40class_reference_scale": {
            "e2e_vs_device": 0.61,
            "wire_mbps": 33.4,
            "vs_ref_layout_baseline": 53.8,
            "sparse_step_rows": [
                {"step": 2, "device_reads_per_s": 1100000, "argmax_accuracy": 1.0, "accuracy_delta_vs_step1": 0.0},
                {"step": 4, "device_reads_per_s": 2100000, "argmax_accuracy": 0.9998, "accuracy_delta_vs_step1": -0.0002},
            ],
        },
        "genus_filter": {"e2e_vs_device": 0.31, "wire_mbps": 13.2, "vs_ref_layout_baseline": 80.6},
        "species40_2chip": {
            "projected_2chip_reads_per_s": 900000,
            "projected_2chip_vs_ref_layout": 85.0,
            "projected_4chip_reads_per_s": 1500000,
            "projected_4chip_vs_ref_layout": 141.7,
        },
        "read_accuracy": {
            "num_reads": 1_000_000,
            "error_model": "sub 0.1% + indel 0.01%/base (seeded)",
            "stats": {
                "accuracy": 0.676,
                "selective_accuracy": 0.9944,
                "coverage": 0.6798,
                "rejection_recall": 0.9882,
            },
        },
        "mlst": {},
        "pangenome": {},
    }
    scaling = {
        "scaling_efficiency_2proc": 0.927,
        "scaling_efficiency_vs_control": 0.95,
        "spmd_8dev_overhead_ratio": 0.994,
        "scaling_retry_discarded": [{"scaling_efficiency_2proc": 0.7}],
    }
    return {
        "configs": configs,
        "details": details,
        "scaling": scaling,
        "headline": configs[0],
        "headline_details": headline_details,
    }


def test_compact_line_full_state_fits_and_carries_everything():
    line = bench.build_compact_line(_full_state())
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["value"] == 1631441 and d["vs_baseline"] == 76.6
    s = d["summary"]
    assert len(s["configs"]) == 6
    assert s["spmd_8dev_overhead_ratio"] == 0.994
    assert s["bad_window_retry"] is True
    outs = s["species40_outs"]
    assert [r["step"] for r in outs["sparse_steps"]] == [2, 4]
    assert outs["2chip_blk2"]["vs_ref"] == 85.0
    assert outs["4chip_blk4"]["rps"] == 1500000
    assert s["read_accuracy"]["ref_published"]["acc"] == 0.7255
    assert s["headline_ratios"]["vs_ref_layout"] == 112.4
    assert "partial" not in d


def test_compact_line_partial_and_empty_states():
    state = _full_state()
    line = bench.build_compact_line(state, partial=True)
    d = json.loads(line)
    assert d["partial"] is True and "elapsed_s" in d
    assert len(line) <= 1900

    empty = {
        "configs": [],
        "details": {},
        "scaling": {},
        "headline": {},
        "headline_details": {},
    }
    d = json.loads(bench.build_compact_line(empty, partial=True))
    assert d["value"] == 0 and d["summary"]["configs"] == []


def test_compact_line_skipped_and_error_rows_survive():
    state = _full_state()
    state["configs"].append({"config": "pangenome-256class-2gb", "skipped": "budget: 90s left < 220s est"})
    state["configs"].append({"config": "mlst-7locus", "error": "attempt 1: timeout after 400s"})
    d = json.loads(bench.build_compact_line(state))
    kinds = [tuple(sorted(c)) for c in d["summary"]["configs"][-2:]]
    assert ("config", "skipped") in kinds and ("config", "error") in kinds
