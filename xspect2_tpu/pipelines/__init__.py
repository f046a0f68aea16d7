"""Framework-native pipelines.

The reference drives large-scale benchmarking and training with
Nextflow/Slurm process fan-out (reference: scripts/benchmark/main.nf,
scripts/pangenome-train/, scripts/score-svm/).  Here the same workflows
are first-class Python pipelines running on the framework's own batched
data-parallel engine — no workflow manager required.
"""

from xspect2_tpu.pipelines.benchmark import (
    evaluate_assembly_classifications,
    evaluate_read_classifications,
    run_assembly_benchmark,
    run_read_benchmark,
)
from xspect2_tpu.pipelines.pangenome import train_pangenome
from xspect2_tpu.pipelines.score_svm import grid_search_svm

__all__ = [
    "run_assembly_benchmark",
    "run_read_benchmark",
    "evaluate_assembly_classifications",
    "evaluate_read_classifications",
    "train_pangenome",
    "grid_search_svm",
]
