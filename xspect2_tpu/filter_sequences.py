"""Sequence filtering by genus/species score thresholds.

Mirrors the reference module (reference: src/xspect/filter_sequences.py):
classify per record, threshold scores (or argmax with threshold=-1),
write the passing records to a new FASTA.
"""

from pathlib import Path

from xspect2_tpu.file_io import filter_sequences, prepare_input_output_paths
from xspect2_tpu.model_management import get_genus_model_path, get_species_model_path


def filter_species(
    model_genus: str,
    model_species: str,
    input_path: Path,
    output_path: Path,
    threshold: float,
    classification_output_path: Path | None = None,
    sparse_sampling_step: int = 1,
):
    """Filter sequences whose species score passes the threshold (or argmax)."""
    from xspect2_tpu.models.svm_model import ProbabilisticFilterSVMModel

    species_model = ProbabilisticFilterSVMModel.load(
        get_species_model_path(model_genus)
    )
    input_paths, get_output_path = prepare_input_output_paths(input_path)

    for idx, current_path in enumerate(input_paths):
        result = species_model.predict(current_path, step=sparse_sampling_step)
        result.input_source = current_path.name

        if classification_output_path:
            cls_out = get_output_path(idx, classification_output_path)
            result.save(cls_out)
            print(
                f"Saved classification results from {current_path.name} as {cls_out.name}"
            )

        included_ids = result.get_filtered_subsequence_labels(model_species, threshold)
        if not included_ids:
            print(f"No sequences found for the given species in {current_path.name}.")
            continue

        filter_output_path = get_output_path(idx, output_path)
        filter_sequences(current_path, filter_output_path, included_ids)
        print(
            f"Saved filtered sequences from {current_path.name} as {filter_output_path.name}"
        )


def filter_genus(
    model_genus: str,
    input_path: Path,
    output_path: Path,
    threshold: float,
    classification_output_path: Path | None = None,
    sparse_sampling_step: int = 1,
):
    """Filter sequences whose genus score passes the threshold."""
    from xspect2_tpu.models.single_filter_model import ProbabilisticSingleFilterModel

    genus_model = ProbabilisticSingleFilterModel.load(
        get_genus_model_path(model_genus)
    )
    input_paths, get_output_path = prepare_input_output_paths(input_path)

    for idx, current_path in enumerate(input_paths):
        result = genus_model.predict(current_path, step=sparse_sampling_step)
        result.input_source = current_path.name

        if classification_output_path:
            cls_out = get_output_path(idx, classification_output_path)
            result.save(cls_out)
            print(
                f"Saved classification results from {current_path.name} as {cls_out.name}"
            )

        included_ids = result.get_filtered_subsequence_labels(model_genus, threshold)
        if not included_ids:
            print(f"No sequences found for the given genus in {current_path.name}.")
            continue

        filter_output_path = get_output_path(idx, output_path)
        filter_sequences(current_path, filter_output_path, included_ids)
        print(
            f"Saved filtered sequences from {current_path.name} as {filter_output_path.name}"
        )
