"""Classification facades: genus, species, MLST.

Mirror the reference module (reference: src/xspect/classify.py): load the
right model class by slug and metadata, iterate input files (file or
directory), write one result JSON per input.
"""

from pathlib import Path

import xspect2_tpu.model_management as mm
from xspect2_tpu.file_io import prepare_input_output_paths
from xspect2_tpu.model_cache import load_cached


def classify_genus(
    model_genus: str, input_path: Path, output_path: Path, step: int = 1
):
    """Classify input files using the genus (single-filter) model."""
    from xspect2_tpu.models.single_filter_model import ProbabilisticSingleFilterModel

    model_path = mm.get_genus_model_path(model_genus)
    model = load_cached(ProbabilisticSingleFilterModel, model_path)
    input_paths, get_output_path = prepare_input_output_paths(input_path)

    for idx, current_path in enumerate(input_paths):
        result = model.predict(current_path, step=step)
        result.input_source = current_path.name
        cls_path = get_output_path(idx, output_path)
        result.save(cls_path)
        print(f"Saved result as {cls_path.name}")


def classify_species(
    model_genus: str,
    input_path: Path,
    output_path: Path,
    step: int = 1,
    display_name: bool = False,
    validation: bool = False,
    exclude_ids: list[str] | None = None,
):
    """Classify input files using the species model (SVM or plain)."""
    if mm.is_svm_model(f"{model_genus}-species"):
        from xspect2_tpu.models.svm_model import ProbabilisticFilterSVMModel as ModelClass
    else:
        from xspect2_tpu.models.filter_model import ProbabilisticFilterModel as ModelClass

    model_path = mm.get_species_model_path(model_genus)
    model = load_cached(ModelClass, model_path)
    input_paths, get_output_path = prepare_input_output_paths(input_path)

    for idx, current_path in enumerate(input_paths):
        result = model.predict(
            current_path,
            exclude_ids=exclude_ids,
            step=step,
            display_name=display_name,
            validation=validation,
        )
        result.input_source = current_path.name
        cls_path = get_output_path(idx, output_path)
        result.save(cls_path)
        print(f"Saved result as {cls_path.name}")


def classify_mlst(
    input_path: Path, organism, mlst_scheme, output_path: Path, limit: bool
):
    """Classify the strain type using the specified MLST model."""
    from xspect2_tpu.models.mlst_model import ProbabilisticFilterMlstSchemeModel

    scheme_path = mm.get_mlst_model_path(organism, mlst_scheme)
    model = load_cached(ProbabilisticFilterMlstSchemeModel, scheme_path)
    input_paths, get_output_path = prepare_input_output_paths(input_path)
    for idx, current_path in enumerate(input_paths):
        result = model.predict(current_path, step=1, limit=limit)
        result.input_source = current_path.name
        cls_path = get_output_path(idx, output_path)
        result.save(cls_path)
        print(f"Saved result as {cls_path.name}")
