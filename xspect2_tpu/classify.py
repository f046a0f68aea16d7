"""Classification facades: genus, species, MLST.

Same observable contract as the reference module (reference:
src/xspect/classify.py): resolve the model by slug/metadata, fan out
over the input (file or directory), write one result JSON per input.
Structured here as one shared driver parameterized by (model loader,
predict kwargs) — models are device-resident LRU-cached entries
(xspect2_tpu.model_cache), not reloaded per call.
"""

from pathlib import Path

import xspect2_tpu.model_management as mm
from xspect2_tpu.file_io import prepare_input_output_paths
from xspect2_tpu.model_cache import load_cached


def _classify_inputs(model_cls, model_path: Path, input_path: Path,
                     output_path: Path, **predict_kwargs):
    """Fan a file-or-directory input through one cached model."""
    model = load_cached(model_cls, model_path)
    input_paths, get_output_path = prepare_input_output_paths(input_path)
    for idx, current_path in enumerate(input_paths):
        result = model.predict(current_path, **predict_kwargs)
        result.input_source = current_path.name
        cls_path = get_output_path(idx, output_path)
        result.save(cls_path)
        print(f"Saved result as {cls_path.name}")


def classify_genus(
    model_genus: str, input_path: Path, output_path: Path, step: int = 1
):
    """Classify input files using the genus (single-filter) model."""
    from xspect2_tpu.models.single_filter_model import ProbabilisticSingleFilterModel

    _classify_inputs(
        ProbabilisticSingleFilterModel,
        mm.get_genus_model_path(model_genus),
        input_path,
        output_path,
        step=step,
    )


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

    _classify_inputs(
        ModelClass,
        mm.get_species_model_path(model_genus),
        input_path,
        output_path,
        exclude_ids=exclude_ids,
        step=step,
        display_name=display_name,
        validation=validation,
    )


def classify_mlst(
    input_path: Path, organism, mlst_scheme, output_path: Path, limit: bool
):
    """Classify the strain type using the specified MLST model."""
    from xspect2_tpu.models.mlst_model import ProbabilisticFilterMlstSchemeModel

    _classify_inputs(
        ProbabilisticFilterMlstSchemeModel,
        mm.get_mlst_model_path(organism, mlst_scheme),
        input_path,
        output_path,
        step=1,
        limit=limit,
    )
