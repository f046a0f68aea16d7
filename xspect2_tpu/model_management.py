"""Model registry: slug-based path resolution and metadata management.

Mirrors the reference's module of the same name
(reference: src/xspect/model_management.py): models live as
``<slug>.json`` metadata files plus ``<slug>/`` artifact directories
under the models path.
"""

from json import dumps, loads
from pathlib import Path

from xspect2_tpu.definitions import get_xspect_model_path, slugify


def get_genus_model_path(genus) -> Path:
    return get_xspect_model_path() / (slugify(genus) + "-genus.json")


def get_species_model_path(genus) -> Path:
    return get_xspect_model_path() / (slugify(genus) + "-species.json")


def get_mlst_model_path(organism: str, scheme: str) -> Path:
    return get_xspect_model_path() / (
        slugify(organism + "-" + scheme + "-mlst") + ".json"
    )


def is_svm_model(model_slug: str) -> bool:
    return get_model_metadata(model_slug).get("model_class") == (
        "ProbabilisticFilterSVMModel"
    )


def get_model_metadata(model: str | Path) -> dict:
    if isinstance(model, str):
        model_path = get_xspect_model_path() / (slugify(model) + ".json")
    elif isinstance(model, Path):
        model_path = model
    else:
        raise ValueError("Model must be a string (slug) or a Path object.")

    if not model_path.exists() or not model_path.is_file():
        raise ValueError(f"Model at {model_path} does not exist.")

    return loads(model_path.read_text(encoding="utf-8"))


def update_model_metadata(model_slug: str, author: str, author_email: str) -> None:
    model_metadata = get_model_metadata(model_slug)
    model_metadata["author"] = author
    model_metadata["author_email"] = author_email
    # slugify before path use: slugs reach this via the web API, so a
    # raw join would let "../"-style input write outside the registry
    model_path = get_xspect_model_path() / (slugify(model_slug) + ".json")
    model_path.write_text(dumps(model_metadata, indent=4), encoding="utf-8")


def update_model_display_name(
    model_slug: str, filter_id: str, display_name: str
) -> None:
    model_metadata = get_model_metadata(model_slug)
    model_metadata["display_names"][filter_id] = display_name
    model_path = get_xspect_model_path() / (slugify(model_slug) + ".json")
    model_path.write_text(dumps(model_metadata, indent=4), encoding="utf-8")


def get_models() -> dict[str, list[str]]:
    """All available models grouped by model type."""
    model_dict: dict[str, list[str]] = {}
    for model_file in get_xspect_model_path().glob("*.json"):
        model_metadata = get_model_metadata(model_file)
        model_type = model_metadata["model_type"]
        model_dict.setdefault(model_type, []).append(
            model_metadata["model_display_name"]
        )
    return model_dict


def get_model_display_names(model_slug: str) -> list[str]:
    return list(get_model_metadata(model_slug)["display_names"].values())


def get_available_mlst_schemes() -> dict[str, list[str]]:
    """Available MLST schemes grouped by organism."""
    mlst_schemes: dict[str, list[str]] = {}
    for model_file in get_xspect_model_path().glob("*-mlst.json"):
        model_metadata = get_model_metadata(model_file)
        organism = model_metadata.get("organism")
        scheme = model_metadata.get("model_display_name")
        if organism and scheme:
            mlst_schemes.setdefault(organism, []).append(scheme)
    return mlst_schemes
