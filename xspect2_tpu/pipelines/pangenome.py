"""Pangenome-scale training pipeline.

The reference trains many genus models on a Slurm cluster via Nextflow
(reference: scripts/pangenome-train/).  Here the same sweep is a plain
loop over ``train_from_directory``/``train_from_ncbi`` — heavy compute
(index construction) already runs through the native multi-threaded
builder, and classification scale-out is handled by the device engine.
"""

import logging
from pathlib import Path

logger = logging.getLogger("xspect2_tpu.pipelines.pangenome")


def train_pangenome(
    genera: list[str],
    data_root: Path | None = None,
    from_ncbi: bool = False,
    svm_step: int = 1,
    author: str | None = None,
    author_email: str | None = None,
    continue_on_error: bool = True,
) -> dict[str, str]:
    """Train one species+genus model per genus.

    With ``from_ncbi`` the data is fetched from NCBI per genus; otherwise
    ``data_root/<genus>/`` must hold the ``cobs/``(+``svm/``) layout of
    ``train_from_directory``.  Returns {genus: "ok" | error message}.
    """
    from xspect2_tpu import train

    results: dict[str, str] = {}
    for genus in genera:
        try:
            if from_ncbi:
                train.train_from_ncbi(
                    genus,
                    svm_step=svm_step,
                    author=author,
                    author_email=author_email,
                )
            else:
                train.train_from_directory(
                    genus,
                    Path(data_root) / genus,
                    meta=True,
                    svm_step=svm_step,
                    author=author,
                    author_email=author_email,
                )
            results[genus] = "ok"
        except Exception as exc:  # noqa: BLE001
            logger.error("training %s failed: %s", genus, exc)
            results[genus] = str(exc)
            if not continue_on_error:
                raise
    return results
