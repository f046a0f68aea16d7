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
    max_retries: int = 3,
    retry_delay: float = 5.0,
) -> dict[str, str]:
    """Train one species+genus model per genus.

    With ``from_ncbi`` the data is fetched from NCBI per genus; otherwise
    ``data_root/<genus>/`` must hold the ``cobs/``(+``svm/``) layout of
    ``train_from_directory``.  Each genus is attempted up to
    ``max_retries`` times before being recorded as failed — the role of
    the reference's Nextflow per-process ``errorStrategy 'retry';
    maxRetries 3`` (reference: scripts/benchmark/main.nf:223-224).
    Returns {genus: "ok" | error message}.
    """
    import time

    from xspect2_tpu import train

    def train_one(genus: str) -> None:
        if from_ncbi:
            train.train_from_ncbi(
                genus, svm_step=svm_step, author=author, author_email=author_email
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

    results: dict[str, str] = {}
    max_retries = max(1, max_retries)  # 0 would silently skip every genus
    for genus in genera:
        last_error: Exception | None = None
        for attempt in range(max_retries):
            if attempt:
                logger.warning(
                    "retrying %s (attempt %d/%d) in %.0fs after: %s",
                    genus, attempt + 1, max_retries, retry_delay, last_error,
                )
                time.sleep(retry_delay)
            try:
                train_one(genus)
                results[genus] = "ok"
                last_error = None
                break
            except Exception as exc:  # noqa: BLE001
                logger.error("training %s failed: %s", genus, exc)
                last_error = exc
        if last_error is not None:
            results[genus] = str(last_error)
            if not continue_on_error:
                raise last_error
    return results
