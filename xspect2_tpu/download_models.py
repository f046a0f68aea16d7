"""Pre-trained model downloader.

The reference fetches a zip of pre-trained models (Acinetobacter +
Salmonella + Oxford MLST) from a public URL
(reference: src/xspect/download_models.py:11-44).  Those artifacts are
COBS/rbloom binaries this framework does not consume; instead this
module downloads the same *training inputs* path is not available
offline, so by default it points at the same public zip for metadata
and instructs users to retrain via ``xspect2 models train``.  When a
framework-native model bundle URL is configured (env
``XSPECT_MODEL_BUNDLE_URL``), it is downloaded and unpacked directly.
"""

import os
from pathlib import Path

from xspect2_tpu.definitions import get_xspect_model_path
from xspect2_tpu.file_io import extract_zip


def download_test_models(url: str | None = None) -> None:
    """Download and unpack a framework-native model bundle.

    Raises a clear error when no bundle URL is configured: the
    reference's public bundle contains COBS/rbloom binaries that are not
    loadable by this framework — models are trained locally instead
    (``xspect2 models train directory/ncbi/mlst``).
    """
    url = url or os.environ.get("XSPECT_MODEL_BUNDLE_URL")
    if not url:
        raise RuntimeError(
            "No XspecT2-TPU model bundle URL configured. Set "
            "XSPECT_MODEL_BUNDLE_URL to a zip of framework-native models, or "
            "train models locally with 'xspect2 models train directory' "
            "(local FASTA data), 'xspect2 models train ncbi' (NCBI), or "
            "'xspect2 models train mlst' (PubMLST)."
        )

    import requests

    model_path = get_xspect_model_path()
    zip_path = model_path / "models.zip"
    response = requests.get(url, stream=True, timeout=30)
    response.raise_for_status()
    with open(zip_path, "wb") as f:
        for chunk in response.iter_content(chunk_size=1 << 20):
            f.write(chunk)
    extract_zip(zip_path, model_path)
    zip_path.unlink()
