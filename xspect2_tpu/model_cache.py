"""Process-wide LRU cache of loaded models.

The reference reloads its model (and re-opens the COBS index) on every
``classify``/``filter`` call (reference: src/xspect/classify.py:43-92 —
``Model.load`` per invocation).  Here a loaded model owns a
device-resident index table (99-400 MB shipped to HBM on first query),
so reloading per web job or per facade call would pay disk parse +
device upload every time.  This cache keys on (model class, path) and
validates against the metadata file's mtime: retraining, renaming a
display name, or editing authorship rewrites ``<slug>.json`` and
invalidates the entry automatically.

Sizing: ``XSPECT_MODEL_CACHE`` (default 3 models) bounds resident
tables; 0 disables caching entirely.  Eviction drops the oldest
untouched entry; the table's device buffers free when the model object
is garbage-collected.

Concurrency: safe for the web layer's daemon threads.  Two threads
loading the same cold model may both parse it (last one wins the cache
slot) — wasteful once, never incorrect.  Cached models are shared
across threads; predict paths only append to internal memo dicts
(e.g. the SVM head's per-exclude-set fit cache), which is benign under
the GIL.
"""

import os
import threading
from collections import OrderedDict
from pathlib import Path

_LOCK = threading.Lock()
_CACHE: "OrderedDict[tuple[str, str], tuple[int, object]]" = OrderedDict()


def _capacity() -> int:
    try:
        return int(os.environ.get("XSPECT_MODEL_CACHE", "3"))
    except ValueError:
        return 3


def load_cached(model_class, path: Path):
    """``model_class.load(path)`` memoized on (class, path, file mtime)."""
    path = Path(path)
    cap = _capacity()
    if cap <= 0:
        return model_class.load(path)
    key = (model_class.__name__, str(path))
    stamp = path.stat().st_mtime_ns
    with _LOCK:
        entry = _CACHE.get(key)
        if entry is not None and entry[0] == stamp:
            _CACHE.move_to_end(key)
            return entry[1]
    model = model_class.load(path)
    with _LOCK:
        _CACHE[key] = (stamp, model)
        _CACHE.move_to_end(key)
        while len(_CACHE) > cap:
            _CACHE.popitem(last=False)
    return model


def clear() -> None:
    """Drop every cached model (tests; frees device tables via GC)."""
    with _LOCK:
        _CACHE.clear()
