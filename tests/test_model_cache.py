"""Model LRU cache: identity on repeat loads, mtime invalidation, eviction."""

import time

from xspect2_tpu import model_cache


class _FakeModel:
    loads = 0

    def __init__(self, path):
        self.path = path

    @classmethod
    def load(cls, path):
        cls.loads += 1
        return cls(path)


def _touch(path):
    # ensure a strictly newer mtime even on coarse filesystems
    now = time.time_ns()
    import os

    os.utime(path, ns=(now + 1_000_000, now + 1_000_000))


def test_repeat_load_returns_same_object(tmp_path):
    model_cache.clear()
    _FakeModel.loads = 0
    p = tmp_path / "m.json"
    p.write_text("{}")
    a = model_cache.load_cached(_FakeModel, p)
    b = model_cache.load_cached(_FakeModel, p)
    assert a is b
    assert _FakeModel.loads == 1


def test_mtime_change_invalidates(tmp_path):
    model_cache.clear()
    _FakeModel.loads = 0
    p = tmp_path / "m.json"
    p.write_text("{}")
    a = model_cache.load_cached(_FakeModel, p)
    _touch(p)
    b = model_cache.load_cached(_FakeModel, p)
    assert a is not b
    assert _FakeModel.loads == 2


def test_eviction_respects_capacity(tmp_path, monkeypatch):
    model_cache.clear()
    _FakeModel.loads = 0
    monkeypatch.setenv("XSPECT_MODEL_CACHE", "2")
    paths = []
    for i in range(3):
        p = tmp_path / f"m{i}.json"
        p.write_text("{}")
        paths.append(p)
        model_cache.load_cached(_FakeModel, p)
    assert _FakeModel.loads == 3
    # m0 was evicted (capacity 2); m2 and m1 still cached
    model_cache.load_cached(_FakeModel, paths[2])
    model_cache.load_cached(_FakeModel, paths[1])
    assert _FakeModel.loads == 3
    model_cache.load_cached(_FakeModel, paths[0])
    assert _FakeModel.loads == 4


def test_disabled_by_env(tmp_path, monkeypatch):
    model_cache.clear()
    _FakeModel.loads = 0
    monkeypatch.setenv("XSPECT_MODEL_CACHE", "0")
    p = tmp_path / "m.json"
    p.write_text("{}")
    a = model_cache.load_cached(_FakeModel, p)
    b = model_cache.load_cached(_FakeModel, p)
    assert a is not b
    assert _FakeModel.loads == 2
