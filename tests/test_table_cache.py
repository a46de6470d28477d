"""Disk cache for four-step operator matrices (ops/table_cache.py)."""

import numpy as np

from concrete_ntt_tpu.ops import table_cache


def test_cache_roundtrip_and_corruption(tmp_path, monkeypatch):
    monkeypatch.setenv("CONCRETE_NTT_TPU_CACHE_DIR", str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return {
            k: np.arange(4, dtype=np.uint64).reshape(2, 2)
            for k in ("A", "F", "d", "G", "e", "Ainv")
        }

    a = table_cache.cached_operators(64, 12289, build)
    b = table_cache.cached_operators(64, 12289, build)
    assert len(calls) == 1  # second call served from disk
    np.testing.assert_array_equal(a["A"], b["A"])
    assert b["A"].dtype == np.uint64

    # corrupt the cached file: loader must rebuild instead of crashing
    files = list(tmp_path.glob("fourstep_*_64_12289.npz"))
    assert len(files) == 1
    files[0].write_bytes(b"garbage")
    c = table_cache.cached_operators(64, 12289, build)
    assert len(calls) == 2
    np.testing.assert_array_equal(a["F"], c["F"])


def test_cache_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("CONCRETE_NTT_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("CONCRETE_NTT_TPU_NO_TABLE_CACHE", "1")
    calls = []

    def build():
        calls.append(1)
        return {
            k: np.zeros((1, 1), dtype=np.uint64)
            for k in ("A", "F", "d", "G", "e", "Ainv")
        }

    table_cache.cached_operators(32, 97, build)
    table_cache.cached_operators(32, 97, build)
    assert len(calls) == 2 and not list(tmp_path.iterdir())
