"""Stage-artifact cache re-entry (the reference's ``.pt`` cache protocol,
``main_unsup.py:294-311`` — every stage can be replayed from cache)."""

import numpy as np

from scd_tpu.core.cache import ArtifactCache


def test_cache_roundtrip_and_reentry(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return {"feats": np.arange(6, dtype=np.float32).reshape(2, 3),
                "mask": np.array([True, False])}

    out1 = cache.load_or_compute("features", "k1", compute)
    assert calls["n"] == 1
    out2 = cache.load_or_compute("features", "k1", compute)
    assert calls["n"] == 1  # served from cache
    np.testing.assert_array_equal(out1["feats"], out2["feats"])
    np.testing.assert_array_equal(out2["mask"], [True, False])

    # refresh forces recompute and overwrites
    cache.load_or_compute("features", "k1", compute, refresh=True)
    assert calls["n"] == 2

    # different key -> recompute; a fresh cache instance reads prior state
    cache2 = ArtifactCache(str(tmp_path))
    assert cache2.has("features", "k1")
    cache2.load_or_compute("features", "k2", compute)
    assert calls["n"] == 3
