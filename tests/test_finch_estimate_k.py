"""FINCH and estimate-K tests."""

import numpy as np
import pytest
from sklearn.metrics import normalized_mutual_info_score as nmi

from scd_tpu.cluster.estimate_k import (
    binary_search_k,
    estimate_k,
    scipy_optimise_k,
)
from scd_tpu.cluster.finch import finch, finch_fit, first_neighbors


def test_first_neighbors_cosine(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    nn, nd = first_neighbors(x, "cosine")
    xs = x / np.linalg.norm(x, axis=1, keepdims=True)
    d = 1 - xs @ xs.T
    np.fill_diagonal(d, 1000.0)
    np.testing.assert_array_equal(nn, d.argmin(1))
    np.testing.assert_allclose(nd, d.min(1), atol=1e-5)


def test_finch_recovers_blobs(blobs):
    X, y = blobs
    c, num_clust, _ = finch(X, distance="euclidean")
    assert c.shape[0] == len(X)
    # some partition should align well with the 4 blobs
    best = max(nmi(y, c[:, p]) for p in range(c.shape[1]))
    assert best > 0.8
    assert num_clust[0] > num_clust[-1] >= 1


def test_finch_req_clust(blobs):
    X, y = blobs
    labels = finch_fit(X, req_clust=4, distance="euclidean")
    assert len(np.unique(labels)) == 4
    assert nmi(y, labels) > 0.8


def test_finch_req_clust_exact_merge(rng):
    x = rng.standard_normal((60, 4)).astype(np.float32)
    labels = finch_fit(x, req_clust=7, distance="cosine")
    assert len(np.unique(labels)) == 7


def _quadratic_objective(best=25):
    return lambda k: 1.0 - ((k - best) / 50.0) ** 2


def test_binary_search_finds_peak():
    best_k, best_acc = binary_search_k(_quadratic_objective(25), 10, 100)
    assert abs(best_k - 25) <= 12  # halving search on a smooth curve
    assert best_acc > 0.9


def test_scipy_brent_finds_peak():
    best_k, best_acc = scipy_optimise_k(_quadratic_objective(42), 10, 100)
    assert abs(best_k - 42) <= 2
    assert best_acc > 0.99


def test_estimate_k_on_blobs(blobs):
    import jax

    from scd_tpu.core.config import ClusterConfig
    from scd_tpu.cluster.kmeans import fit_kmeans
    from scd_tpu.metrics import cluster_acc

    X, y = blobs
    mask_lab = np.zeros(len(y), bool)
    mask_lab[: len(y) // 2] = True

    # custom objective without L2 normalization (2-d blobs collapse on the
    # unit circle; the default objective normalizes because real features
    # are embeddings)
    def objective(k):
        cfg = ClusterConfig(n_clusters=int(k), n_init=3, max_iterations=50)
        res = fit_kmeans(jax.random.PRNGKey(0), X, cfg)
        return float(cluster_acc(y[mask_lab], res.labels[mask_lab]))

    best_k, best_acc = estimate_k(X, y, mask_lab, min_k=2, max_k=10,
                                  method="binary", objective=objective)
    assert 3 <= best_k <= 6  # true K = 4
    assert best_acc > 0.8


def test_fit_kmeans_dynamic_k_one_compile():
    """Dynamic-K k-means: one executable serves every probed K (the
    remote-compile TPU path would otherwise pay a compile per K)."""
    import jax
    import numpy as np
    from sklearn.metrics import normalized_mutual_info_score as nmi

    from scd_tpu.cluster.estimate_k import fit_kmeans_dynamic_k
    from conftest import make_blobs

    X, y = make_blobs(n_samples=400, n_features=16, centers=8, seed=3)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    inertias = {}
    for k in (4, 8, 12):
        labels, inertia = fit_kmeans_dynamic_k(jax.random.PRNGKey(0), X, k,
                                               max_k=16, n_init=4)
        assert labels.max() < k  # sentinels never win
        inertias[k] = inertia
        if k == 8:
            assert nmi(y, labels) > 0.9
    # more clusters -> lower inertia
    assert inertias[4] > inertias[8] > inertias[12]


def test_estimate_k_dynamic_objective():
    import numpy as np

    from scd_tpu.cluster.estimate_k import estimate_k
    from conftest import make_blobs

    X, y = make_blobs(n_samples=400, n_features=16, centers=8, seed=3)
    mask_lab = y < 4
    best_k, best_acc = estimate_k(X, y, mask_lab, min_k=4, max_k=16,
                                  method="binary", dynamic_k=True)
    assert 4 <= best_k <= 16 and best_acc > 0.8


def test_dynamic_k_reuses_one_executable():
    """Regression: the jitted dynamic-K core must live at module level —
    an inner @jax.jit would recompile on every probe (jit caches per
    function object)."""
    import jax
    import numpy as np

    from scd_tpu.cluster.estimate_k import _dynk_run, fit_kmeans_dynamic_k
    from conftest import make_blobs

    X, _y = make_blobs(n_samples=200, n_features=8, centers=5, seed=1)
    before = _dynk_run._cache_size()
    for k in (3, 5, 7, 5):
        fit_kmeans_dynamic_k(jax.random.PRNGKey(0), X, k, max_k=10, n_init=2)
    assert _dynk_run._cache_size() == before + 1  # one trace for all K


def test_dynamic_k_fused_matches_xla():
    """The fused E+M branch of the dynamic-K loop (interpret-mode kernel on
    CPU): the far-sentinel clusters must never win the argmin, and labels/
    inertia must agree with the XLA branch."""
    import jax
    import numpy as np

    from scd_tpu.cluster.estimate_k import fit_kmeans_dynamic_k

    rng = np.random.default_rng(0)
    cent = rng.standard_normal((5, 12)) * 4
    x = (cent[rng.integers(0, 5, 600)]
         + 0.3 * rng.standard_normal((600, 12))).astype(np.float32)
    la, ia = fit_kmeans_dynamic_k(jax.random.PRNGKey(0), x, 5, max_k=32,
                                  n_init=2, max_iterations=15, fused=False)
    lb, ib = fit_kmeans_dynamic_k(jax.random.PRNGKey(0), x, 5, max_k=32,
                                  n_init=2, max_iterations=15, fused=True)
    assert lb.max() < 5  # sentinels never assigned
    np.testing.assert_array_equal(la, lb)
    np.testing.assert_allclose(ia, ib, rtol=1e-3)


def test_estimate_k_mesh_matches_single_device():
    """estimate_k(mesh=...) shards the feature rows over the data axis;
    the probed (K, acc) trajectory must match the single-device search
    (the E-step argmin and segment-sum M-step are row-partitionable)."""
    import numpy as np

    from scd_tpu.core.config import MeshConfig
    from scd_tpu.core.mesh import make_mesh
    from scd_tpu.cluster.estimate_k import estimate_k
    from conftest import make_blobs

    X, y = make_blobs(n_samples=401, n_features=16, centers=8, seed=3)
    mask_lab = y < 4
    single = estimate_k(X, y, mask_lab, min_k=4, max_k=16,
                        method="binary", dynamic_k=True)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    sharded = estimate_k(X, y, mask_lab, min_k=4, max_k=16,
                         method="binary", dynamic_k=True, mesh=mesh)
    assert sharded[0] == single[0]
    np.testing.assert_allclose(sharded[1], single[1], atol=1e-6)
