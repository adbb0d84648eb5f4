"""Constrained clustering tests: Sinkhorn assignment vs exact MCF, and the
full ConSSKM fit on blobs with both backends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import normalized_mutual_info_score as nmi

from scd_tpu.core.config import ClusterConfig
from scd_tpu.cluster.constrained import fit_constrained, fit_constrained_unsup
from scd_tpu.ops.native import constrained_assign
from scd_tpu.ops.sinkhorn import sinkhorn_constrained_assign


def test_sinkhorn_assign_feasible(rng):
    cost = rng.random((120, 4)).astype(np.float32)
    res = sinkhorn_constrained_assign(jnp.asarray(cost), 4, size_min=20,
                                      size_max=40)
    counts = np.bincount(np.asarray(res.labels), minlength=4)
    assert bool(res.feasible)
    assert counts.min() >= 20 and counts.max() <= 40


def test_sinkhorn_assign_respects_structure(rng):
    # 3 well-separated groups of 30 with k=3 and loose bounds: plain argmin
    centers = np.eye(3, 8, dtype=np.float32) * 5
    cost = np.concatenate([
        np.linalg.norm(centers[i] + 0.05 * rng.standard_normal((30, 8))
                       - centers[:, None], axis=-1).T
        for i in range(3)
    ]).astype(np.float32)
    res = sinkhorn_constrained_assign(jnp.asarray(cost), 3, size_min=10,
                                      size_max=50)
    labels = np.asarray(res.labels)
    want = np.repeat(np.arange(3), 30)
    assert (labels == want).mean() > 0.95


def test_sinkhorn_close_to_mcf_cost(rng):
    cost = rng.random((90, 3)).astype(np.float32)
    size_min, size_max = 20, 40
    res = sinkhorn_constrained_assign(jnp.asarray(cost), 3, size_min, size_max,
                                      iters=400, repair_passes=12)
    assert bool(res.feasible)
    sk_cost = cost[np.arange(90), np.asarray(res.labels)].sum()
    exact = constrained_assign(np.around(cost * 100000).astype(np.int32),
                               size_min, size_max)
    mcf_cost = cost[np.arange(90), exact].sum()
    # entropic solution within a few percent of the exact optimum
    assert sk_cost <= mcf_cost * 1.10 + 1e-6


@pytest.mark.parametrize("backend", ["sinkhorn", "mcf"])
def test_fit_constrained_blobs(blobs, backend):
    X, y = blobs  # 500 points, 4 blobs of 125
    l_mask = y > 1
    # size_min=0: blobs 2/3 have no unlabelled points, so any lower bound
    # would force misassignments into the labelled clusters
    cfg = ClusterConfig(n_clusters=4, n_init=3, max_iterations=20,
                        size_min=0, size_max=200,
                        constrained_backend=backend)
    res = fit_constrained(jax.random.PRNGKey(0), X[~l_mask], X[l_mask],
                          y[l_mask], cfg)
    n_l = int(l_mask.sum())
    classes, l_mapped = np.unique(y[l_mask], return_inverse=True)
    np.testing.assert_array_equal(res.labels[:n_l], l_mapped)
    u_counts = np.bincount(res.labels[n_l:], minlength=4)
    # constraint applies to the unlabelled assignment
    assert u_counts.max() <= 200
    y_cat = np.concatenate([y[l_mask], y[~l_mask]])
    assert nmi(y_cat, res.labels) > 0.9


@pytest.mark.parametrize("backend", ["sinkhorn", "mcf"])
def test_fit_constrained_forces_balance(rng, backend):
    # one tight gaussian: unconstrained k-means would put ~everything in one
    # cluster; size_max forces a split
    X = (0.1 * rng.standard_normal((200, 8))).astype(np.float32)
    cfg = ClusterConfig(n_clusters=4, n_init=2, max_iterations=10,
                        size_min=30, size_max=70,
                        constrained_backend=backend)
    res = fit_constrained_unsup(jax.random.PRNGKey(0), X, cfg)
    counts = np.bincount(res.labels, minlength=4)
    assert counts.min() >= 30 and counts.max() <= 70


def test_feasible_sinkhorn_skips_host_mcf(blobs, monkeypatch):
    """When the vmapped sinkhorn restarts produce a feasible assignment the
    host MCF solver must never run: the restart ranking prefers feasible
    restarts (infeasible ones get +inf inertia), so one infeasible restart
    cannot discard feasible siblings and trigger the expensive fallback."""
    import scd_tpu.cluster.constrained as mod

    X, y = blobs
    l_mask = y > 1
    calls = []

    def _spy(*a, **kw):
        calls.append(a)
        raise AssertionError("host MCF invoked despite feasible sinkhorn")

    monkeypatch.setattr(mod, "constrained_assign", _spy)
    cfg = ClusterConfig(n_clusters=4, n_init=4, max_iterations=15,
                        size_min=10, size_max=200,
                        constrained_backend="sinkhorn")
    res = fit_constrained(jax.random.PRNGKey(3), X[~l_mask], X[l_mask],
                          y[l_mask], cfg)
    n_l = int(l_mask.sum())
    counts = np.bincount(res.labels[n_l:], minlength=4)
    assert counts.min() >= 10 and counts.max() <= 200
    assert not calls


def test_fit_constrained_infeasible_raises(blobs):
    X, y = blobs
    cfg = ClusterConfig(n_clusters=4, size_min=200, size_max=300)
    with pytest.raises(ValueError):
        fit_constrained(jax.random.PRNGKey(0), X[:100], X[100:150], y[100:150],
                        cfg)


def test_kpp_local_trials_lowers_potential(blobs):
    """Greedy local trials (k_means_constrained_.py:89-144) must not seed
    worse than simple kpp on average: the k-means++ potential (sum of
    squared min-distances) is what the greedy step minimizes directly."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.distance import pairwise_sqdist
    from scd_tpu.ops.kpp import (kmeans_plus_plus,
                                 kmeans_plus_plus_local_trials)

    X, _ = blobs
    x = jnp.asarray(X)
    k = 8

    def potential(centers):
        return float(jnp.sum(jnp.min(pairwise_sqdist(x, centers), axis=1)))

    pots_simple, pots_local = [], []
    for s in range(10):
        key = jax.random.PRNGKey(s)
        pots_simple.append(potential(kmeans_plus_plus(key, x, k)))
        pots_local.append(potential(
            kmeans_plus_plus_local_trials(key, x, k)))
    assert np.mean(pots_local) <= np.mean(pots_simple)


def test_kpp_local_trials_respects_pins_and_padding():
    import jax
    import jax.numpy as jnp

    from scd_tpu.ops.kpp import kmeans_plus_plus_local_trials

    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 4)).astype(np.float32)
    x[50:] = 1e6  # padded rows: must never be chosen
    pre = jnp.asarray(x[:2])
    centers = kmeans_plus_plus_local_trials(
        jax.random.PRNGKey(0), jnp.asarray(x), 6, pre_centers=pre,
        n_valid=jnp.asarray(50))
    got = np.asarray(centers)
    np.testing.assert_array_equal(got[:2], x[:2])  # pins kept
    assert np.abs(got).max() < 1e5  # no padded row selected


def test_fit_constrained_unsup_local_trials(blobs):
    import jax

    from scd_tpu.cluster.constrained import fit_constrained_unsup
    from scd_tpu.core.config import ClusterConfig

    X, y = blobs
    cfg = ClusterConfig(algorithm="ConSSKM", n_clusters=4, n_init=2,
                        max_iterations=15, size_min=50, size_max=250,
                        kpp_local_trials=-1)
    res = fit_constrained_unsup(jax.random.PRNGKey(0), X, cfg)
    counts = np.bincount(res.labels, minlength=4)
    assert counts.min() >= 50 and counts.max() <= 250


def test_mcf_threaded_restarts_match_serial(blobs):
    """The restart thread pool (which overlaps the GIL-releasing native
    solves with device dispatch) must be a pure wall-clock optimization:
    labels, inertia, and centers bit-identical to the serial loop."""
    import dataclasses

    import jax

    from scd_tpu.cluster.constrained import fit_constrained_unsup
    from scd_tpu.core.config import ClusterConfig

    X, y = blobs
    base = ClusterConfig(algorithm="ConSSKM", n_clusters=4, n_init=3,
                         max_iterations=8, size_min=50, size_max=250,
                         constrained_backend="mcf")
    serial = fit_constrained_unsup(
        jax.random.PRNGKey(3), X, dataclasses.replace(base, mcf_restart_threads=1))
    threaded = fit_constrained_unsup(
        jax.random.PRNGKey(3), X, dataclasses.replace(base, mcf_restart_threads=3))
    np.testing.assert_array_equal(serial.labels, threaded.labels)
    assert serial.inertia == threaded.inertia
    np.testing.assert_array_equal(serial.centers, threaded.centers)


@pytest.mark.parametrize("seed,n,k,size_min,size_max", [
    (0, 150, 5, 10, 60),     # loose
    (1, 200, 4, 50, 50),     # exact balance (every cluster pinned)
    (2, 96, 8, 0, 15),       # tight upper bound only
    (3, 300, 3, 90, 110),    # narrow window
])
def test_sinkhorn_vs_mcf_property_sweep(seed, n, k, size_min, size_max):
    """Property sweep across constraint regimes: the entropic+repair
    assignment must always be feasible and land within a few percent of
    the exact MCF optimum (the contract that makes the sinkhorn track a
    safe production default with MCF as fallback)."""
    rng = np.random.default_rng(seed)
    cost = rng.random((n, k)).astype(np.float32)
    res = sinkhorn_constrained_assign(jnp.asarray(cost), k, size_min,
                                      size_max, iters=400, repair_passes=12)
    assert bool(res.feasible), (seed, n, k)
    counts = np.bincount(np.asarray(res.labels), minlength=k)
    assert counts.min() >= size_min and counts.max() <= size_max
    sk_cost = cost[np.arange(n), np.asarray(res.labels)].sum()
    exact = constrained_assign(np.around(cost * 100000).astype(np.int32),
                               size_min, size_max)
    mcf_cost = cost[np.arange(n), exact].sum()
    assert sk_cost <= mcf_cost * 1.15 + 1e-6, (sk_cost, mcf_cost)
