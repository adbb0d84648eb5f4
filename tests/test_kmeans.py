"""Clusterer tests on the blobs fixture (the reference's own self-check
pattern, ``sskm_constrained.py:358-412``)."""

import jax
import numpy as np
import pytest
from sklearn.metrics import normalized_mutual_info_score as nmi

from scd_tpu.core.config import ClusterConfig
from scd_tpu.cluster import fit_kmeans, fit_sskm
from scd_tpu.ops.distance import estep_assign, pairwise_sqdist
from scd_tpu.ops.kpp import kmeans_plus_plus
from scd_tpu.ops.segment import mstep_update, segment_mean


def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.standard_normal((37, 16)).astype(np.float32)
    c = rng.standard_normal((5, 16)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(x, c))
    ref = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)


def test_estep_assign(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    c = rng.standard_normal((4, 8)).astype(np.float32)
    labels, mindist = estep_assign(x, c)
    ref = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(labels), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(mindist), ref.min(1), rtol=1e-4, atol=1e-4)


def test_segment_mean(rng):
    x = rng.standard_normal((20, 4)).astype(np.float32)
    labels = rng.integers(0, 3, 20).astype(np.int32)
    means, counts = segment_mean(x, labels, 4)
    for k in range(3):
        sel = x[labels == k]
        if len(sel):
            np.testing.assert_allclose(np.asarray(means)[k], sel.mean(0),
                                       rtol=1e-5, atol=1e-5)
            assert counts[k] == len(sel)
    assert counts[3] == 0


def test_mstep_empty_keep(rng):
    x = rng.standard_normal((10, 4)).astype(np.float32)
    labels = np.zeros(10, dtype=np.int32)  # all points in cluster 0
    prev = rng.standard_normal((3, 4)).astype(np.float32)
    new = np.asarray(mstep_update(x, labels, 3, prev))
    np.testing.assert_allclose(new[0], x.mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(new[1], prev[1])
    np.testing.assert_allclose(new[2], prev[2])


def test_kpp_spreads_centers(blobs):
    X, y = blobs
    key = jax.random.PRNGKey(0)
    centers = np.asarray(kmeans_plus_plus(key, X, 4))
    # k-means++ on well-separated blobs should spread centers across blobs
    # (a single seed can still double-place one blob, hence the loose bound)
    labels, _ = estep_assign(X, centers)
    assert len(np.unique(np.asarray(labels))) >= 3
    assert nmi(y, np.asarray(labels)) > 0.6


def test_kpp_pre_centers(blobs):
    X, y = blobs
    pre = X[:2].copy()
    centers = np.asarray(kmeans_plus_plus(jax.random.PRNGKey(1), X, 4,
                                          pre_centers=pre))
    np.testing.assert_allclose(centers[:2], pre, rtol=1e-6)


def test_kpp_mask_prefix_bit_equal(blobs):
    """A [N] validity MASK (the ragged multi-controller layout) whose
    valid rows are a prefix must reproduce the scalar-count path
    bit-for-bit: same randint draw, same r-th-valid-row selection."""
    import jax.numpy as jnp

    X, _y = blobs
    n_valid = len(X) - 7
    key = jax.random.PRNGKey(3)
    by_count = np.asarray(kmeans_plus_plus(key, X, 4,
                                           n_valid=jnp.asarray(n_valid)))
    mask = jnp.asarray((np.arange(len(X)) < n_valid).astype(np.float32))
    by_mask = np.asarray(kmeans_plus_plus(key, X, 4, n_valid=mask))
    np.testing.assert_array_equal(by_count, by_mask)

    # interleaved invalid rows never get sampled
    rng = np.random.default_rng(0)
    holes = rng.choice(len(X), 9, replace=False)
    m2 = np.ones(len(X), np.float32)
    m2[holes] = 0.0
    centers = np.asarray(kmeans_plus_plus(key, X, 6,
                                          n_valid=jnp.asarray(m2)))
    invalid_rows = np.asarray(X)[holes]
    d = ((centers[:, None, :] - invalid_rows[None, :, :]) ** 2).sum(-1)
    assert d.min() > 1e-12  # no center sits exactly on a masked row


def test_fit_kmeans_blobs(blobs):
    X, y = blobs
    cfg = ClusterConfig(n_clusters=4, n_init=4, max_iterations=50)
    res = fit_kmeans(jax.random.PRNGKey(0), X, cfg)
    assert res.labels.shape == (len(X),)
    assert nmi(y, res.labels) > 0.9
    assert res.inertia > 0 and res.n_iter >= 1


def test_fit_kmeans_matches_sklearn_inertia(blobs):
    from sklearn.cluster import KMeans

    X, y = blobs
    cfg = ClusterConfig(n_clusters=4, n_init=4, max_iterations=100)
    res = fit_kmeans(jax.random.PRNGKey(0), X, cfg)
    sk = KMeans(n_clusters=4, n_init=4, random_state=0).fit(X)
    # same optimum on clean blobs
    assert res.inertia == pytest.approx(sk.inertia_, rel=1e-2)


def test_fit_sskm_pins_labelled(blobs):
    X, y = blobs
    # classes {2,3} labelled, {0,1} unlabelled (reference main() fixture split)
    l_mask = y > 1
    l_feats, l_targets = X[l_mask], y[l_mask]
    u_feats, u_targets = X[~l_mask], y[~l_mask]
    cfg = ClusterConfig(n_clusters=4, n_init=4, max_iterations=50)
    res = fit_sskm(jax.random.PRNGKey(0), u_feats, l_feats, l_targets, cfg)
    n_l = len(l_targets)
    # labelled block keeps its (remapped) class ids
    classes, l_mapped = np.unique(l_targets, return_inverse=True)
    np.testing.assert_array_equal(res.labels[:n_l], l_mapped)
    # overall clustering must recover the 4 blobs
    y_cat = np.concatenate([l_targets, u_targets])
    assert nmi(y_cat, res.labels) > 0.9


def test_fit_sskm_unlabelled_clusters_get_high_ids(blobs):
    X, y = blobs
    l_mask = y > 1
    cfg = ClusterConfig(n_clusters=4, n_init=2, max_iterations=50)
    res = fit_sskm(jax.random.PRNGKey(0), X[~l_mask][:100], X[l_mask],
                   y[l_mask], cfg)
    assert res.centers.shape == (4, 2)
    assert set(np.unique(res.labels)) <= set(range(4))


def test_fit_kmeans_from_labels_warm_start(blobs):
    """Warm start from an existing labelling (classifier preds) converges to
    the blob structure even from a noisy init."""
    from scd_tpu.core.config import ClusterConfig
    from scd_tpu.cluster import fit_kmeans_from_labels

    X, y = blobs
    rng = np.random.default_rng(0)
    noisy = np.where(rng.random(len(y)) < 0.3,
                     rng.integers(0, 4, len(y)), y)
    res = fit_kmeans_from_labels(X, noisy,
                                 ClusterConfig(n_clusters=4,
                                               max_iterations=50))
    # warm start recovers most structure from a 30%-corrupted labelling
    assert nmi(y, res.labels) > nmi(y, noisy)
    assert nmi(y, res.labels) > 0.85
    assert res.inertia < np.inf


def test_mstep_farthest_never_donates_padded_rows():
    """Zero-weight (padded) rows have garbage coordinates and huge
    mindist; the 'farthest' empty-cluster policy must not reseed empty
    clusters from them."""
    import jax.numpy as jnp

    x = jnp.asarray(np.array([[10.0, 10.0], [10.1, 10.0], [10.0, 10.1],
                              [9.9, 10.0], [0.0, 0.0], [0.0, 0.0]],
                             np.float32))
    labels = jnp.asarray(np.array([0, 0, 0, 0, 0, 0], np.int32))
    weights = jnp.asarray(np.array([1, 1, 1, 1, 0, 0], np.float32))
    prev = jnp.asarray(np.array([[10.0, 10.0], [50.0, 50.0], [60.0, 60.0]],
                                np.float32))
    mindist = jnp.sum((x - prev[labels]) ** 2, axis=1)
    new = np.asarray(mstep_update(x, labels, 3, prev, mindist=mindist,
                                  empty_policy="farthest", weights=weights))
    # clusters 1 and 2 are empty; donors must come from the 4 real points
    for row in new[1:]:
        assert np.linalg.norm(row - np.array([10.0, 10.0])) < 1.0, row


def test_resolve_estep_dispatch(monkeypatch):
    """ClusterConfig.estep -> (estep_passes, x_bf16) mapping (VERDICT r4
    item 1): explicit modes map directly, the XLA fallback is always
    exact, and SCD_ESTEP overrides the config."""
    import jax.numpy as jnp

    from scd_tpu.cluster.kmeans import _device_f32, _resolve_estep

    monkeypatch.delenv("SCD_ESTEP", raising=False)
    x = _device_f32(np.random.default_rng(0)
                    .standard_normal((64, 8)).astype(np.float32))
    nv = jnp.asarray(64)

    def res(mode, fused=True):
        cfg = ClusterConfig(n_clusters=4, estep=mode)
        return _resolve_estep(cfg, fused, x, nv, 64, None)

    assert res("exact") == (3, False)
    assert res("2pass") == (2, False)
    assert res("x_bf16") == (3, True)
    # not fused (CPU backend / VMEM-infeasible): variants are moot
    assert res("x_bf16", fused=False) == (3, False)
    assert res("auto", fused=False) == (3, False)
    with pytest.raises(ValueError):
        res("fast")
    # env override beats the config
    monkeypatch.setenv("SCD_ESTEP", "2pass")
    assert res("x_bf16") == (2, False)


def test_estep_auto_probe_enables_on_separated_data():
    """'auto' probes x_bf16 vs exact labels on the actual features and
    takes the fast path on full agreement; the resulting fit matches the
    exact fit on class-structured data (the pipelines' regime)."""
    from scd_tpu.cluster.kmeans import _ESTEP_PROBE_MEMO

    rng = np.random.default_rng(0)
    C = 5.0 * rng.standard_normal((8, 32)).astype(np.float32)
    y = rng.integers(0, 8, 600)
    X = (C[y] + 0.3 * rng.standard_normal((600, 32))).astype(np.float32)

    _ESTEP_PROBE_MEMO.clear()
    kw = dict(n_clusters=8, n_init=2, max_iterations=8, fused_mesh=True)
    auto = fit_kmeans(jax.random.PRNGKey(0), X, ClusterConfig(**kw))
    assert _ESTEP_PROBE_MEMO == {((600, 32), 8, False): (3, True)}
    exact = fit_kmeans(jax.random.PRNGKey(0), X,
                       ClusterConfig(estep="exact", **kw))
    np.testing.assert_array_equal(auto.labels, exact.labels)
    # centers/inertia carry only the documented bf16-storage rounding
    assert auto.inertia == pytest.approx(exact.inertia, rel=5e-3)


def test_estep_auto_probe_refuses_tie_dominated_data():
    """Tie-DOMINATED data must keep the exact path: every point near the
    midplane of two close centers flips ~half the rows under bf16
    storage.  Individual flips here are sub-resolution ties (margins
    ~1e-3 of the distance scale), but a 49% flip fraction blows the
    probe's 2% bound — when a large share of the data is boundary-
    ambiguous the clustering itself is resolution-sensitive, so the
    probe stays exact rather than let storage precision pick sides."""
    import jax.numpy as jnp

    from scd_tpu.cluster.kmeans import (_ESTEP_PROBE_MEMO, _device_f32,
                                        _resolve_estep)

    rng = np.random.default_rng(5)
    d = 768
    c0 = rng.standard_normal(d).astype(np.float32)
    c1 = c0 + 0.8 * rng.standard_normal(d).astype(np.float32)
    mid, delta = (c0 + c1) / 2, np.linalg.norm(c1 - c0)
    u = (c1 - c0) / delta
    margins = np.concatenate([-np.logspace(-2, -1, 100),
                              np.logspace(-2, -1, 100)]).astype(np.float32)
    pts = mid[None] + (margins / (2 * delta))[:, None] * u[None]
    # rows 0 / n-1 are the strided probe centers (k=2)
    X = np.concatenate([c0[None], pts, c1[None]]).astype(np.float32)

    _ESTEP_PROBE_MEMO.clear()
    cfg = ClusterConfig(n_clusters=2, fused_mesh=True)
    got = _resolve_estep(cfg, True, _device_f32(X),
                         jnp.asarray(X.shape[0]), X.shape[0], None)
    assert got == (3, False)
    assert _ESTEP_PROBE_MEMO[((X.shape[0], d), 2, False)] == (3, False)
