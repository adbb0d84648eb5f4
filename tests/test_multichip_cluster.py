"""Multi-chip clustering: data-sharded k-means/SSKM over an 8-device mesh
must agree with the single-device result (SPMD sharding changes layout,
not math — SURVEY §2.10: this workload's parallelism is feature-matrix
sharding)."""

import jax
import numpy as np
import pytest
from sklearn.metrics import normalized_mutual_info_score as nmi

from scd_tpu.core.config import ClusterConfig, MeshConfig
from scd_tpu.core.mesh import make_mesh
from scd_tpu.cluster import fit_kmeans, fit_sskm

from conftest import make_blobs


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh (virtual CPU or multi-chip)")
    return make_mesh(MeshConfig(data=8, model=1))


def test_fit_kmeans_sharded_matches_single(mesh):
    X, y = make_blobs(n_samples=1001, n_features=32, centers=8, seed=4)
    cfg = ClusterConfig(n_clusters=8, n_init=4, max_iterations=50)
    single = fit_kmeans(jax.random.PRNGKey(0), X, cfg)
    sharded = fit_kmeans(jax.random.PRNGKey(0), X, cfg, mesh=mesh)
    assert sharded.labels.shape == (1001,)
    # same seed, same math -> identical assignment structure
    assert nmi(single.labels, sharded.labels) > 0.99
    assert sharded.inertia == pytest.approx(single.inertia, rel=1e-3)
    assert nmi(y, sharded.labels) > 0.95


def test_fit_sskm_sharded(mesh):
    X, y = make_blobs(n_samples=800, n_features=16, centers=8, seed=5)
    mask_lab = (y < 4) & (np.arange(len(y)) % 2 == 0)
    cfg = ClusterConfig(n_clusters=8, n_init=4, max_iterations=50)
    res = fit_sskm(jax.random.PRNGKey(0), X[~mask_lab], X[mask_lab],
                   y[mask_lab], cfg, mesh=mesh)
    n_lab = int(mask_lab.sum())
    assert res.labels.shape == (len(y),)
    u_nmi = nmi(y[~mask_lab], res.labels[n_lab:])
    assert u_nmi > 0.95


def test_fit_constrained_sharded_respects_sizes(mesh):
    """Sharded ConSSKM: row padding must not corrupt the size constraints
    (padded rows take the sentinel label and zero transport mass)."""
    X, y = make_blobs(n_samples=803, n_features=16, centers=8, seed=6)
    mask_lab = (y < 4) & (np.arange(len(y)) % 4 == 0)
    n_u = int((~mask_lab).sum())
    lo, hi = n_u // 8 - 30, n_u // 8 + 40
    cfg = ClusterConfig(n_clusters=8, n_init=2, max_iterations=6,
                        size_min=lo, size_max=hi,
                        constrained_backend="sinkhorn")
    from scd_tpu.cluster import fit_constrained

    res = fit_constrained(jax.random.PRNGKey(0), X[~mask_lab], X[mask_lab],
                          y[mask_lab], cfg, mesh=mesh)
    n_lab = int(mask_lab.sum())
    u = res.labels[n_lab:]
    assert len(u) == n_u  # padding sliced away
    sizes = np.bincount(u, minlength=8)
    assert sizes.sum() == n_u
    assert sizes.min() >= lo and sizes.max() <= hi
    assert nmi(y[~mask_lab], u) > 0.9


def test_fit_kmeans_from_labels_sharded_matches_single(mesh):
    """Warm-start path over the mesh: the 1-D init-label array rides the
    same row sharding as the feature matrix (P over data axis applies to
    dim-0 of any rank); padded rows carry weight 0 and must not move the
    centroids."""
    from scd_tpu.cluster import fit_kmeans_from_labels

    X, y = make_blobs(n_samples=1003, n_features=16, centers=8, seed=7)
    rng = np.random.default_rng(0)
    noisy = y.copy()
    flip = rng.random(len(y)) < 0.15
    noisy[flip] = rng.integers(0, 8, flip.sum())
    cfg = ClusterConfig(n_clusters=8, max_iterations=50)
    single = fit_kmeans_from_labels(X, noisy, cfg)
    sharded = fit_kmeans_from_labels(X, noisy, cfg, mesh=mesh)
    assert sharded.labels.shape == (1003,)
    assert np.array_equal(single.labels, sharded.labels)
    assert sharded.inertia == pytest.approx(single.inertia, rel=1e-4)
    assert nmi(y, sharded.labels) > 0.95


def test_fit_constrained_mcf_backend_ignores_mesh_padding(mesh):
    """constrained_backend='mcf' with a mesh must solve on the UNPADDED
    rows: the MCF path has no sentinel-label machinery, so staged/padded
    rows would be assigned to clusters (wrong sizes, labels misaligned
    with the dataset)."""
    from scd_tpu.cluster import fit_constrained

    X, y = make_blobs(n_samples=453, n_features=8, centers=4, seed=9)
    mask_lab = (y < 2) & (np.arange(len(y)) % 3 == 0)
    n_u = int((~mask_lab).sum())
    cfg = ClusterConfig(n_clusters=4, n_init=2, max_iterations=5,
                        size_min=n_u // 8, size_max=n_u,
                        constrained_backend="mcf")
    res = fit_constrained(jax.random.PRNGKey(0), X[~mask_lab], X[mask_lab],
                          y[mask_lab], cfg, mesh=mesh)
    assert res.labels.shape == (len(y),)  # not padded length
    u = res.labels[int(mask_lab.sum()):]
    sizes = np.bincount(u, minlength=4)
    assert sizes.sum() == n_u
    assert sizes.min() >= n_u // 8


def test_fused_shard_map_em_matches_xla(mesh):
    """The shard_map-wrapped fused Pallas E+M (interpret mode on CPU) must
    reproduce the auto-partitioned XLA mesh path: same per-shard math, the
    psum merge replaces GSPMD's inserted reduction.  Dispatch is the
    ClusterConfig.fused_mesh field (VERDICT r3 item 7) — no env mutation."""
    import dataclasses

    X, y = make_blobs(n_samples=512, n_features=32, centers=8, seed=7)
    cfg = ClusterConfig(n_clusters=8, n_init=2, max_iterations=10)
    # estep pinned exact: this test isolates the shard_map+psum plumbing,
    # so fused and XLA must run identical math (the auto probe would
    # enable x_bf16 here, whose documented sums rounding breaks the
    # rel=1e-4 inertia check; the variant itself is covered in
    # test_kmeans.py::test_estep_auto_probe_*)
    cfg_fused = dataclasses.replace(cfg, fused_mesh=True, estep="exact")
    fused = fit_kmeans(jax.random.PRNGKey(0), X, cfg_fused, mesh=mesh)
    xla = fit_kmeans(jax.random.PRNGKey(0), X, cfg, mesh=mesh)
    assert nmi(fused.labels, xla.labels) > 0.99
    assert fused.inertia == pytest.approx(xla.inertia, rel=1e-4)

    # SSKM variant (labelled sums folded in outside the shard_map)
    mask = y < 4
    f2 = fit_sskm(jax.random.PRNGKey(1), X[~mask], X[mask], y[mask],
                  cfg_fused, mesh=mesh)
    x2 = fit_sskm(jax.random.PRNGKey(1), X[~mask], X[mask], y[mask], cfg,
                  mesh=mesh)
    assert nmi(f2.labels, x2.labels) > 0.99
    assert f2.inertia == pytest.approx(x2.inertia, rel=1e-4)


def test_fused_dispatch_config_and_env(monkeypatch):
    """_use_fused: config field decides; env var (when set) overrides."""
    from scd_tpu.cluster.kmeans import _use_fused

    monkeypatch.delenv("SCD_FUSED_MESH", raising=False)
    assert _use_fused(cfg_fused=True) is True
    assert _use_fused(cfg_fused=False) is False
    # auto on the CPU test backend -> XLA ops
    assert _use_fused(cfg_fused="auto") is False
    # env override beats config, both directions; "0"/"" mean off
    monkeypatch.setenv("SCD_FUSED_MESH", "1")
    assert _use_fused(cfg_fused=False) is True
    monkeypatch.setenv("SCD_FUSED_MESH", "0")
    assert _use_fused(cfg_fused=True) is False
    monkeypatch.setenv("SCD_FUSED_MESH", "")
    assert _use_fused(cfg_fused=True) is False
    # the VMEM-feasibility guard still applies when forced on
    monkeypatch.setenv("SCD_FUSED_MESH", "1")
    from scd_tpu.ops.pallas_kernels import fused_em_block_n

    infeasible = fused_em_block_n(1 << 14, 1 << 14) is None
    assert _use_fused(1 << 14, 1 << 14) is (not infeasible)


def test_estep_auto_probe_on_mesh(mesh):
    """The 'auto' estep probe's mesh branch (em_iteration_sharded on both
    variants) enables x_bf16 on separated blobs and the resulting fit
    keeps label parity with the exact fused fit."""
    import dataclasses

    from scd_tpu.cluster.kmeans import _ESTEP_PROBE_MEMO

    X, y = make_blobs(n_samples=512, n_features=32, centers=8, seed=11)
    base = ClusterConfig(n_clusters=8, n_init=2, max_iterations=8,
                         fused_mesh=True)
    _ESTEP_PROBE_MEMO.clear()
    auto = fit_kmeans(jax.random.PRNGKey(0), X, base, mesh=mesh)
    (probe_key, probe_val), = _ESTEP_PROBE_MEMO.items()
    assert probe_key[2] is True  # mesh branch taken
    assert probe_val == (3, True)
    exact = fit_kmeans(jax.random.PRNGKey(0), X,
                       dataclasses.replace(base, estep="exact"), mesh=mesh)
    np.testing.assert_array_equal(auto.labels, exact.labels)
