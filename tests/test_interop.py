"""Reference ``.pt`` artifact interop round-trips (VERDICT r4 item 6).

Fabricated torch ``.pt`` files in the reference's own directory layout and
key schema (``main_unsup.py:294-311, 366-374, 387-395``) must import into
the ArtifactCache under the exact keys the pipelines re-enter from — so a
run against real reference assets needs zero new code."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scd_tpu.core.config import PipelineConfig
from scd_tpu.pipelines.common import (
    cluster_cache_key,
    feature_cache_key,
    load_zeroshot_weights,
    stage_cache,
)
from scd_tpu.pipelines.interop import (
    import_reference_artifacts,
    import_reference_cluster,
    import_reference_features,
    import_reference_zeroshot,
)


def _fabricate_reference_root(root, cfg, rng, n=40, d=16, v=12, k=5):
    """Write the reference's cache layout: feature dicts for both towers,
    a KM cluster result (all_preds=None, the reference's KM quirk), and a
    half-precision zeroshot matrix."""
    ds, fm = cfg.data.dataset_name, cfg.feature.feat_model
    os.makedirs(os.path.join(root, "extracted_features"))
    os.makedirs(os.path.join(root, "cluster"))
    os.makedirs(os.path.join(root, "zeroshot_weights"))

    mask_lab = rng.random(n) < 0.4
    made = {}
    for name, dim in ((f"{fm}_{ds}_all.pt", d), (f"clip_{ds}_all.pt", d + 2)):
        made[name] = {
            "all_feats": rng.standard_normal((n, dim)).astype(np.float32),
            "mask_lab": mask_lab,
            "mask_cls": rng.random(n) < 0.5,
            "targets": rng.integers(0, k, n).astype(np.int64),
        }
        torch.save(made[name],
                   os.path.join(root, "extracted_features", name))

    n_u = int((~mask_lab).sum())
    made["cluster"] = {
        "all_preds": None,  # KM branch, main_unsup.py:336
        "u_preds": rng.integers(0, k, n_u).astype(np.int64),
        "u_targets": rng.integers(0, k, n_u).astype(np.int64),
        "mask": rng.random(n_u) < 0.5,
    }
    torch.save(made["cluster"],
               os.path.join(root, "cluster", f"KM_{fm}_{ds}_{k}.pt"))

    zw = torch.randn(d + 2, v, dtype=torch.float16)
    zw = zw / zw.norm(dim=0, keepdim=True)
    torch.save(zw, os.path.join(root, "zeroshot_weights",
                                "zeroshot_weights_all_nouns_vit_b_16.pt"))
    made["zeroshot"] = zw
    return made


@pytest.fixture
def cfg(tmp_path):
    cfg = PipelineConfig()
    cfg = cfg.replace(
        data=cfg.data.__class__(dataset_name="imagenet_100",
                                cache_dir=str(tmp_path / "cache")),
        cluster=cfg.cluster.__class__(algorithm="KM", n_clusters=5),
    )
    return cfg


def test_import_reference_artifacts_round_trip(tmp_path, cfg):
    rng = np.random.default_rng(0)
    ref_root = str(tmp_path / "ref")
    made = _fabricate_reference_root(ref_root, cfg, rng)

    imported = import_reference_artifacts(ref_root, cfg)
    assert set(imported) == {"features_feat", "features_clip", "cluster",
                             "zeroshot"}

    cache = stage_cache(cfg)
    ds, fm = cfg.data.dataset_name, cfg.feature.feat_model
    feats = cache.load("features", feature_cache_key(cfg, "feat"))
    src = made[f"{fm}_{ds}_all.pt"]
    np.testing.assert_array_equal(feats["all_feats"], src["all_feats"])
    np.testing.assert_array_equal(feats["mask_lab"], src["mask_lab"])
    np.testing.assert_array_equal(feats["targets"], src["targets"])

    clus = cache.load("cluster", cluster_cache_key(cfg))
    np.testing.assert_array_equal(clus["u_preds"], made["cluster"]["u_preds"])
    np.testing.assert_array_equal(clus["mask"],
                                  made["cluster"]["mask"].astype(bool))
    # KM's all_preds=None round-trips as the -1 sentinel run_clustering uses
    assert (clus["all_preds"] == -1).all()
    assert clus["all_preds"].shape == clus["u_preds"].shape

    # the zeroshot import lands on the key load_zeroshot_weights reads,
    # promoted fp16 -> f32
    zw = load_zeroshot_weights(cfg, cache, encode_text=None, nouns=None)
    assert zw.dtype == np.float32
    np.testing.assert_allclose(
        zw, made["zeroshot"].float().numpy(), rtol=0, atol=0)


def test_import_feature_shape_mismatch_raises(tmp_path, cfg):
    bad = {"all_feats": np.zeros((4, 3), np.float32),
           "mask_lab": np.zeros(5, bool),
           "mask_cls": np.zeros(4, bool),
           "targets": np.zeros(4, np.int64)}
    p = str(tmp_path / "bad.pt")
    torch.save(bad, p)
    with pytest.raises(ValueError, match="mask_lab"):
        import_reference_features(p, cfg, "feat")


def test_import_zeroshot_rank_check(tmp_path, cfg):
    p = str(tmp_path / "zw.pt")
    torch.save(torch.zeros(7), p)
    with pytest.raises(ValueError, match="D, V"):
        import_reference_zeroshot(p, cfg)


def test_import_cluster_tensor_all_preds(tmp_path, cfg):
    """SSKM/ConSSKM save real all_preds tensors; they must survive."""
    d = {"all_preds": torch.arange(10), "u_preds": np.arange(6),
         "u_targets": np.arange(6), "mask": np.ones(6, bool)}
    p = str(tmp_path / "c.pt")
    torch.save(d, p)
    import_reference_cluster(p, cfg)
    clus = stage_cache(cfg).load("cluster", cluster_cache_key(cfg))
    np.testing.assert_array_equal(clus["all_preds"], np.arange(10))
