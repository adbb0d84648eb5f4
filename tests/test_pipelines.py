"""End-to-end pipeline tests on the synthetic dataset (no assets needed).
This is the 'minimum end-to-end slice' (SURVEY §7): features -> clustering ->
voting loop -> ACC/sACC printouts."""

import numpy as np
import pytest

from scd_tpu.core.config import (
    ClusterConfig,
    DataConfig,
    FeatureConfig,
    NamingConfig,
    PipelineConfig,
)


def make_cfg(tmp_path, **cluster_kw):
    ckw = dict(algorithm="SSKM", n_clusters=10, n_init=3, max_iterations=20)
    ckw.update(cluster_kw)
    return PipelineConfig(
        data=DataConfig(dataset_name="synthetic", cache_dir=str(tmp_path)),
        feature=FeatureConfig(feat_model="synthetic"),
        cluster=ClusterConfig(**ckw),
        naming=NamingConfig(corpus="synthetic", topk=5, num_common_vote=5,
                            num_common_linear=3),
    )


def test_unsup_pipeline_synthetic(tmp_path, capsys):
    from scd_tpu.pipelines.unsup import run_unsup

    res = run_unsup(make_cfg(tmp_path))
    all_acc, old_acc, new_acc = res["cluster_acc"]
    assert all_acc > 0.9
    assert res["iou"] > 0.8
    # final sACC from the last voting iteration
    assert res["history"][-1]["sacc_all_All"] > 0.9
    out = capsys.readouterr().out
    assert "Accuracies: All" in out and "ACC/sACC_avg/sACC_all" in out
    assert "IoU:" in out


def test_unsup_pipeline_cache_reentry(tmp_path):
    from scd_tpu.pipelines.unsup import run_unsup

    cfg = make_cfg(tmp_path)
    res1 = run_unsup(cfg)
    # second run re-enters from cached features + clusters
    res2 = run_unsup(cfg)
    assert res1["cluster_acc"] == res2["cluster_acc"]
    np.testing.assert_array_equal(res1["voting"].u_preds, res2["voting"].u_preds)


def test_unsup_pipeline_km(tmp_path):
    from scd_tpu.pipelines.unsup import run_unsup

    res = run_unsup(make_cfg(tmp_path, algorithm="KM"))
    assert res["cluster_acc"][0] > 0.85


def test_unsup_pipeline_consskm(tmp_path):
    from scd_tpu.pipelines.unsup import run_unsup

    res = run_unsup(make_cfg(tmp_path, algorithm="ConSSKM", size_min=5,
                             size_max=40))
    assert res["cluster_acc"][0] > 0.85


def test_ptsup_pipeline_synthetic(tmp_path, capsys):
    from scd_tpu.pipelines.ptsup import run_ptsup

    res = run_ptsup(make_cfg(tmp_path))
    out = capsys.readouterr().out
    assert "sACC lower bound" in out and "sACC upper bound" in out
    lb_all = res["bounds"]["lb"][0]
    ub_all = res["bounds"]["ub"][0]
    assert ub_all >= lb_all  # restricting the vocab can only help
    assert ub_all > 90
    # labelled names must be pinned in the final candidates
    gt_names = list(res["cidx_to_cname"].values())
    assert set(gt_names[:5]) <= set(res["voting"].cand_names)
    assert res["iou"] > 0.8


def test_pipeline_cli_args():
    from scd_tpu.pipelines.unsup import build_argparser, config_from_args

    args = build_argparser().parse_args(
        ["--dataset_name", "synthetic", "--cluster", "KM",
         "--n_cluster", "7", "--topk", "3"])
    cfg = config_from_args(args)
    assert cfg.cluster.algorithm == "KM"
    assert cfg.cluster.n_clusters == 7
    assert cfg.naming.topk == 3
