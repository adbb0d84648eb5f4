"""End-to-end CLI tests: extract -> runners/estimate_k/baselines, plus the
metric_learn entry point (reference launch scripts in ``scripts/`` and
``gcd/bash_scripts/``)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def feature_store(tmp_path_factory):
    from scd_tpu.pipelines.extract import main as extract_main

    d = tmp_path_factory.mktemp("feats")
    out = extract_main(["--dataset_name", "synthetic", "--feat_model",
                        "synthetic", "--save_dir", str(d), "--tree"])
    assert out["train"]["features"].shape[0] > 0
    return d


def test_extract_packed_and_tree(feature_store):
    import os

    packed = np.load(feature_store / "train" / "features_packed.npz")
    assert {"features", "uq_idxs", "targets", "mask_lab"} <= set(packed.files)
    # tree layout exists per label dir
    labels = [d for d in os.listdir(feature_store / "train")
              if (feature_store / "train" / d).is_dir()]
    assert len(labels) > 0


def test_feature_vector_dataset_roundtrip(feature_store):
    from scd_tpu.data.features import FeatureVectorDataset

    class _Base:
        def __init__(self, targets, uqs):
            self.t, self.u = targets, uqs

        def __len__(self):
            return len(self.t)

        def __getitem__(self, i):
            return None, int(self.t[i]), int(self.u[i])

    z = np.load(feature_store / "train" / "features_packed.npz")
    ds = FeatureVectorDataset(_Base(z["targets"], z["uq_idxs"]),
                              str(feature_store / "train"))
    feat, label, uq = ds[0]
    np.testing.assert_allclose(feat, z["features"][0], atol=1e-6)


def test_runners_cli(feature_store, capsys):
    from scd_tpu.cluster.runners import main as runners_main

    runners_main(["--features",
                  str(feature_store / "train" / "features_packed.npz"),
                  "--n_train_classes", "5", "--semi_sup", "--K", "10",
                  "--n_init", "3", "--eval_funcs", "v2"])
    out = capsys.readouterr().out
    assert "SS-K-Means" in out


def test_estimate_k_cli_dummy(capsys):
    from scd_tpu.cluster.estimate_k import main as ek_main

    best_k, best_acc = ek_main(["--min_k", "10", "--max_k", "1000",
                                "--search_mode", "binary"])
    assert 10 <= best_k <= 1000 and best_acc > 0


def test_baseline_cli_uno(feature_store, capsys):
    from scd_tpu.train.run_baseline import main as bl_main

    (all_acc, _o, _n), history = bl_main(
        ["--method", "uno", "--features",
         str(feature_store / "train" / "features_packed.npz"),
         "--n_labeled", "5", "--epochs", "2", "--batch_size", "64"])
    assert np.isfinite(history[-1])


def test_baseline_cli_supervised(feature_store):
    from scd_tpu.train.run_baseline import main as bl_main

    (all_acc, old_acc, _n), _h = bl_main(
        ["--method", "supervised", "--features",
         str(feature_store / "train" / "features_packed.npz"),
         "--n_labeled", "5", "--epochs", "5"])
    assert old_acc > 0.5  # separable synthetic blobs


def test_combine_sskm_old_pinned_new_clustered():
    """The combine evaluator pairs the classifier with SEMI-SUPERVISED
    k-means (reference ``combine_classifier_and_kmeans.py:46-121``): Old
    classes keep classifier predictions; New-class instances the classifier
    rejects get SSKM cluster ids whose Old block is pinned by the labelled
    data (so an Old-class cluster id == the true class id)."""
    import jax

    from scd_tpu.train.run_baseline import _combine_cluster_preds
    from scd_tpu.train.baselines import combine_classifier_and_cluster_preds

    rng = np.random.default_rng(0)
    n_per, n_lab_cls, n_cls, d = 40, 2, 4, 16
    centers = rng.standard_normal((n_cls, d)).astype(np.float32) * 6
    feats = np.concatenate([centers[c] + 0.2 * rng.standard_normal(
        (n_per, d)).astype(np.float32) for c in range(n_cls)])
    targets = np.repeat(np.arange(n_cls), n_per)
    mask_lab = (targets < n_lab_cls) & (np.arange(len(targets)) % 2 == 0)

    cluster_preds = _combine_cluster_preds(
        jax.random.PRNGKey(0), feats, targets, mask_lab, n_lab_cls,
        n_cls - n_lab_cls, backend="sskm")
    # labelled pinning makes Old clusters carry true class ids
    old = targets < n_lab_cls
    assert (cluster_preds[old] == targets[old]).mean() > 0.9

    # classifier confident on Old, abstains (-1) on New
    cls_preds = np.where(old, targets, -1)
    preds = combine_classifier_and_cluster_preds(cls_preds, cluster_preds,
                                                 n_lab_cls)
    np.testing.assert_array_equal(preds[old], targets[old])
    # New instances fall through to cluster ids outside the Old block
    assert (preds[~old] >= n_lab_cls).all()


def test_metric_learn_cli(tmp_path):
    from scd_tpu.train.metric_learn import main as ml_main

    out = ml_main(["--dataset_name", "synthetic", "--epochs", "1",
                   "--vit", "micro", "--image_size", "32",
                   "--batch_size", "8", "--steps_per_epoch", "2",
                   "--proj_dim", "32", "--grad_from_block", "0",
                   "--max_kmeans_iter", "10",
                   "--exp_root", str(tmp_path)])
    assert "loss" in out["last"] and "old_acc_train" in out["last"]
    # best checkpoint restorable
    step, _state = out["ckpt"].restore_best(out["trainer"].state)
    assert step == 0


def test_baseline_e2e_cli_uno():
    from scd_tpu.train.run_baseline_e2e import main as e2e_main

    state, history = e2e_main(
        ["--method", "uno", "--dataset_name", "synthetic", "--vit", "micro",
         "--image_size", "32", "--epochs", "1", "--batch_size", "32",
         "--num_heads", "2"])
    assert len(history) == 1 and np.isfinite(history[0]["loss"])
    assert "acc" in history[0] and 0 <= history[0]["acc"] <= 1


def test_combine_sskm_remaps_absent_labelled_class():
    """fit_sskm compresses labelled targets through np.unique; the combine
    helper must map cluster ids back to TRUE class ids even when a labelled
    class has no labelled instances (non-contiguous present set), and free
    clusters must stay outside the Old block."""
    import jax

    from scd_tpu.train.run_baseline import _combine_cluster_preds

    rng = np.random.default_rng(0)
    n_per, n_lab_cls, n_cls, d = 30, 4, 6, 16
    centers = rng.standard_normal((n_cls, d)).astype(np.float32) * 6
    feats = np.concatenate([centers[c] + 0.2 * rng.standard_normal(
        (n_per, d)).astype(np.float32) for c in range(n_cls)])
    targets = np.repeat(np.arange(n_cls), n_per)
    # class 2 is a labelled class with NO labelled rows
    mask = np.isin(targets, [0, 1, 3]) & (np.arange(len(targets)) % 2 == 0)
    preds = _combine_cluster_preds(jax.random.PRNGKey(0), feats, targets,
                                   mask, n_lab_cls, n_cls - n_lab_cls)
    for c in (0, 1, 3):
        assert (preds[targets == c] == c).mean() > 0.9
    assert preds[targets >= n_lab_cls].min() >= n_lab_cls
