"""K-means evaluation runner tests (reference
``gcd/methods/clustering/k_means.py`` / ``k_means_stratified.py``)."""

import os
import pickle

import jax
import numpy as np
import pytest

from scd_tpu.core.config import ClusterConfig
from scd_tpu.cluster import (
    collate_features,
    eval_kmeans,
    eval_kmeans_optimal,
    eval_kmeans_semi_sup,
    eval_kmeans_semi_sup_stratified,
    load_ssb_difficulty_splits,
    stratified_accs,
)

from conftest import make_blobs


def _split(n_classes=8, per=40, d=16, n_old=4, seed=2):
    X, y = make_blobs(n_samples=n_classes * per, n_features=d,
                      centers=n_classes, seed=seed)
    mask_cls = y < n_old
    rng = np.random.default_rng(0)
    # labelled: half of the Old-class instances
    mask_lab = mask_cls & (rng.random(len(y)) < 0.5)
    return X, y.astype(np.int64), mask_cls, mask_lab


def test_eval_kmeans_optimal_near_perfect_on_blobs():
    X, y, mask_cls, mask_lab = _split()
    all_acc, old_acc, new_acc, u_preds = eval_kmeans_optimal(
        X, y, mask_cls, mask_lab, print_output=False)
    assert all_acc > 0.95 and old_acc > 0.9 and new_acc > 0.9
    assert u_preds.shape == ((~mask_lab).sum(),)


def test_eval_kmeans_plain():
    X, y, mask_cls, _ = _split()
    all_acc, old_acc, new_acc, res = eval_kmeans(
        jax.random.PRNGKey(0), X, y, mask_cls,
        ClusterConfig(n_clusters=8, n_init=4, max_iterations=50),
        print_output=False)
    assert all_acc > 0.9
    assert res.labels.shape == (len(y),)


def test_eval_kmeans_semi_sup():
    X, y, mask_cls, mask_lab = _split()
    all_acc, old_acc, new_acc, u_preds, _res = eval_kmeans_semi_sup(
        jax.random.PRNGKey(0), X, y, mask_cls, mask_lab,
        ClusterConfig(n_clusters=8, n_init=4, max_iterations=50),
        print_output=False)
    assert all_acc > 0.9
    assert len(u_preds) == (~mask_lab).sum()


def test_stratified_accs_masks_by_difficulty():
    X, y, mask_cls, mask_lab = _split()
    u_targets = y[~mask_lab]
    # perfect preds -> every stratum reports 1.0
    strata = stratified_accs(
        u_targets, u_targets.copy(), mask_cls[~mask_lab],
        {"Easy": [4, 5], "Medium": [6], "Hard": [7]},
        train_classes=range(4), unlabeled_classes=range(4, 8),
        print_output=False)
    for diff in ("Easy", "Medium", "Hard"):
        assert strata[diff][0] == pytest.approx(1.0)


def test_eval_kmeans_semi_sup_stratified():
    X, y, mask_cls, mask_lab = _split()
    overall, strata, u_preds = eval_kmeans_semi_sup_stratified(
        jax.random.PRNGKey(0), X, y, mask_cls, mask_lab,
        ClusterConfig(n_clusters=8, n_init=4, max_iterations=50),
        {"Easy": [4, 5], "Medium": [6], "Hard": [7]},
        train_classes=range(4), unlabeled_classes=range(4, 8),
        print_output=False)
    assert overall[0] > 0.9
    assert set(strata) == {"Easy", "Medium", "Hard"}


def test_load_ssb_difficulty_splits(tmp_path):
    info = {"known_classes": [0, 1],
            "unknown_classes": {"Easy": [2], "Medium": [3], "Hard": [4]}}
    with open(tmp_path / "cub_osr_splits.pkl", "wb") as f:
        pickle.dump(info, f)
    splits = load_ssb_difficulty_splits("cub", str(tmp_path))
    assert splits == info["unknown_classes"]


def test_collate_features_normalizes(tmp_path):
    X, y, _, mask_lab = _split(n_classes=4, per=10, d=8, n_old=2)

    class _DS:
        def __len__(self):
            return len(y)

        def __getitem__(self, i):
            return X[i] * 3.0, y[i], i, bool(mask_lab[i])

    feats, targets, mask_cls, got_lab = collate_features(
        _DS(), n_train_classes=2, batch_size=16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(targets, y)
    np.testing.assert_array_equal(mask_cls, y < 2)
    np.testing.assert_array_equal(got_lab, mask_lab)
