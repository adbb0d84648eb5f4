"""Metric parity tests.

The v2 golden example reproduces the hand-worked contingency case from the
reference's ``gcd/notebooks/demo_acc_v2.ipynb`` style check: old classes map
identically, new classes permute, expected old/new accuracies are derivable
by hand.
"""

import numpy as np
import pytest

from scd_tpu.metrics import (
    cluster_acc,
    evaluate_clustering,
    evaluate_semantic_acc,
    name_set_iou,
    purity_score,
    split_cluster_acc_v1,
    split_cluster_acc_v2,
    split_cluster_acc_v3,
)
from scd_tpu.metrics.cluster import contingency_matrix, linear_assignment


def test_contingency():
    y_pred = np.array([0, 0, 1, 1, 2])
    y_true = np.array([1, 1, 0, 1, 2])
    w = contingency_matrix(y_pred, y_true)
    assert w.shape == (3, 3)
    assert w[0, 1] == 2 and w[1, 0] == 1 and w[1, 1] == 1 and w[2, 2] == 1
    assert w.sum() == 5


def test_linear_assignment_identity():
    cost = np.array([[0, 9, 9], [9, 0, 9], [9, 9, 0]])
    ind = linear_assignment(cost)
    np.testing.assert_array_equal(ind, [[0, 0], [1, 1], [2, 2]])


def test_cluster_acc_permutation_invariance(rng):
    y = rng.integers(0, 5, size=200)
    perm = rng.permutation(5)
    y_pred = perm[y]
    assert cluster_acc(y, y_pred) == 1.0


def test_cluster_acc_known_value():
    # 10 points, clusters 0<->1 swapped for 8, 2 errors
    y_true = np.array([0] * 5 + [1] * 5)
    y_pred = np.array([1, 1, 1, 1, 0, 0, 0, 0, 0, 1])
    # optimal: pred1->true0 (4 hits), pred0->true1 (4 hits) => 8/10
    assert cluster_acc(y_true, y_pred) == pytest.approx(0.8)


def _v2_fixture():
    """Old classes {0,1} (mask True), new classes {2,3}. Predictions where the
    global Hungarian maps pred i -> true i, with controlled error counts."""
    y_true = np.array([0] * 10 + [1] * 10 + [2] * 10 + [3] * 10)
    y_pred = y_true.copy()
    # introduce 2 errors in old class 0, 1 error in old class 1,
    # 1 error in new class 2, 1 error in new class 3
    y_pred[0:2] = 1
    y_pred[10] = 0
    y_pred[20] = 3
    y_pred[30] = 2
    mask = np.array([True] * 20 + [False] * 20)
    return y_true, y_pred, mask


def test_split_v2_golden():
    y_true, y_pred, mask = _v2_fixture()
    all_acc, old_acc, new_acc = split_cluster_acc_v2(y_true, y_pred, mask)
    assert all_acc == pytest.approx(35 / 40)
    assert old_acc == pytest.approx(17 / 20)
    assert new_acc == pytest.approx(18 / 20)


def test_split_v2_ind_map():
    y_true, y_pred, mask = _v2_fixture()
    *_, ind_map = split_cluster_acc_v2(y_true, y_pred, mask, return_ind_map=True)
    assert ind_map == {0: 0, 1: 1, 2: 2, 3: 3}


def test_split_v1_independent():
    y_true, y_pred, mask = _v2_fixture()
    total, old, new = split_cluster_acc_v1(y_true, y_pred, mask)
    assert total == pytest.approx(mask.mean() * old + (1 - mask.mean()) * new)


def test_split_v3_identity_on_old():
    y_true, y_pred, mask = _v2_fixture()
    all_acc, old_acc, new_acc = split_cluster_acc_v3(y_true, y_pred, mask)
    # v3 forces identity on old classes; fixture already identity-aligned
    assert old_acc == pytest.approx(17 / 20)
    assert new_acc == pytest.approx(18 / 20)
    assert all_acc == pytest.approx(35 / 40)


def test_purity_and_bundle(rng):
    y = rng.integers(0, 4, 100)
    res = evaluate_clustering(y, y)
    assert res["acc"] == 1.0 and res["nmi"] == pytest.approx(1.0)
    assert res["ari"] == pytest.approx(1.0) and res["purity"] == 1.0


def test_semantic_acc():
    cidx_to_cname = {0: "dog", 1: "cat", 2: "fox"}
    cand_names = ["dog", "wolf", "fox"]
    u_targets = [0, 0, 1, 2, 2, 2]
    u_preds = [0, 1, 1, 2, 2, 0]
    # matches: t0/p0 dog==dog hit; t0/p1 wolf!=dog; t1/p1 wolf!=cat;
    # t2/p2 fox==fox hit x2; t2/p0 dog!=fox
    avg, overall = evaluate_semantic_acc(u_targets, cidx_to_cname, u_preds, cand_names)
    assert overall == pytest.approx(3 / 6)
    # per-class: dog 1/2, cat 0/1, fox 2/3 -> avg (0.5 + 0 + 2/3)/3
    assert avg == pytest.approx((0.5 + 0.0 + 2 / 3) / 3)


def test_soft_semantic_acc_table():
    from scd_tpu.metrics.semantic import soft_semantic_acc_from_table

    sim = np.array([[2.0, 1.0], [1.0, 2.0]])
    u_targets = np.array([0, 1])
    u_preds = np.array([0, 0])
    tni = np.array([0, 1])
    pni = np.array([0, 1])
    # sims: [sim[0,0]=2, sim[0,1]=1] -> normalized [1, .5] -> mean .75
    val = soft_semantic_acc_from_table(u_targets, u_preds, tni, pni, sim)
    assert val == pytest.approx(0.75)


def test_name_set_iou():
    assert name_set_iou(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
