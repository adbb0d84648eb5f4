"""On-device assignment ops vs scipy/numpy oracles (reference host paths:
``local_utils/linear_assignment.py``, contingency loop in
``cluster_and_log_utils.py:50-51``)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from scd_tpu.ops.assignment import (auction_assignment,
                                    contingency_matrix_device,
                                    linear_assignment_device)


def test_contingency_device_matches_numpy(rng):
    y_pred = rng.integers(0, 7, 500)
    y_true = rng.integers(0, 9, 500)
    got = np.asarray(contingency_matrix_device(y_pred, y_true, 7, 9))
    ref = np.zeros((7, 9), int)
    for p, t in zip(y_pred, y_true):
        ref[p, t] += 1
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n", [3, 10, 64, 200])
def test_auction_optimal_on_integer_profits(rng, n):
    profit = rng.integers(0, 50, (n, n)).astype(np.float64)
    assign = auction_assignment(profit)
    # valid permutation
    assert sorted(assign) == list(range(n))
    # exact optimal total (eps < 1/n on integer profits)
    _r, c = linear_sum_assignment(-profit)
    got = profit[np.arange(n), assign].sum()
    opt = profit[np.arange(n), c].sum()
    assert got == pytest.approx(opt)


def test_auction_float_near_optimal(rng):
    n = 50
    profit = rng.standard_normal((n, n))
    assign = auction_assignment(profit, eps=1e-4)
    _r, c = linear_sum_assignment(-profit)
    got = profit[np.arange(n), assign].sum()
    opt = profit[np.arange(n), c].sum()
    assert got >= opt - n * 1e-4  # auction eps-optimality bound


def test_linear_assignment_device_contract(rng):
    cost = rng.integers(0, 30, (12, 12)).astype(float)
    ind = linear_assignment_device(cost)
    assert ind.shape == (12, 2)
    np.testing.assert_array_equal(ind[:, 0], np.arange(12))
    r, c = linear_sum_assignment(cost)
    assert cost[ind[:, 0], ind[:, 1]].sum() == pytest.approx(
        cost[r, c].sum())
