"""On-device assignment ops: contingency matrix + auction algorithm.

The reference solves every cluster<->class / cluster<->name matching with a
host Munkres state machine (``local_utils/linear_assignment.py:29-289``)
over a Python-loop contingency build (``cluster_and_log_utils.py:50-51``).
Host scipy remains the parity path (``scd_tpu.metrics.cluster``); this
module provides the TPU-native equivalents for device-resident pipelines
(SURVEY §7 hard-part #4: the auction algorithm maps well to TPU — each
bidding round is dense vectorized work).

``auction_assignment`` implements Bertsekas' auction with Jacobi (parallel)
bidding.  For integer profit matrices and ``eps < 1/n`` the result attains
the exact optimal total (the classic optimality bound); vote matrices are
integer counts, so device voting can use it with no approximation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_rows", "n_cols"))
def contingency_matrix_device(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                              n_rows: int, n_cols: int) -> jnp.ndarray:
    """[n_rows, n_cols] counts of (pred, true) pairs — one scatter-add."""
    flat = y_pred.astype(jnp.int32) * n_cols + y_true.astype(jnp.int32)
    counts = jnp.zeros((n_rows * n_cols,), jnp.int32).at[flat].add(1)
    return counts.reshape(n_rows, n_cols)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _auction_device(profit: jnp.ndarray, eps: jnp.ndarray,
                    max_iters: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = profit.shape[0]
    big_neg = jnp.float32(-1e30)

    def cond(state):
        it, person_to_obj, _prices = state
        return jnp.logical_and(jnp.any(person_to_obj < 0), it < max_iters)

    def body(state):
        it, person_to_obj, prices = state
        unassigned = person_to_obj < 0  # [n]

        value = profit - prices[None, :]  # [n, n]
        # top-2 values per person
        best_j = jnp.argmax(value, axis=1)  # [n]
        v1 = jnp.take_along_axis(value, best_j[:, None], axis=1)[:, 0]
        masked = value.at[jnp.arange(n), best_j].set(big_neg)
        v2 = jnp.max(masked, axis=1)
        bid = prices[best_j] + (v1 - v2) + eps  # [n]
        bid = jnp.where(unassigned, bid, big_neg)

        # per-object highest bid (scatter-max over bidders)
        obj_bid = jnp.full((n,), big_neg).at[best_j].max(bid)
        has_bid = obj_bid > big_neg / 2
        # winner: the bidder whose bid equals the object max (ties: lowest i)
        is_winner = (bid[:, None] >= obj_bid[None, :]) \
            & (jnp.arange(n)[None, :] == best_j[:, None]) \
            & unassigned[:, None]
        winner = jnp.argmax(is_winner, axis=0)  # [n] per object

        # evict previous owner of objects that received bids
        owned = jnp.where(person_to_obj >= 0, person_to_obj, 0)
        evict = ((person_to_obj >= 0) & has_bid[owned]
                 & (winner[owned] != jnp.arange(n)))
        person_to_obj = jnp.where(evict, -1, person_to_obj)
        # assign winners (drop scatters from objects without bids)
        won_obj = jnp.full((n,), -1, jnp.int32).at[
            jnp.where(has_bid, winner, n)].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        person_to_obj = jnp.where(won_obj >= 0, won_obj, person_to_obj)
        prices = jnp.where(has_bid, obj_bid, prices)
        return it + 1, person_to_obj, prices

    init = (jnp.zeros((), jnp.int32),
            jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32))
    it, person_to_obj, _ = jax.lax.while_loop(cond, body, init)
    return person_to_obj, it


def auction_assignment(profit: np.ndarray, eps: Optional[float] = None,
                       max_iters: int = 100_000) -> np.ndarray:
    """Maximize ``sum(profit[i, assign[i]])`` over permutations; returns
    ``assign`` [n] (person -> object).  Exact for integer profits with the
    default ``eps = 1/(n+1)``."""
    profit = np.asarray(profit, np.float64)
    assert profit.ndim == 2 and profit.shape[0] == profit.shape[1], \
        "auction_assignment expects a square profit matrix (pad if needed)"
    n = profit.shape[0]
    # center: prices track profit magnitudes, and once price ulp exceeds eps
    # the float32 update `price + (v1-v2) + eps` stalls (two bidders evict
    # each other forever).  Subtracting the max bounds prices by the profit
    # RANGE instead of its absolute scale; assignment is shift-invariant.
    profit = profit - profit.max()
    profit32 = profit.astype(np.float32)
    if eps is None:
        eps = 1.0 / (n + 1)
    if np.float32(profit32.min()) - np.float32(eps) == np.float32(profit32.min()):
        # range so large eps is below ulp even after centering: exact host solve
        from scipy.optimize import linear_sum_assignment

        _r, c = linear_sum_assignment(-profit)
        return c.astype(np.int64)
    assign, _it = _auction_device(jnp.asarray(profit32),
                                  jnp.float32(eps), max_iters)
    assign = np.asarray(assign)
    if (assign < 0).any():  # max_iters hit — fall back to exact host solve
        from scipy.optimize import linear_sum_assignment

        _r, c = linear_sum_assignment(-profit)
        return c.astype(np.int64)
    return assign.astype(np.int64)


def linear_assignment_device(cost: np.ndarray) -> np.ndarray:
    """Drop-in for ``scd_tpu.metrics.cluster.linear_assignment`` (min-cost,
    [[row, col], ...] sorted by row) running the auction on device."""
    cost = np.asarray(cost, np.float32)
    assign = auction_assignment(-cost)
    return np.stack([np.arange(len(assign)), assign], axis=1)
