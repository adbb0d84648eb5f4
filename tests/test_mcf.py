"""Native min-cost-flow solver tests, cross-validated three ways:
cost-scaling vs SSP vs networkx network_simplex."""

import numpy as np
import pytest

from scd_tpu.ops.native import constrained_assign, mcf_solve


def _random_mcf_instance(rng, n_nodes=12, n_arcs=40, max_cap=8, max_cost=20):
    tail = rng.integers(0, n_nodes, n_arcs).astype(np.int32)
    head = rng.integers(0, n_nodes, n_arcs).astype(np.int32)
    keep = tail != head
    tail, head = tail[keep], head[keep]
    n_arcs = len(tail)
    cap = rng.integers(1, max_cap + 1, n_arcs).astype(np.int32)
    cost = rng.integers(0, max_cost + 1, n_arcs).astype(np.int32)
    # route supply between two random nodes, amount bounded by max-flow;
    # keep it tiny so feasibility is likely
    supply = np.zeros(n_nodes, np.int32)
    s, t = 0, n_nodes - 1
    supply[s], supply[t] = 2, -2
    return tail, head, cap, cost, supply


def _nx_optimal_cost(tail, head, cap, cost, supply):
    import networkx as nx

    g = nx.MultiDiGraph()
    for i in range(len(supply)):
        g.add_node(i, demand=-int(supply[i]))
    for t, h, c, w in zip(tail, head, cap, cost):
        g.add_edge(int(t), int(h), capacity=int(c), weight=int(w))
    try:
        flow_cost, _ = nx.network_simplex(g)
        return flow_cost
    except nx.NetworkXUnfeasible:
        return None


@pytest.mark.parametrize("method", ["ssp", "cost_scaling"])
def test_mcf_simple_path(method):
    # 0 -> 1 -> 2 plus expensive direct 0 -> 2
    tail = np.array([0, 1, 0], np.int32)
    head = np.array([1, 2, 2], np.int32)
    cap = np.array([5, 5, 5], np.int32)
    cost = np.array([1, 1, 10], np.int32)
    supply = np.array([3, 0, -3], np.int32)
    flow = mcf_solve(tail, head, cap, cost, supply, method=method)
    np.testing.assert_array_equal(flow, [3, 3, 0])


@pytest.mark.parametrize("method", ["ssp", "cost_scaling"])
def test_mcf_capacity_forces_split(method):
    tail = np.array([0, 1, 0], np.int32)
    head = np.array([1, 2, 2], np.int32)
    cap = np.array([2, 2, 5], np.int32)
    cost = np.array([1, 1, 10], np.int32)
    supply = np.array([3, 0, -3], np.int32)
    flow = mcf_solve(tail, head, cap, cost, supply, method=method)
    np.testing.assert_array_equal(flow, [2, 2, 1])


def test_mcf_random_instances_match_networkx(rng):
    n_ok = 0
    for trial in range(20):
        tail, head, cap, cost, supply = _random_mcf_instance(rng)
        ref_cost = _nx_optimal_cost(tail, head, cap, cost, supply)
        if ref_cost is None:
            continue
        n_ok += 1
        for method in ("ssp", "cost_scaling"):
            flow = mcf_solve(tail, head, cap, cost, supply, method=method)
            assert (flow >= 0).all() and (flow <= cap).all()
            # flow conservation with supplies
            net = np.zeros(len(supply), np.int64)
            np.subtract.at(net, tail, flow)
            np.add.at(net, head, flow)
            np.testing.assert_array_equal(net, -supply.astype(np.int64))
            assert int((flow * cost).sum()) == ref_cost, method
    assert n_ok >= 5  # enough feasible instances actually checked


@pytest.mark.parametrize("method", ["ssp", "cost_scaling"])
def test_constrained_assign_basic(method):
    # 6 points, 2 clusters; unconstrained argmin puts all in cluster 0
    costs = np.array([[0, 10]] * 6, np.int32)
    labels = constrained_assign(costs, size_min=2, size_max=4, method=method)
    counts = np.bincount(labels, minlength=2)
    assert counts.min() >= 2 and counts.max() <= 4


@pytest.mark.parametrize("method", ["ssp", "cost_scaling"])
def test_constrained_assign_prefers_cheap_moves(method):
    # points 0-3 strongly prefer cluster 0; points 4,5 mildly prefer 0.
    # size_max=4 forces two points out: the mild ones must move.
    costs = np.array([[0, 100], [0, 100], [0, 100], [0, 100],
                      [0, 1], [0, 1]], np.int32)
    labels = constrained_assign(costs, size_min=0, size_max=4, method=method)
    np.testing.assert_array_equal(labels[:4], 0)
    np.testing.assert_array_equal(labels[4:], 1)


def test_constrained_assign_methods_agree(rng):
    for _ in range(5):
        costs = rng.integers(0, 1000, (40, 5)).astype(np.int32)
        la = constrained_assign(costs, 4, 12, method="ssp")
        lb = constrained_assign(costs, 4, 12, method="cost_scaling")
        # optimal assignments may differ under ties; total cost must match
        ca = costs[np.arange(40), la].sum()
        cb = costs[np.arange(40), lb].sum()
        assert ca == cb
        for lab in (la, lb):
            counts = np.bincount(lab, minlength=5)
            assert counts.min() >= 4 and counts.max() <= 12


def test_constrained_assign_infeasible():
    costs = np.zeros((3, 2), np.int32)
    with pytest.raises(ValueError):
        constrained_assign(costs, size_min=2, size_max=5)  # 2*2 > 3
    with pytest.raises(ValueError):
        constrained_assign(costs, size_min=0, size_max=1)  # 2*1 < 3


def test_constrained_assign_sparse_matches_dense(rng):
    """The sparse candidate-arc pricing path (column generation with a
    reduced-cost optimality certificate) must return a flow of exactly the
    same total cost as the dense solve — it is exact, not approximate."""
    for trial in range(3):
        n, k = 600, 12
        pts = rng.standard_normal((n, 6))
        cent = rng.standard_normal((k, 6)) * 2
        c2 = ((pts[:, None] - cent[None]) ** 2).sum(-1)
        costs = np.around(np.sqrt(c2) * 1000).astype(np.int32)
        lo, hi = n // k // 2, n // k * 3
        la = constrained_assign(costs, lo, hi, method="cost_scaling")
        lb = constrained_assign(costs, lo, hi, method="sparse")
        ca = costs[np.arange(n), la].sum()
        cb = costs[np.arange(n), lb].sum()
        assert ca == cb
        sizes = np.bincount(lb, minlength=k)
        assert sizes.min() >= lo and sizes.max() <= hi


def test_constrained_assign_sparse_correlated_preferences(rng):
    """Adversarial case: every point prefers the same few clusters, so the
    initial candidate set is infeasible.  The max-flow feasibility gate
    must densify (or bail to dense) instead of price-churning, and the
    result must still be optimal."""
    n, k = 800, 40  # k > the 16 initial row candidates, so the gate engages
    base = rng.random(k) * 10  # shared cluster ranking for every point
    costs = np.around((base[None] + 0.001 * rng.random((n, k))) * 1000).astype(np.int32)
    lo, hi = 15, 25  # tight: the 16 shared favorites cannot hold everyone
    la = constrained_assign(costs, lo, hi, method="cost_scaling")
    lb = constrained_assign(costs, lo, hi, method="sparse")
    assert costs[np.arange(n), la].sum() == costs[np.arange(n), lb].sum()
    sizes = np.bincount(lb, minlength=k)
    assert sizes.min() >= lo and sizes.max() <= hi


def test_constrained_assign_row_offset_invariance(rng):
    """Adding a per-row constant must not change the assignment cost
    structure (each point is assigned exactly once) — guards the row
    normalization the native solver applies."""
    n, k = 200, 8
    costs = rng.integers(0, 1000, (n, k)).astype(np.int32)
    offset = rng.integers(0, 100000, (n, 1)).astype(np.int32)
    la = constrained_assign(costs, 10, 50, method="cost_scaling")
    lb = constrained_assign(costs + offset, 10, 50, method="cost_scaling")
    ca = costs[np.arange(n), la].sum()
    cb = costs[np.arange(n), lb].sum()
    assert ca == cb
