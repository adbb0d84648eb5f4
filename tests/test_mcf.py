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
