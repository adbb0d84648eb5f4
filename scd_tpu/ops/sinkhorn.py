"""On-device size-constrained assignment via entropic OT + integral repair.

The reference solves its cluster-size-constrained E-step with a host-side
min-cost flow every Lloyd iteration, shipping the full distance matrix
GPU->CPU and labels back (``sskm_constrained.py:67,116`` — its main
structural bottleneck).  This module is the TPU-native alternative: the
whole E-step stays in one jitted computation.

1. **Sinkhorn scaling with column box constraints.**  Minimize <C, P> +
   eps*H(P) s.t. row sums = 1 (each point assigned once) and column sums in
   [size_min, size_max].  Alternating Bregman projections in the log domain:
   the row step is exact; the column step rescales each column into the box
   (the KL projection onto an interval constraint).  The repo's own UNO
   baseline uses the equality-constrained special case of this scheme
   (Sinkhorn-Knopp, reference ``gcd/methods/baselines/uno_v2.py:72``).

2. **Integral rounding + repair.**  Take labels = argmin_j (C_ij - g_j)
   (reduced cost under the learned column duals), then run vectorized
   repair passes: overfull clusters evict their cheapest-to-move members
   toward clusters with room; underfull clusters steal the cheapest-to-move
   members from clusters with spare capacity.  Both passes use a
   within-cluster ranking computed by one argsort — no Python loops.  The
   pass loop exits the moment counts are feasible (an exact no-op skip:
   feasible counts mean zero excess and zero deficit), which is the
   measured difference between 50.7 and 0.5 ms/step at N=65k, K=100 on
   v5e with realistic loose bounds (7.8 ms under forced rebalancing).

Returns a feasibility flag; callers fall back to the exact native
min-cost-flow solver (``scd_tpu.ops.native``) in the rare unconverged case.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ConstrainedAssignment(NamedTuple):
    labels: jnp.ndarray  # [N] int32
    feasible: jnp.ndarray  # scalar bool
    col_duals: jnp.ndarray  # [K] f32 (g)


def _sinkhorn_duals(cost: jnp.ndarray, size_min, size_max,
                    eps: float, iters: int,
                    row_mask: jnp.ndarray = None,
                    tol: float = 1e-6
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log-domain scaling; returns (f [N], g [K]) duals.  Rows where
    ``row_mask`` is False carry zero transport mass (sharding padding).

    Early exit: stops once the column-dual update falls below ``tol``
    (cost is unit-std normalized by the caller, so the threshold is
    scale-free).  This does NOT bound the remaining convergence tail — the
    whole dual track is approximate by contract (the entropic solution at
    the ``iters`` cap itself differs from the converged one; measured at
    eps=0.01 the capped duals flip ~0.15% of labels vs converged, and the
    ``tol=1e-6`` exit adds label churn of the same order).  Downstream the
    assignment is feasibility-checked and falls back to the exact MCF
    solver, so the stopping rule trades only which near-tie labels the
    repair passes start from.  A geometric tail-extrapolation stop was
    tried and measured WORSE (transiently small decay ratios collapse the
    bound and exit far too early)."""
    n, k = cost.shape
    f = jnp.zeros((n,), jnp.float32)
    g = jnp.zeros((k,), jnp.float32)
    log_lo = jnp.log(jnp.maximum(jnp.asarray(size_min, jnp.float32), 1e-9))
    log_hi = jnp.log(jnp.maximum(jnp.asarray(size_max, jnp.float32), 1e-9))

    def cond(state):
        i, _f, _g, delta = state
        return (i < iters) & (delta >= tol)

    def body(state):
        i, f, g, _ = state
        # row projection: real rows sum to exactly 1; padded rows get -inf
        # potential (zero mass everywhere)
        f = -eps * jax.nn.logsumexp((g[None, :] - cost) / eps, axis=1)
        if row_mask is not None:
            f = jnp.where(row_mask, f, -jnp.inf)
        # column box projection: scale columns into [size_min, size_max]
        log_col = jax.nn.logsumexp((f[:, None] + g[None, :] - cost) / eps,
                                   axis=0)  # log column sums
        target = jnp.clip(log_col, log_lo, log_hi)
        g_new = g + eps * (target - log_col)
        return i + 1, f, g_new, jnp.max(jnp.abs(g_new - g))

    _i, f, g, _d = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), f, g,
                     jnp.full((), jnp.inf, jnp.float32)))
    return f, g


def _within_cluster_rank(labels: jnp.ndarray, key: jnp.ndarray,
                         k: int) -> jnp.ndarray:
    """Rank of each point inside its cluster when ordered by ``key`` asc.
    Non-finite keys (callers use inf for non-candidates) rank last within
    their cluster — normalizing with inf present would NaN the composite
    sort key and corrupt every rank."""
    n = labels.shape[0]
    finite = jnp.isfinite(key)
    fmin = jnp.min(jnp.where(finite, key, jnp.inf))
    fmax = jnp.max(jnp.where(finite, key, -jnp.inf))
    kmin = jnp.where(jnp.any(finite), fmin, 0.0)
    kptp = jnp.maximum(jnp.where(jnp.any(finite), fmax, 1.0) - kmin, 1e-12)
    key_n = jnp.where(finite, (key - kmin) / kptp, 1.5)  # non-finite: last
    composite = labels.astype(jnp.float32) * 2.0 + key_n
    order = jnp.argsort(composite)
    pos = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    counts = jnp.bincount(labels, length=k)
    start = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                             jnp.cumsum(counts)[:-1]])
    return pos - start[labels].astype(jnp.int32)


def _evict_pass(cost, labels, g, size_min, size_max, k):
    """Move the cheapest members of overfull clusters to clusters with room.
    Padded rows carry ``labels == k`` (dropped by bincount) and never move:
    their regret is forced to inf."""
    real = labels < k
    labels_ix = jnp.minimum(labels, k - 1)  # safe gather index for pads
    counts = jnp.bincount(labels, length=k)
    excess = jnp.maximum(counts - size_max, 0)
    red = cost - g[None, :]
    cur = jnp.take_along_axis(red, labels_ix[:, None], axis=1)[:, 0]
    has_room = (counts < size_max)[None, :]
    not_self = jax.nn.one_hot(labels, k, dtype=jnp.bool_) == False  # noqa: E712
    allowed = has_room & not_self
    masked = jnp.where(allowed, red, jnp.inf)
    alt = jnp.min(masked, axis=1)
    alt_j = jnp.argmin(masked, axis=1).astype(jnp.int32)
    regret = jnp.where(jnp.isfinite(alt) & real, alt - cur, jnp.inf)
    rank = _within_cluster_rank(labels, regret, k)
    evict = (rank < excess[labels_ix]) & jnp.isfinite(regret) & real
    return jnp.where(evict, alt_j, labels)


def _steal_pass(cost, labels, g, size_min, size_max, k):
    """Move the cheapest outside members into underfull clusters.  Padded
    rows (``labels == k``) are never candidates."""
    real = labels < k
    labels_ix = jnp.minimum(labels, k - 1)
    counts = jnp.bincount(labels, length=k)
    deficit = jnp.maximum(size_min - counts, 0)
    red = cost - g[None, :]
    cur = jnp.take_along_axis(red, labels_ix[:, None], axis=1)[:, 0]
    # sources must keep >= size_min after losing a member
    src_spare = (counts > size_min)[labels_ix]
    dest_underfull = (deficit > 0)[None, :]
    masked = jnp.where(dest_underfull, red, jnp.inf)
    move_cost = jnp.min(masked, axis=1) - cur
    dest = jnp.argmin(masked, axis=1).astype(jnp.int32)
    candidate = src_spare & jnp.isfinite(move_cost) & real
    move_key = jnp.where(candidate, move_cost, jnp.inf)
    rank = _within_cluster_rank(dest, move_key, k)
    move = candidate & (rank < deficit[dest])
    return jnp.where(move, dest, labels)


@partial(jax.jit, static_argnames=("k", "iters", "repair_passes"))
def sinkhorn_constrained_assign(cost: jnp.ndarray, k: int,
                                size_min: int, size_max: int,
                                eps: float = 0.05, iters: int = 200,
                                repair_passes: int = 8,
                                row_mask: jnp.ndarray = None
                                ) -> ConstrainedAssignment:
    """Size-constrained assignment for cost matrix [N, K] (f32).

    ``cost`` should be on the scale of unit-norm distances (the ConSSKM
    caller passes sqrt of squared distances, matching the reference's MCF
    costs); ``eps`` is relative to the cost std.

    ``row_mask`` [N] bool marks real rows; padded rows (sharded runs pad the
    instance axis) carry no transport mass, take the sentinel label ``k``
    (excluded from every cluster count), and never participate in repair.
    """
    cost = cost.astype(jnp.float32)
    c_std = jnp.maximum(jnp.std(cost), 1e-6)
    cost_n = cost / c_std  # eps is hence relative to the cost std

    _f, g = _sinkhorn_duals(cost_n, size_min, size_max, eps, iters,
                            row_mask=row_mask)

    labels = jnp.argmin(cost_n - g[None, :], axis=1).astype(jnp.int32)
    if row_mask is not None:
        labels = jnp.where(row_mask, labels, k)

    def _feasible(lab):
        counts = jnp.bincount(lab, length=k)
        return jnp.all((counts >= size_min) & (counts <= size_max))

    # Early-exit repair: once the counts are feasible, excess and deficit
    # are both zero, so further evict/steal passes are exact no-ops —
    # skipping them is equivalence, not approximation.  This is the
    # dominant cost of the E-step (measured round 3 at N=65k, K=100: the
    # 8 unconditional passes were 49.6 of 50.7 ms; with loose real-world
    # bounds the reduced-cost argmin is usually already feasible and the
    # whole repair collapses to one bincount check).
    def cond(state):
        _lab, it, done = state
        return (it < repair_passes) & ~done

    def body(state):
        lab, it, _ = state
        lab = _evict_pass(cost_n, lab, g, size_min, size_max, k)
        lab = _steal_pass(cost_n, lab, g, size_min, size_max, k)
        return lab, it + 1, _feasible(lab)

    labels, _it, feasible = jax.lax.while_loop(
        cond, body, (labels, jnp.zeros((), jnp.int32), _feasible(labels)))
    return ConstrainedAssignment(labels=labels, feasible=feasible,
                                 col_duals=g * c_std)
