"""Size-constrained (semi-supervised) k-means — ConSSKM.

Reference behavior (``local_utils/sskm_constrained.py``): Lloyd iterations
where the E-step is a constrained assignment forcing every cluster to hold
``size_min <= |c| <= size_max`` unlabelled points; labelled points stay
pinned to their class centroid; k-means++ seeds the non-labelled centers;
``n_init`` restarts keep the best inertia.

Two interchangeable E-step backends:

- ``"sinkhorn"`` (TPU-native, default): the whole Lloyd loop is one compiled
  ``while_loop`` with the entropic-OT assignment of
  ``scd_tpu.ops.sinkhorn`` — zero host round-trips, restarts vmapped.
  If a restart's final assignment is infeasible (rare), the driver
  transparently re-runs that restart on the exact backend.
- ``"mcf"`` (exact/parity): per-iteration native C++ min-cost-flow with the
  reference's exact int32 cost rounding (``round(1000*sqrt(dist))``,
  ``sskm_constrained.py:324``); distances and M-steps stay on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scd_tpu.core.config import ClusterConfig
from scd_tpu.cluster.kmeans import KMeansResult, _device_f32
from scd_tpu.ops.distance import pairwise_sqdist
from scd_tpu.ops.kpp import kmeans_plus_plus, kmeans_plus_plus_local_trials
from scd_tpu.ops.native import constrained_assign
from scd_tpu.ops.segment import segment_mean, segment_sums
from scd_tpu.ops.sinkhorn import sinkhorn_constrained_assign


class _State(NamedTuple):
    it: jnp.ndarray
    centers: jnp.ndarray
    shift_sq: jnp.ndarray
    best_labels: jnp.ndarray
    best_inertia: jnp.ndarray
    best_centers: jnp.ndarray
    best_feasible: jnp.ndarray


def _resolve_local_trials(cfg: ClusterConfig, k: int) -> int:
    """0 = simple kpp; -1 = the vendored package's auto ``2 + int(log k)``
    (``k_means_constrained_.py:93-96``); >0 = explicit count."""
    t = cfg.kpp_local_trials
    return (2 + int(np.log(k))) if t < 0 else t


def _seed_centers(key, x, k, local_trials: int, pre_centers=None,
                  n_valid=None):
    if local_trials > 0:
        return kmeans_plus_plus_local_trials(
            key, x, k, n_local_trials=local_trials, pre_centers=pre_centers,
            n_valid=n_valid)
    return kmeans_plus_plus(key, x, k, pre_centers=pre_centers,
                            n_valid=n_valid)


def _labelled_stats(l_feats: jnp.ndarray, l_labels: jnp.ndarray, k: int,
                    n_l_classes: int):
    sums, counts = segment_sums(l_feats, l_labels, k)
    centers = (sums / jnp.maximum(counts, 1.0)[:, None])[:n_l_classes]
    return sums, counts, centers


@partial(jax.jit, static_argnames=("k", "n_l_classes", "max_iter", "n_init",
                                   "size_min", "size_max", "sk_iters",
                                   "local_trials"))
def _fit_constrained_sinkhorn(key, u, l, l_labels, k: int, n_l_classes: int,
                              max_iter: int, tol: float, n_init: int,
                              size_min: int, size_max: int,
                              sk_eps: float, sk_iters: int,
                              n_valid=None, local_trials: int = 0):
    n_u = u.shape[0]
    if n_valid is None:
        n_valid = jnp.asarray(n_u)
    # padded sharding rows carry no mass; n_valid is a scalar count
    # (suffix pads) or a [N] 0/1 mask (ragged multi-controller pads)
    if getattr(n_valid, "ndim", 0) == 1:
        row_mask = n_valid.astype(bool)
    else:
        row_mask = jnp.arange(n_u) < n_valid
    row_w = row_mask.astype(jnp.float32)
    l_sums, l_counts, l_centers = _labelled_stats(l, l_labels, k, n_l_classes)

    def l_inertia(centers):
        diff = l.astype(jnp.float32) - centers[l_labels]
        return jnp.sum(diff * diff)

    def estep(centers):
        d = pairwise_sqdist(u, centers)
        assign = sinkhorn_constrained_assign(
            jnp.sqrt(d), k, size_min, size_max, eps=sk_eps, iters=sk_iters,
            row_mask=row_mask)
        # padded rows carry sentinel label k: clamp the gather, zero the sum
        lab_ix = jnp.minimum(assign.labels, k - 1)
        picked = jnp.take_along_axis(d, lab_ix[:, None], axis=1)[:, 0]
        inertia = jnp.sum(picked * row_w) + l_inertia(centers)
        return assign.labels, inertia, assign.feasible

    def mstep(labels, centers):
        # one_hot of the sentinel label k is all-zero, so padded rows drop
        # out of the segment sums by construction
        sums, counts = segment_sums(u, labels, k)
        sums = sums + l_sums
        counts = counts + l_counts
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts < 0.5)[:, None], centers, new)

    def cond(s: _State):
        return (s.it < max_iter) & (s.shift_sq >= tol)

    def body(s: _State):
        labels, inertia, feasible = estep(s.centers)
        new_centers = mstep(labels, s.centers)
        # lexicographic (feasible, inertia): an infeasible E-step tends to
        # have LOWER inertia (points sit at their true nearest centroid), so
        # a plain inertia comparison would poison best_feasible and force
        # the expensive exact-MCF fallback even when feasible iterations
        # existed (mirrors the restart-level ranking below)
        rank_new = jnp.where(feasible, inertia, jnp.inf)
        rank_old = jnp.where(s.best_feasible, s.best_inertia, jnp.inf)
        better = jnp.where(rank_new == rank_old,
                           inertia < s.best_inertia, rank_new < rank_old)
        shift = jnp.sum(jnp.sqrt(jnp.sum((new_centers - s.centers) ** 2, axis=1)))
        return _State(
            s.it + 1, new_centers, shift ** 2,
            jnp.where(better, labels, s.best_labels),
            jnp.where(better, inertia, s.best_inertia),
            jnp.where(better, new_centers, s.best_centers),
            jnp.where(better, feasible, s.best_feasible),
        )

    def one_restart(sub):
        centers0 = _seed_centers(sub, u, k, local_trials,
                                 pre_centers=l_centers, n_valid=n_valid)
        init = _State(jnp.zeros((), jnp.int32), centers0,
                      jnp.full((), jnp.inf, jnp.float32),
                      jnp.zeros((n_u,), jnp.int32),
                      jnp.full((), jnp.inf, jnp.float32),
                      centers0, jnp.array(False))
        s = jax.lax.while_loop(cond, body, init)
        return s.best_labels, s.best_inertia, s.best_centers, s.it, s.best_feasible

    keys = jax.random.split(key, n_init)
    labels, inertias, centers, iters, feas = jax.vmap(one_restart)(keys)
    # prefer feasible restarts: infeasible ones get +inf inertia
    ranked = jnp.where(feas, inertias, jnp.inf)
    best = jnp.argmin(jnp.where(jnp.any(feas), ranked, inertias))
    return (labels[best], inertias[best], centers[best], iters[best],
            feas[best])


@jax.jit
def _mcf_initial_costs(u, centers):
    """Distances to the seed centers + the reference's int32 cost rounding
    (``round(1000*sqrt(dist))``, ``sskm_constrained.py:324``)."""
    d = pairwise_sqdist(u, centers)
    return d, jnp.around(jnp.sqrt(d) * 1000.0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def _mcf_device_step(u, centers, d, labels, l_sums, l_counts, l, l_labels,
                     k: int):
    """The whole per-Lloyd-iteration device side as ONE compiled program:
    inertia of the solver's labels (against the distances they were solved
    on), the M-step, the convergence shift, and the NEXT iteration's rounded
    cost matrix.  Through the TPU tunnel every eager op is a separate remote
    dispatch (~33 ms round-trip); the previous op-by-op loop spent ~8 round
    trips per iteration where this spends one dispatch + one cost fetch.
    """
    picked = jnp.take_along_axis(d, labels[:, None], axis=1)[:, 0]
    l_diff = l.astype(jnp.float32) - centers[l_labels]
    inertia = picked.sum() + jnp.sum(l_diff * l_diff)
    sums, counts = segment_sums(u, labels, k)
    sums = sums + l_sums
    counts = counts + l_counts
    new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
    new_centers = jnp.where((counts < 0.5)[:, None], centers, new_centers)
    shift = jnp.sum(jnp.sqrt(jnp.sum((new_centers - centers) ** 2, axis=1)))
    d_next = pairwise_sqdist(u, new_centers)
    costs_next = jnp.around(jnp.sqrt(d_next) * 1000.0).astype(jnp.int32)
    return new_centers, d_next, costs_next, jnp.stack([inertia, shift * shift])


def _fit_constrained_mcf_once(key, u_j, l_sums, l_counts, l_centers,
                              l, l_labels, cfg: ClusterConfig,
                              k: int) -> Tuple[np.ndarray, float, np.ndarray, int]:
    """One restart with the exact native MCF E-step (host solver, device
    distances/M-step) — the reference's algorithm with the reference's cost
    rounding.  The final iteration's eagerly-computed next costs are wasted
    work (one small matmul), the price of the single-dispatch loop."""
    centers = _seed_centers(key, u_j, k, _resolve_local_trials(cfg, k),
                            pre_centers=l_centers)
    d, costs = _mcf_initial_costs(u_j, centers)
    costs_host = np.asarray(costs)
    best_labels, best_inertia, best_centers = None, np.inf, None
    it = 0
    for it in range(1, cfg.max_iterations + 1):
        labels = constrained_assign(costs_host, cfg.size_min, cfg.size_max)
        centers_new, d, costs, scalars = _mcf_device_step(
            u_j, centers, d, jnp.asarray(labels), l_sums, l_counts, l,
            l_labels, k)
        costs_host = np.asarray(costs)
        inertia, shift_sq = (float(v) for v in np.asarray(scalars))
        if inertia < best_inertia:
            best_labels, best_inertia, best_centers = labels, inertia, centers_new
        centers = centers_new
        if shift_sq < cfg.tolerance:
            break
    return best_labels, best_inertia, np.asarray(best_centers), it


def _run_mcf_restarts(keys, run_one, cfg: ClusterConfig):
    """Run the exact-MCF restarts concurrently and keep the best inertia.

    The native solver call releases the GIL for its whole duration
    (ctypes foreign call), so while one restart blocks in C++ push-relabel
    another thread dispatches device distances / M-steps — the overlap the
    reference's joblib restart pool got from separate processes
    (``sskm_constrained.py:177-187``), without pickling features.  Selection
    is deterministic: results are ranked in restart-key order with a strict
    ``<``, identical to the serial loop.
    """
    n = len(keys)
    workers = cfg.mcf_restart_threads if cfg.mcf_restart_threads > 0 else min(n, 4)
    if workers == 1 or n == 1:
        results = [run_one(sub) for sub in keys]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(run_one, keys))
    best = None
    for r in results:
        if best is None or r[1] < best[1]:
            best = r
    return best


def fit_constrained(key: jax.Array, u_feats: np.ndarray, l_feats: np.ndarray,
                    l_targets: np.ndarray, cfg: ClusterConfig,
                    mesh=None) -> KMeansResult:
    """ConSSKM ``fit_mix``: labelled pinned + size-constrained unlabelled
    E-step (reference ``sskm_constrained.py:87-139,165-187``).

    Returned labels follow the reference contract: labelled instances first
    (remapped class ids), then unlabelled assignments.  Pass ``mesh`` to
    shard the unlabelled instance axis over chips (sinkhorn backend only;
    padded rows take a sentinel label and zero transport mass).

    Multi-controller: ``u_feats`` is THIS PROCESS's row shard,
    ``l_feats``/``l_targets`` the identical full labelled set everywhere;
    sinkhorn backend only (the MCF fallback needs the full cost matrix on
    one host) — an infeasible sinkhorn result raises instead of falling
    back.
    """
    from scd_tpu.core.multihost import host_fetch, is_multiprocess

    from scd_tpu.cluster.kmeans import _put_replicated

    k = cfg.n_clusters
    multiproc = is_multiprocess() and mesh is not None
    if multiproc and cfg.constrained_backend != "sinkhorn":
        raise RuntimeError(
            "multi-controller fit_constrained supports only the sinkhorn "
            "backend (the exact MCF solver is a host algorithm over the "
            "full cost matrix); mesh=None stays a process-local run")
    n_u = int(u_feats.shape[0])  # no np.asarray: would FETCH a device array
    valid_host = None
    if mesh is not None and cfg.constrained_backend == "sinkhorn":
        # staging (pad + shard + upload) only pays off for the sinkhorn
        # loop; the MCF path below rebuilds unpadded anyway, and a ~300 MB
        # upload through the tunnel is not free
        from scd_tpu.cluster.kmeans import _stage_rows_ragged

        u, n_valid, n_u, valid_host = _stage_rows_ragged(u_feats, mesh)
    else:
        u = _device_f32(u_feats)
        n_valid = None
    l = _put_replicated(l_feats, mesh)
    l_targets = np.asarray(l_targets).astype(np.int64)
    classes, l_mapped = np.unique(l_targets, return_inverse=True)
    n_l_classes = len(classes)
    if k < n_l_classes:
        raise ValueError(f"n_clusters={k} < labelled classes {n_l_classes}")
    if cfg.size_min * k > n_u or cfg.size_max * k < n_u:
        raise ValueError(
            f"infeasible size constraints for {n_u} unlabelled points: "
            f"k={k}, size_min={cfg.size_min}, size_max={cfg.size_max}")
    l_labels = _put_replicated(l_mapped, mesh, np.int32)

    if cfg.constrained_backend == "sinkhorn":
        labels, inertia, centers, n_iter, feasible = _fit_constrained_sinkhorn(
            key, u, l, l_labels, k, n_l_classes, cfg.max_iterations,
            cfg.tolerance, cfg.n_init, cfg.size_min, cfg.size_max,
            cfg.sinkhorn_epsilon, cfg.sinkhorn_iters, n_valid=n_valid,
            local_trials=_resolve_local_trials(cfg, k))
        if bool(feasible):
            u_lab = host_fetch(labels)
            u_lab = (u_lab[valid_host] if valid_host is not None
                     else u_lab[:n_u])
            all_labels = np.concatenate([l_mapped.astype(np.int32), u_lab])
            return KMeansResult(all_labels, host_fetch(centers),
                                float(inertia), int(n_iter))
        # fall through to the exact backend if the OT repair didn't converge
        if multiproc:
            raise RuntimeError(
                "constrained sinkhorn E-step infeasible under "
                "multi-controller execution; the exact MCF fallback needs "
                "the full cost matrix on one host — loosen size bounds or "
                "raise sinkhorn_iters")

    # exact MCF backend (also the sinkhorn fallback).  The MCF path has no
    # sentinel-label machinery, so it must see the UNPADDED rows — when
    # falling through from a staged sinkhorn attempt, ``u`` is padded and
    # would hand phantom zero-rows to the solver (wrong sizes/centroids
    # and labels misaligned with the dataset).
    if n_valid is not None:  # set only by the staged/padded branch
        u = _device_f32(u_feats)
    l_sums, l_counts, l_centers = _labelled_stats(l, l_labels, k, n_l_classes)

    labels, inertia, centers, n_iter = _run_mcf_restarts(
        list(jax.random.split(key, cfg.n_init)),
        lambda sub: _fit_constrained_mcf_once(
            sub, u, l_sums, l_counts, l_centers, l, l_labels, cfg, k),
        cfg)
    all_labels = np.concatenate([l_mapped.astype(np.int32), labels])
    return KMeansResult(all_labels, centers, float(inertia), int(n_iter))


def fit_constrained_unsup(key: jax.Array, x: np.ndarray,
                          cfg: ClusterConfig) -> KMeansResult:
    """Fully-unsupervised constrained k-means (reference ``fit_once``,
    ``sskm_constrained.py:47-85``): same E-step, k-means++ from scratch."""
    k = cfg.n_clusters
    x_j = _device_f32(x)
    n = x_j.shape[0]
    if cfg.size_min * k > n or cfg.size_max * k < n:
        raise ValueError("infeasible size constraints")
    empty_l = jnp.zeros((0, x_j.shape[1]), jnp.float32)
    empty_labels = jnp.zeros((0,), jnp.int32)

    if cfg.constrained_backend == "sinkhorn":
        labels, inertia, centers, n_iter, feasible = _fit_constrained_sinkhorn(
            key, x_j, empty_l, empty_labels, k, 0, cfg.max_iterations,
            cfg.tolerance, cfg.n_init, cfg.size_min, cfg.size_max,
            cfg.sinkhorn_epsilon, cfg.sinkhorn_iters,
            local_trials=_resolve_local_trials(cfg, k))
        if bool(feasible):
            return KMeansResult(np.asarray(labels), np.asarray(centers),
                                float(inertia), int(n_iter))

    l_sums = jnp.zeros((k, x_j.shape[1]), jnp.float32)
    l_counts = jnp.zeros((k,), jnp.float32)
    labels, inertia, centers, n_iter = _run_mcf_restarts(
        list(jax.random.split(key, cfg.n_init)),
        lambda sub: _fit_constrained_mcf_once(
            sub, x_j, l_sums, l_counts, None, empty_l, empty_labels, cfg, k),
        cfg)
    return KMeansResult(labels, centers, float(inertia), int(n_iter))
