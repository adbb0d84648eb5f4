"""M-step centroid update as fused segment reductions.

Replaces the reference's per-cluster Python loop of
``nonzero → index_select → mean`` (``sskm_constrained.py:125-128``) and the
Cython ``_centers_dense`` scatter (``sklearn_import/cluster/_k_means.pyx``)
with one-hot matmuls / ``segment_sum`` — a single XLA-fused pass over the
data that maps onto the MXU.

Empty-cluster policies:
- ``"keep"``  — retain the previous centroid (the reference's torch path
  would produce NaN for an empty cluster; k-means++ seeding makes this
  unreachable in practice, so keeping the old centroid is the safe
  equivalent).
- ``"farthest"`` — reseed empty clusters from the points farthest from their
  assigned centroid, mirroring ``_centers_dense``'s relocation
  (``_k_means.pyx:66-78``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def segment_sums(x: jnp.ndarray, labels: jnp.ndarray, k: int,
                 weights: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cluster sums of ``x`` [N, D] grouped by ``labels`` [N].

    Returns (sums [K, D], counts [K]).  Implemented as a one-hot matmul so
    the reduction runs on the MXU and shards cleanly over a data-parallel
    mesh (the partial sums reduce with a single psum under ``shard_map``).
    """
    x = x.astype(jnp.float32)
    one_hot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [N, K]
    if weights is not None:
        one_hot = one_hot * weights[:, None]
    # Precision.HIGH (bf16x3): f32-class accuracy — the one-hot operand is
    # exactly representable, the data operand keeps 24 covered mantissa
    # bits — at 2x the speed of HIGHEST's 6-pass emulation (SURVEY hard
    # part #2 wants f32-grade centroid statistics, not the 1-pass default)
    sums = jax.lax.dot_general(
        one_hot, x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )  # [K, D]
    counts = jnp.sum(one_hot, axis=0)  # [K]
    return sums, counts


def segment_mean(x: jnp.ndarray, labels: jnp.ndarray, k: int,
                 weights: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cluster mean; means of empty clusters are 0.  See segment_sums."""
    sums, counts = segment_sums(x, labels, k, weights)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return means, counts


def mstep_update(x: jnp.ndarray, labels: jnp.ndarray, k: int,
                 prev_centers: jnp.ndarray,
                 mindist: Optional[jnp.ndarray] = None,
                 empty_policy: str = "keep",
                 weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """New centroids with empty-cluster handling."""
    means, counts = segment_mean(x, labels, k, weights=weights)
    empty = counts < 0.5  # [K] bool

    if empty_policy == "keep":
        return jnp.where(empty[:, None], prev_centers, means)

    if empty_policy == "farthest":
        if mindist is None:
            raise ValueError("empty_policy='farthest' requires mindist")
        # Rank points by distance to their centroid, descending; the i-th
        # empty cluster steals the i-th farthest point.  Zero-weight rows
        # (a sharded caller's padding) must never donate — their mindist
        # can be huge precisely because they are garbage coordinates.
        rank_key = mindist if weights is None else jnp.where(
            weights > 0, mindist, -jnp.inf)
        order = jnp.argsort(-rank_key)
        empty_rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # rank among empties
        donor_idx = order[jnp.clip(empty_rank, 0, x.shape[0] - 1)]
        donors = x[donor_idx].astype(jnp.float32)  # [K, D]
        return jnp.where(empty[:, None], donors, means)

    raise ValueError(f"unknown empty_policy {empty_policy!r}")
