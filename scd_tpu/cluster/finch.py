"""FINCH: parameter-free first-neighbor agglomerative clustering.

Reference ``local_utils/finch.py`` (Sarfraz et al., CVPR 2019 — standalone
alternative clusterer in the reference, not imported by the mains).
Semantics preserved: link i~j when nn(i)=j, nn(j)=i, or nn(i)=nn(j)
(the ``(A+I)(A+I)^T`` clustering equation); weak connected components;
recursive merging over cluster means; ``min_sim`` pruning of long links at
deeper levels; optional refinement to an exact requested cluster count by
one-merge-at-a-time agglomeration.

TPU-first: the only O(N²) work — first-neighbor search — runs on device as
blockwise masked similarity argmax (no N×N materialization in host memory,
no pyflann fallback needed; the reference caps exact search at 70k samples,
``finch.py:17``).  The component/merge bookkeeping is O(N) host work on the
edge list.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp


def first_neighbors(x: np.ndarray, distance: str = "cosine",
                    block: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Device blockwise 1-NN. Returns (nn_idx [N], nn_dist [N])."""
    import jax
    import jax.numpy as jnp

    x = np.asarray(x, np.float32)
    n = x.shape[0]
    xj = jnp.asarray(x)
    if distance == "cosine":
        xn = xj / jnp.maximum(jnp.linalg.norm(xj, axis=1, keepdims=True), 1e-12)

        @jax.jit
        def block_nn(rows, row_idx):
            # full f32 precision: the TPU bf16-pass default perturbs
            # similarities enough to flip nearest neighbors
            sim = jnp.matmul(rows, xn.T,
                             precision=jax.lax.Precision.HIGHEST)  # [B, N]
            d = 1.0 - sim
            d = d.at[jnp.arange(rows.shape[0]), row_idx].set(1000.0)
            return jnp.argmin(d, axis=1), jnp.min(d, axis=1)

        src = xn
    elif distance in ("euclidean", "l2"):
        from scd_tpu.ops.distance import pairwise_sqdist

        @jax.jit
        def block_nn(rows, row_idx):
            d = jnp.sqrt(pairwise_sqdist(rows, xj))
            d = d.at[jnp.arange(rows.shape[0]), row_idx].set(1000.0)
            return jnp.argmin(d, axis=1), jnp.min(d, axis=1)

        src = xj
    else:
        raise ValueError(f"unsupported distance {distance!r}")

    nn = np.empty(n, np.int64)
    nd = np.empty(n, np.float32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        idx, dist = block_nn(src[start:stop], jnp.arange(start, stop))
        nn[start:stop] = np.asarray(idx)
        nd[start:stop] = np.asarray(dist)
    return nn, nd


def _pair_dist(x: np.ndarray, i: np.ndarray, j: np.ndarray,
               distance: str) -> np.ndarray:
    a, b = x[i], x[j]
    if distance == "cosine":
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        return 1.0 - np.sum(a * b, axis=1) / np.maximum(na * nb, 1e-12)
    return np.linalg.norm(a - b, axis=1)


def _edges_from_nn(nn: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """All links of the clustering equation: (i, nn_i) plus same-neighbor
    pairs (i, j) with nn(i) == nn(j)."""
    n = len(nn)
    e_i = [np.arange(n)]
    e_j = [nn]
    order = np.argsort(nn, kind="stable")
    sorted_nn = nn[order]
    # contiguous runs share a neighbor; link consecutive members (enough for
    # connectivity, and their distances participate in pruning)
    same = sorted_nn[1:] == sorted_nn[:-1]
    e_i.append(order[:-1][same])
    e_j.append(order[1:][same])
    return np.concatenate(e_i), np.concatenate(e_j)


def _components(n: int, e_i: np.ndarray, e_j: np.ndarray
                ) -> Tuple[np.ndarray, int]:
    a = sp.csr_matrix((np.ones(len(e_i), np.float32), (e_i, e_j)), shape=(n, n))
    num, labels = sp.csgraph.connected_components(a, directed=True,
                                                  connection="weak",
                                                  return_labels=True)
    return labels, num


def _group_means(data: np.ndarray, labels: np.ndarray) -> np.ndarray:
    k = labels.max() + 1
    sums = np.zeros((k, data.shape[1]), np.float64)
    np.add.at(sums, labels, data)
    counts = np.bincount(labels, minlength=k)
    return (sums / counts[:, None]).astype(np.float32)


def finch(data: np.ndarray, req_clust: Optional[int] = None,
          distance: str = "cosine", verbose: bool = False
          ) -> Tuple[np.ndarray, List[int], Optional[np.ndarray]]:
    """Returns (c [N, P] partitions, num_clust per partition, req_c)."""
    data = np.asarray(data, np.float32)
    n = len(data)

    nn, _nd = first_neighbors(data, distance)
    e_i, e_j = _edges_from_nn(nn)
    group, num = _components(n, e_i, e_j)
    c = group[:, None]
    mat = _group_means(data, group)
    # prune threshold: the longest link accepted at the first level
    min_sim = float(_pair_dist(data, e_i, e_j, distance).max())
    num_clust = [num]

    if verbose:
        print(f"Partition 0: {num} clusters")

    c_ = group
    while True:
        nn, _ = first_neighbors(mat, distance)
        e_i, e_j = _edges_from_nn(nn)
        d = _pair_dist(mat, e_i, e_j, distance)
        keep = d <= min_sim
        labels, num_curr = _components(len(mat), e_i[keep], e_j[keep])
        c_ = labels[c_]
        mat = _group_means(data, c_)

        gain = num_clust[-1] - num_curr
        if num_curr == 1 or gain < 1:
            break
        num_clust.append(num_curr)
        c = np.column_stack([c, c_])
        if verbose:
            print(f"Partition {c.shape[1] - 1}: {num_curr} clusters")

    req_c = None
    if req_clust is not None:
        if req_clust in num_clust:
            req_c = c[:, num_clust.index(req_clust)]
        else:
            ok = [i for i, v in enumerate(num_clust) if v >= req_clust]
            if not ok:
                req_c = c[:, 0]
            else:
                req_c = _merge_to_k(c[:, ok[-1]], data, req_clust, distance)
    return c, num_clust, req_c


def _merge_to_k(labels: np.ndarray, data: np.ndarray, k: int,
                distance: str) -> np.ndarray:
    """One merge per step: join the closest pair of cluster means
    (reference ``req_numclust``/``update_adj``, ``finch.py:83-103``)."""
    _, labels = np.unique(labels, return_inverse=True)
    while labels.max() + 1 > k:
        means = _group_means(data, labels)
        m = len(means)
        if distance == "cosine":
            norm = means / np.maximum(
                np.linalg.norm(means, axis=1, keepdims=True), 1e-12)
            d = 1.0 - norm @ norm.T
        else:
            d = np.linalg.norm(means[:, None] - means[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        keep, merge = min(i, j), max(i, j)
        labels = np.where(labels == merge, keep, labels)
        _, labels = np.unique(labels, return_inverse=True)
    return labels


def finch_fit(data: np.ndarray, req_clust: Optional[int] = None,
              distance: str = "cosine") -> np.ndarray:
    """Convenience: labels at the requested K (or the last partition)."""
    c, num_clust, req_c = finch(data, req_clust=req_clust, distance=distance)
    if req_c is not None:
        return req_c.astype(np.int64)
    return c[:, -1].astype(np.int64)
