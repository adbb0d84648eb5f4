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

import functools

import jax
import numpy as np
import scipy.sparse as sp


@jax.jit
def _block_nn_cosine(rows, xn, row_idx, n_valid):
    import jax.numpy as jnp

    # full f32 precision: the TPU bf16-pass default perturbs similarities
    # enough to flip nearest neighbors
    sim = jnp.matmul(rows, xn.T,
                     precision=jax.lax.Precision.HIGHEST)  # [B, N]
    d = 1.0 - sim
    # bucket-padding columns must never win (zero-pad rows sit at cosine
    # distance 1.0, which CAN beat real distances > 1)
    d = jnp.where(jnp.arange(xn.shape[0])[None, :] < n_valid, d, jnp.inf)
    d = d.at[jnp.arange(rows.shape[0]), row_idx].set(jnp.inf)
    return jnp.argmin(d, axis=1), jnp.min(d, axis=1)


@jax.jit
def _block_nn_l2(rows, xj, row_idx, n_valid):
    import jax.numpy as jnp

    from scd_tpu.ops.distance import pairwise_sqdist

    d = jnp.sqrt(pairwise_sqdist(rows, xj))
    d = jnp.where(jnp.arange(xj.shape[0])[None, :] < n_valid, d, jnp.inf)
    d = d.at[jnp.arange(rows.shape[0]), row_idx].set(jnp.inf)
    return jnp.argmin(d, axis=1), jnp.min(d, axis=1)


def first_neighbors(x: np.ndarray, distance: str = "cosine",
                    block: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Device blockwise 1-NN. Returns (nn_idx [N], nn_dist [N]).

    The dataset is a jit ARGUMENT (a closure would bake it into the HLO as
    a constant — catastrophic on the remote-compile path at dataset scale),
    the jitted kernels live at module level, and N is padded up to a
    power-of-two bucket (padding masked in-kernel) so the deep FINCH merge
    hierarchy compiles O(log N) executables instead of one per level —
    each level shrinks N, and an exact-shape jit would pay a remote
    compile (60-300 s observed) per level.  Self-distance is masked with
    inf (a finite sentinel mislabels points whose true 1-NN distance
    exceeds it).
    """
    import jax.numpy as jnp

    x = np.asarray(x, np.float32)
    n = x.shape[0]
    n_pad = max(256, 1 << (n - 1).bit_length())  # power-of-two bucket
    if n_pad != n:
        x = np.pad(x, ((0, n_pad - n), (0, 0)))
    xj = jnp.asarray(x)
    if distance == "cosine":
        src = xj / jnp.maximum(jnp.linalg.norm(xj, axis=1, keepdims=True),
                               1e-12)
        block_nn = _block_nn_cosine
    elif distance in ("euclidean", "l2"):
        src = xj
        block_nn = _block_nn_l2
    else:
        raise ValueError(f"unsupported distance {distance!r}")

    nn = np.empty(n, np.int64)
    nd = np.empty(n, np.float32)
    n_valid = jnp.int32(n)
    for start in range(0, n, block):
        stop = min(start + block, n_pad)
        idx, dist = block_nn(src[start:stop], src,
                             jnp.arange(start, stop), n_valid)
        keep = min(stop, n) - start
        nn[start:start + keep] = np.asarray(idx)[:keep]
        nd[start:start + keep] = np.asarray(dist)[:keep]
    return nn, nd


def _pair_dist(x: np.ndarray, i: np.ndarray, j: np.ndarray,
               distance: str) -> np.ndarray:
    a, b = x[i], x[j]
    if distance == "cosine":
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        return 1.0 - np.sum(a * b, axis=1) / np.maximum(na * nb, 1e-12)
    return np.linalg.norm(a - b, axis=1)


def _edges_from_nn(nn: np.ndarray,
                   clique_cap: int = 512) -> Tuple[np.ndarray, np.ndarray]:
    """All links of the clustering equation: (i, nn_i) plus the full clique
    over each same-neighbor group {i : nn(i) == v} — exactly what the
    reference's ``(A+I)(A+I)^T`` produces (``finch.py:20-45``).  The clique
    matters under ``min_sim`` pruning: a chain's two short hops can both be
    pruned while the direct pair survives.  Groups larger than
    ``clique_cap`` (rare hub points) fall back to chain links to bound the
    O(g²) edge count."""
    n = len(nn)
    e_i = [np.arange(n)]
    e_j = [nn]
    order = np.argsort(nn, kind="stable")
    sorted_nn = nn[order]
    boundaries = np.flatnonzero(np.diff(sorted_nn)) + 1
    starts = np.concatenate([[0], boundaries])
    stops = np.concatenate([boundaries, [len(nn)]])
    for a, b in zip(starts, stops):
        g = b - a
        if g < 2:
            continue
        members = order[a:b]
        if g <= clique_cap:
            ii, jj = np.triu_indices(g, k=1)
            e_i.append(members[ii])
            e_j.append(members[jj])
        else:  # hub fallback: consecutive chain keeps memory bounded
            e_i.append(members[:-1])
            e_j.append(members[1:])
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
