"""k-means++ seeding, fully on device.

The reference's ``kpp`` (``sskm_constrained.py:28-44``) recomputes the full
point×center distance matrix after every added center (O(N·K²·D) total) and
samples via an explicit cumsum scan.  Here the running min-distance ``d2`` is
maintained incrementally (O(N·K·D) total) inside a ``lax.fori_loop`` — the
sampling distribution is identical, only cheaper to maintain — and the draw
uses ``jax.random`` categorical-by-inverse-CDF exactly as the reference's
``cum_prob >= r`` search.

Supports ``pre_centers``: the semi-supervised variant seeds the first
``n_pre`` centers from labelled class means and only samples the remainder
(``sskm_constrained.py:108``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scd_tpu.ops.distance import pairwise_sqdist


def auto_local_trials(k: int) -> int:
    """The vendored package's greedy-trial count (``k_means_constrained_.py:93-96``)
    — the ONE definition; callers resolve through this."""
    return 2 + int(np.log(k))


def _valid_spec(n: int, n_valid):
    """(row_valid bool [N], count, last_valid_index) from a validity spec:
    None (all valid), a scalar count (pads are the row suffix), or a [N]
    0/1 mask (pads anywhere — the ragged multi-controller layout)."""
    if n_valid is None:
        return jnp.ones((n,), bool), n, n - 1
    if getattr(n_valid, "ndim", 0) == 1:
        m = n_valid.astype(bool)
        return m, m.sum(), (n - 1) - jnp.argmax(m[::-1])
    return jnp.arange(n) < n_valid, n_valid, n_valid - 1


def _first_valid_draw(sub, row_valid, count):
    """Uniform draw over valid rows: randint(count) then the r-th valid
    row — identical bits to a direct randint index when the valid rows
    are a prefix."""
    r = jax.random.randint(sub, (), 0, count)
    return jnp.argmax(jnp.cumsum(row_valid) >= r + 1)


@partial(jax.jit, static_argnames=("k",))
def kmeans_plus_plus(key: jax.Array, x: jnp.ndarray, k: int,
                     pre_centers: Optional[jnp.ndarray] = None,
                     n_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sample ``k`` centers from ``x`` [N, D] (f32).

    ``pre_centers`` [P, D] pins the first P centers (P static).  ``n_valid``
    masks padded rows of ``x`` out of the sampling distribution — a scalar
    count (pads are the row suffix) or a [N] 0/1 mask (pads anywhere, the
    ragged multi-controller layout).  The first-point draw consumes the
    same randint either way and picks the r-th VALID row, so the scalar
    and equivalent-prefix-mask forms are bit-identical.
    """
    n, d = x.shape
    x = x.astype(jnp.float32)
    row_valid, n_valid_count, _last = _valid_spec(n, n_valid)

    if pre_centers is not None and pre_centers.shape[0] == 0:
        pre_centers = None  # empty pin set == unsupervised seeding
    centers = jnp.zeros((k, d), jnp.float32)
    if pre_centers is not None:
        p = pre_centers.shape[0]
        centers = centers.at[:p].set(pre_centers.astype(jnp.float32))
        d2 = jnp.min(pairwise_sqdist(x, pre_centers), axis=1)
        start = p
    else:
        key, sub = jax.random.split(key)
        first = _first_valid_draw(sub, row_valid, n_valid_count)
        centers = centers.at[0].set(x[first])
        d2 = jnp.sum((x - x[first]) ** 2, axis=1)
        start = 1

    d2 = jnp.where(row_valid, d2, 0.0)

    def body(i, carry):
        key, centers, d2 = carry
        key, sub = jax.random.split(key)
        prob = d2 / jnp.maximum(d2.sum(), 1e-30)
        cum = jnp.cumsum(prob)
        r = jax.random.uniform(sub, ())
        idx = jnp.argmax(cum >= r)  # first index with cum_prob >= r
        new_c = x[idx]
        centers = centers.at[i].set(new_c)
        d_new = jnp.sum((x - new_c) ** 2, axis=1)
        d2 = jnp.where(row_valid, jnp.minimum(d2, d_new), 0.0)
        return key, centers, d2

    if start < k:
        _, centers, _ = jax.lax.fori_loop(start, k, body, (key, centers, d2))
    return centers


@partial(jax.jit, static_argnames=("k", "n_local_trials"))
def kmeans_plus_plus_local_trials(key: jax.Array, x: jnp.ndarray, k: int,
                                  n_local_trials: Optional[int] = None,
                                  pre_centers: Optional[jnp.ndarray] = None,
                                  n_valid: Optional[jnp.ndarray] = None
                                  ) -> jnp.ndarray:
    """k-means++ with greedy local trials (the vendored package's ``_k_init``,
    ``k_means_constrained_.py:89-144``): each step samples
    ``n_local_trials`` candidates D²-proportionally (default
    ``2 + int(log(k))``) and keeps the one minimizing the resulting
    potential.  All trials evaluate as ONE [N, T] distance block per step —
    the greedy inner loop of the reference becomes a vectorized argmin.
    """
    n, d = x.shape
    x = x.astype(jnp.float32)
    t = n_local_trials or auto_local_trials(k)
    row_valid, n_valid_count, last = _valid_spec(n, n_valid)

    if pre_centers is not None and pre_centers.shape[0] == 0:
        pre_centers = None
    centers = jnp.zeros((k, d), jnp.float32)
    if pre_centers is not None:
        p = pre_centers.shape[0]
        centers = centers.at[:p].set(pre_centers.astype(jnp.float32))
        d2 = jnp.min(pairwise_sqdist(x, pre_centers), axis=1)
        start = p
    else:
        key, sub = jax.random.split(key)
        first = _first_valid_draw(sub, row_valid, n_valid_count)
        centers = centers.at[0].set(x[first])
        d2 = jnp.sum((x - x[first]) ** 2, axis=1)
        start = 1

    d2 = jnp.where(row_valid, d2, 0.0)

    def body(i, carry):
        key, centers, d2 = carry
        key, sub = jax.random.split(key)
        pot = jnp.maximum(d2.sum(), 1e-30)
        # candidate draw: searchsorted on the unnormalized cumsum, exactly
        # the reference's rand * current_pot construction.  Clip to the
        # last VALID row: when all remaining D^2 mass is ~0 the search
        # lands past the end, and on padded inputs row n-1 is a zero pad
        # row — seeding a phantom origin center
        r = jax.random.uniform(sub, (t,)) * pot
        cand = jnp.clip(jnp.searchsorted(jnp.cumsum(d2), r), 0, last)
        dists = pairwise_sqdist(x, x[cand])  # [N, T]
        new_d2 = jnp.where(row_valid[:, None],
                           jnp.minimum(d2[:, None], dists), 0.0)
        best = jnp.argmin(jnp.sum(new_d2, axis=0))
        centers = centers.at[i].set(x[cand[best]])
        return key, centers, new_d2[:, best]

    if start < k:
        _, centers, _ = jax.lax.fori_loop(start, k, body, (key, centers, d2))
    return centers
