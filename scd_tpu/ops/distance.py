"""Pairwise distance + E-step assignment ops.

The reference computes squared euclidean distances by broadcasting
``(A-B)**2`` in 1024-row host-managed chunks
(``local_utils/sskm_constrained.py:189-224``).  On TPU that form is
HBM-bandwidth-bound (it materializes an N×K×D intermediate); we use the
matmul expansion ``|x|^2 - 2 x·c^T + |c|^2`` so the dominant FLOPs ride the
MXU, with fp32 accumulation (``preferred_element_type``) regardless of input
dtype.  The fused E-step (distance → min/argmin without materializing the
N×K matrix in HBM) lives in ``scd_tpu.ops.pallas_kernels``; this module is
the XLA reference path that everything is validated against.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [N, K] between rows of x [N, D] and c [K, D].

    Uses the MXU-friendly expansion; clamped at 0 to guard the cancellation
    the expansion can introduce for near-identical points.
    """
    x = x.astype(jnp.float32)
    c = c.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # [N, 1]
    c_sq = jnp.sum(c * c, axis=-1)[None, :]  # [1, K]
    # Precision.HIGH = bf16x3 decomposition: 24 mantissa bits covered, so
    # accuracy is f32-class (unlike the 1-pass default, whose ~1e-3 relative
    # error can flip argmins near cluster boundaries) at 2x the speed of
    # HIGHEST's 6-pass emulation — the k-means EM bench is matmul-bound
    cross = jax.lax.dot_general(
        x, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )  # [N, K]
    return jnp.maximum(x_sq - 2.0 * cross + c_sq, 0.0)


@partial(jax.jit, static_argnames=())
def estep_assign(x: jnp.ndarray, c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-centroid assignment. Returns (labels [N] int32, min_sqdist [N] f32).

    K is padded up to the 128-wide MXU lane width (padded centroids get +inf
    distance so they never win the argmin): at the benchmark shape K=100 the
    unpadded matmul leaves ~22% of the lanes idle, and the pad is free — the
    argmin result is identical.
    """
    k = c.shape[0]
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        c = jnp.pad(c.astype(jnp.float32), ((0, k_pad - k), (0, 0)))
    d = pairwise_sqdist(x, c)
    if k_pad != k:
        d = jnp.where(jnp.arange(k_pad)[None, :] < k, d, jnp.inf)
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    mindist = jnp.min(d, axis=1)
    return labels, mindist


def masked_min_sum(mindist: jnp.ndarray, n_valid: int) -> jnp.ndarray:
    """Inertia over the first ``n_valid`` rows (rows beyond are padding)."""
    n = mindist.shape[0]
    if n == n_valid:
        return jnp.sum(mindist)
    idx = jnp.arange(n)
    return jnp.sum(jnp.where(idx < n_valid, mindist, 0.0))
