"""One k-means EM iteration with a single fused/XLA dispatch point.

Three call sites (the Lloyd loop, the dynamic-K estimate-K loop, and the
benchmark) previously hand-rolled the same "fused Pallas on TPU, XLA ops
elsewhere" branch and had already begun to drift; this is the one shared
implementation.  Reference semantics: E-step assignment
(``faster_mix_k_means_pytorch.py:177-212`` distances + min) and the
``_centers_dense`` M-step sums (``_k_means.pyx:30-86``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def em_iteration(x: jnp.ndarray, centers: jnp.ndarray, k: int,
                 row_w: Optional[jnp.ndarray] = None,
                 fused: Optional[bool] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
    """(labels [N] i32, sums [K, D], counts [K], inertia scalar) for one
    EM iteration over ``x`` [N, D] given ``centers`` [K, D].

    ``row_w`` [N] (0/1) drops padded rows from sums/counts/inertia.
    ``fused=None`` auto-selects: the fused Pallas E+M kernel on TPU (one
    streaming pass over x instead of two — ``fused_em_step_pallas``), the
    auto-partitioning XLA ops elsewhere.  Callers on a sharded mesh must
    pass ``fused=False``: a pallas_call is opaque to GSPMD.
    """
    if fused is None:
        fused = jax.default_backend() == "tpu"
    if fused:
        from scd_tpu.ops.pallas_kernels import fused_em_step_pallas

        return fused_em_step_pallas(
            x, centers, row_mask=row_w,
            interpret=jax.default_backend() != "tpu")

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.segment import segment_sums

    labels, mindist = estep_assign(x, centers)
    inertia = jnp.sum(mindist if row_w is None else mindist * row_w)
    sums, counts = segment_sums(x, labels, k, weights=row_w)
    return labels, sums, counts, inertia
