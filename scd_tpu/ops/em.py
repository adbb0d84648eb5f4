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
                 fused: Optional[bool] = None,
                 estep_passes: int = 3, x_bf16: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
    """(labels [N] i32, sums [K, D], counts [K], inertia scalar) for one
    EM iteration over ``x`` [N, D] given ``centers`` [K, D].

    ``row_w`` [N] (0/1) drops padded rows from sums/counts/inertia.
    ``fused=None`` auto-selects: the fused Pallas E+M kernel on TPU (one
    streaming pass over x instead of twice — ``fused_em_step_pallas``), the
    auto-partitioning XLA ops elsewhere.  Callers on a sharded mesh must
    pass ``fused=False``: a pallas_call is opaque to GSPMD.
    ``estep_passes`` / ``x_bf16`` tune the fused kernel's precision-vs-
    bandwidth trade (see its docstring); both are ignored on the XLA path.
    """
    if fused is None:
        from scd_tpu.ops.pallas_kernels import fused_em_block_n

        # the kernel has a VMEM ceiling in K*D (measured, see
        # fused_em_block_n) — beyond it the freely-tiling XLA path wins
        # by actually compiling
        fused = (jax.default_backend() == "tpu"
                 and fused_em_block_n(x.shape[1], k) is not None)
    if fused:
        from scd_tpu.ops.pallas_kernels import fused_em_step_pallas

        if k != centers.shape[0]:
            # the kernel sizes its outputs from centers.shape[0]; pad with
            # far sentinels (never win the argmin, zero sums/counts) so
            # fused and XLA paths return identical [k]-shaped results
            if k < centers.shape[0]:
                raise ValueError(
                    f"k={k} < centers rows {centers.shape[0]}")
            centers = jnp.pad(centers, ((0, k - centers.shape[0]), (0, 0)),
                              constant_values=1e15)
        return fused_em_step_pallas(
            x, centers, row_mask=row_w,
            interpret=jax.default_backend() != "tpu",
            estep_passes=estep_passes, x_bf16=x_bf16)

    from scd_tpu.ops.distance import estep_assign
    from scd_tpu.ops.segment import segment_sums

    labels, mindist = estep_assign(x, centers)
    inertia = jnp.sum(mindist if row_w is None else mindist * row_w)
    sums, counts = segment_sums(x, labels, k, weights=row_w)
    return labels, sums, counts, inertia


def em_iteration_sharded(x: jnp.ndarray, centers: jnp.ndarray,
                         row_w: jnp.ndarray, mesh,
                         interpret: Optional[bool] = None,
                         estep_passes: int = 3, x_bf16: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]:
    """Fused Pallas E+M over a mesh via ``shard_map``.

    A ``pallas_call`` is opaque to GSPMD, so the auto-partitioned mesh
    path had to fall back to separate XLA E/M ops (two streams over x).
    ``shard_map`` restores the fused kernel per data-shard with explicit
    collectives: each chip runs the one-pass kernel on its row slice and
    the [K, D] partial sums / counts / inertia merge with one ``psum``
    over the data axis — exactly the reduction GSPMD would have inserted
    for the segment sums, but on the halved HBM traffic of the fused
    kernel.  Labels stay row-sharded.

    ``x`` [N, D] row-sharded (N divisible by the data-axis size),
    ``centers`` [K, D] replicated, ``row_w`` [N] row-sharded.
    ``estep_passes`` / ``x_bf16`` select the kernel's precision-vs-
    bandwidth variants exactly as in ``em_iteration``.
    """
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
        _check_off = {"check_vma": False}
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
        _check_off = {"check_rep": False}

    from scd_tpu.ops.pallas_kernels import fused_em_step_pallas

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # the repo convention names the instance axis "data" (core/mesh.py);
    # fall back to the first axis only for custom single-purpose meshes —
    # blindly taking axis_names[0] would psum over the wrong axis on a
    # ("model", "data")-ordered mesh
    axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]

    # replication checking off: the pallas_call inside has no replication
    # rule, so the checker cannot see that the psum outputs are replicated
    @_partial(shard_map, mesh=mesh,
              in_specs=(P(axis, None), P(None, None), P(axis)),
              out_specs=(P(axis), P(None, None), P(None), P()),
              **_check_off)
    def _run(xs, cs, rw):
        lab, sums, counts, inertia = fused_em_step_pallas(
            xs, cs, row_mask=rw, interpret=interpret,
            estep_passes=estep_passes, x_bf16=x_bf16)
        return (lab, jax.lax.psum(sums, axis), jax.lax.psum(counts, axis),
                jax.lax.psum(inertia, axis))

    if row_w is None:
        row_w = jnp.ones((x.shape[0],), jnp.float32)
    return _run(x, centers, row_w)
