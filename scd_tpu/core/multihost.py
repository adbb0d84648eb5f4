"""Multi-host (multi-controller) helpers.

The reference is strictly single-GPU (SURVEY.md §2.10); the single-process
mesh path here already scales across the chips one host can see.  This
module adds the pieces for a TPU POD — several hosts, each owning a slice
of the chips, all running the same program:

- ``initialize()``: bring up ``jax.distributed`` (auto-detected on real
  TPU pods; explicit coordinator/process_id for the CPU test rig,
  ``scripts/multihost_smoke.py``).
- ``rows_from_process_local(mesh, local)``: assemble the global
  row-sharded array from each process's local rows — the multi-controller
  data-loading convention (each host feeds its own shard; nothing is
  gathered through one host).
- ``host_fetch(arr)``: bring results to every host — ``np.asarray`` when
  the array is fully addressable (single process), an
  all-process gather otherwise.

The mesh fitters (``fit_kmeans``, ``fit_sskm``, ``fit_kmeans_from_labels``,
``fit_constrained`` sinkhorn) route through these automatically: under
``jax.process_count() > 1`` a numpy ROW input to the mesh path is
interpreted as THIS PROCESS's row shard, side inputs (labelled feats /
targets) replicate from their identical per-host copies, and results come
back replicated on every host.  Collectives ride ICI within a host's slice and DCN across hosts —
XLA picks the hierarchy from the mesh's device order (``jax.devices()``
enumerates process-major, so the ``data`` axis keeps each host's rows on
its own chips).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` with explicit args (CPU rig) or
    auto-detection (real TPU pod runtime)."""
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def rows_from_process_local(mesh: Mesh, local_rows: np.ndarray,
                            pad: bool = False):
    """Global array sharded over the mesh ``data`` axis from per-process
    row shards.  Every process must contribute the same row count.

    ``pad=False`` (exact contract): local rows must divide the per-process
    device count; returns (global_array, n_global_rows).  Do NOT hand-pad
    around the error — zero rows would enter seeding/sums as valid points
    and the gathered labels would interleave phantom rows mid-array; use
    ``pad=True`` instead, or trim to an even shard.

    ``pad=True`` (ragged contract, what ``fit_kmeans``/``fit_sskm`` and the
    dp encoder use): per-process row counts may differ arbitrarily — a
    tiny count-allgather establishes every process's share, each local
    slice zero-pads to the common (device-multiple) width, and the return
    is (global_array, valid_mask) — a host bool [N_global] marking the
    real rows (pads sit at the END of each process's contiguous block),
    identical on every host.  valid_mask is None when no padding was
    needed."""
    local_rows = np.asarray(local_rows)
    n_local = local_rows.shape[0]
    data_axis = mesh.axis_names[0]
    n_data = mesh.shape[data_axis]
    n_proc = jax.process_count()
    per_proc_devices = max(n_data // n_proc, 1)
    if n_data % n_proc:
        raise ValueError(
            f"data axis {n_data} does not divide over {n_proc} processes")
    if not pad:
        if n_local % per_proc_devices:
            raise ValueError(
                f"uneven multihost layout: {n_local} local rows over "
                f"{per_proc_devices} local devices — trim to a multiple, "
                "or call with pad=True (hand-padding would corrupt "
                "results: pads would count as valid rows)")
        n_global = n_local * n_proc
        sharding = NamedSharding(mesh, P(data_axis))
        arr = jax.make_array_from_process_local_data(
            sharding, local_rows, (n_global,) + local_rows.shape[1:])
        return arr, n_global

    # ragged: gather every process's count (one tiny collective), pad all
    # slices to the common device-multiple width, mask the pads
    if n_proc > 1:
        from jax.experimental import multihost_utils

        counts = np.asarray(multihost_utils.process_allgather(
            np.asarray([n_local], np.int64))).reshape(-1)
    else:
        counts = np.asarray([n_local], np.int64)
    width = int(counts.max())
    width += (-width) % per_proc_devices
    width = max(width, per_proc_devices)
    if width != n_local:
        local_rows = np.concatenate([
            local_rows,
            np.zeros((width - n_local,) + local_rows.shape[1:],
                     local_rows.dtype)])
    n_global = width * n_proc
    sharding = NamedSharding(mesh, P(data_axis))
    arr = jax.make_array_from_process_local_data(
        sharding, local_rows, (n_global,) + local_rows.shape[1:])
    if (counts == width).all():
        return arr, None
    valid = np.zeros(n_global, bool)
    for p, c in enumerate(counts):
        valid[p * width:p * width + int(c)] = True
    return arr, valid


def replicate_to_mesh(mesh: Mesh, tree):
    """Replicate a host pytree onto every device of a (possibly
    multi-process) mesh.  Single-process ``jax.device_put`` can't target
    non-addressable devices; ``make_array_from_process_local_data`` with a
    replicated spec accepts the full value from every process."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    if not is_multiprocess():
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(put, tree)


def put_global(x, sharding):
    """Place a FULL host value onto a (possibly multi-process) sharding:
    each process materializes its addressable shards by slicing its own
    identical full copy.  Works for ANY PartitionSpec (replicated, row,
    column), unlike ``replicate_to_mesh``; single-process it is just a
    sliced ``device_put``."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def host_fetch(arr) -> np.ndarray:
    """Fetch a (possibly non-fully-addressable) array to host numpy on
    EVERY process.  No-op beyond ``np.asarray`` in single-process runs."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
