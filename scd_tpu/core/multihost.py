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


def rows_from_process_local(mesh: Mesh, local_rows: np.ndarray):
    """Global array sharded over the mesh ``data`` axis from per-process
    row shards.  Every process must contribute the same row count (the
    even-sharding contract; pad locally with ``core.mesh.pad_rows`` against
    the PER-PROCESS multiple ``n_data // process_count`` first if needed).
    Returns (global_array, n_global_rows)."""
    local_rows = np.asarray(local_rows)
    n_local = local_rows.shape[0]
    data_axis = mesh.axis_names[0]
    n_data = mesh.shape[data_axis]
    per_proc_devices = n_data // jax.process_count()
    if n_data % jax.process_count() or n_local % max(per_proc_devices, 1):
        raise ValueError(
            f"uneven multihost layout: data axis {n_data} over "
            f"{jax.process_count()} processes with {n_local} local rows — "
            f"local rows must divide by {per_proc_devices} "
            "(pad with core.mesh.pad_rows first)")
    n_global = n_local * jax.process_count()
    sharding = NamedSharding(mesh, P(data_axis))
    arr = jax.make_array_from_process_local_data(
        sharding, local_rows, (n_global,) + local_rows.shape[1:])
    return arr, n_global


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
