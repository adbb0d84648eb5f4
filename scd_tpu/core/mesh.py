"""Device mesh and sharding helpers.

The reference is single-GPU with host<->device ping-pong as its de-facto
"communication backend" (SURVEY.md §2.10).  Here every pipeline stage runs
over a ``jax.sharding.Mesh`` with two logical axes:

- ``data``: shards instance rows (images, feature vectors);
- ``model``: shards wide columns (vocabulary entries, MLP hidden, heads).

All cross-device reductions (inertia sums, distance minima, top-k merges) are
XLA collectives over ICI — there is no host round-trip in any inner loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scd_tpu.core.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else max(1, n // model)
    use = data * model
    if use > n:
        raise ValueError(
            f"mesh {data}x{model} needs {use} devices but only {n} are "
            f"visible — lower --mesh_data/--mesh_model or add devices")
    dev_array = np.asarray(devices[:use]).reshape(data, model)
    return Mesh(dev_array, cfg.axis_names)


@dataclasses.dataclass
class MeshContext:
    """Bundle of a mesh plus the shardings the pipeline stages use."""

    mesh: Mesh

    @property
    def data_axis(self) -> str:
        return self.mesh.axis_names[0]

    @property
    def model_axis(self) -> str:
        return self.mesh.axis_names[1]

    def rows(self) -> NamedSharding:
        """Shard dim-0 (instances) over the data axis."""
        return NamedSharding(self.mesh, P(self.data_axis))

    def cols(self) -> NamedSharding:
        """Shard dim-1 (e.g. the vocabulary axis of [D, V]) over model."""
        return NamedSharding(self.mesh, P(None, self.model_axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def put_rows(self, x):
        return jax.device_put(x, self.rows())

    def put_replicated(self, x):
        return jax.device_put(x, self.replicated())

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[self.model_axis]


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_rows(x: np.ndarray, multiple: int, fill=0.0):
    """Pad dim-0 of ``x`` to a multiple (for even sharding); returns (padded, n_valid)."""
    n = x.shape[0]
    target = pad_to_multiple(max(n, 1), multiple)
    if target == n:
        return x, n
    pad_width = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad_width, constant_values=fill), n
