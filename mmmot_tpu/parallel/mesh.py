"""Device-mesh and sharding helpers.

The reference has no distributed path at all (SURVEY.md §2 parallelism note:
single GPU, vestigial sampler only).  The TPU rebuild adds data parallelism
as a first-class capability: KITTI-scale tracking is embarrassingly parallel
over (sequences, frame-pairs), so the mesh is 1-D ``(data,)`` by default
with a ``model`` axis reserved for larger backbones.

Usage:
    mesh = make_mesh()                      # all devices on the data axis
    batch = shard_batch(mesh, batch)        # leading axis sharded over data
    step = jax.jit(train_step, ...)         # XLA inserts the collectives

With ``jax.sharding`` + jit, gradient psums over the data axis ride ICI
automatically; nothing in the model code needs to change.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmmot_tpu.config import ParallelConfig


def make_mesh(cfg: Optional[ParallelConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or ParallelConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    num_model = max(cfg.num_model, 1)
    num_data = cfg.num_data if cfg.num_data > 0 else n // num_model
    if num_data * num_model != n:
        raise ValueError(
            f"mesh {num_data}x{num_model} != {n} devices")
    arr = np.array(devices).reshape(num_data, num_model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def _data_axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Shard every array's leading (batch) axis over the data axis."""
    sh = NamedSharding(mesh, P(_data_axis(mesh)))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_sequences(mesh: Mesh, arrays: Dict[str, Any]) -> Dict[str, Any]:
    """Shard the leading sequence axis [S, T, N, ...] over the data axis."""
    return shard_batch(mesh, arrays)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(_data_axis(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
