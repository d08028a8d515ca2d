"""Device-mesh setup and sharding annotations for the grid pipeline.

Multi-chip strategy (SURVEY.md §2e):

- 1-D mesh over axis "d".  Grid node fields are sharded along the z axis
  (the leading axis of the (nz, ny, nx) layout, so a flat (N,) vector in the
  reference node ordering shards into contiguous z-slabs).
- Step 1 uses the ring schedule (shm3d.parallel.ring): queries stay put,
  source shards rotate over ICI.
- Step 3 stencils + Krylov iterations run under ``jit`` with sharding
  constraints: XLA inserts the 1-plane halo collective-permutes for the
  shifted slices and all-reduces for dot products automatically (the
  annotate-shardings-and-let-XLA-insert-collectives recipe).

The same code runs on a CPU mesh of virtual devices
(``--xla_force_host_platform_device_count``) and on a TPU slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("d",))


def node_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for flat (N,) node vectors: contiguous z-slabs."""
    return NamedSharding(mesh, P("d"))


def field3_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nz, ny, nx) fields: slabs along z."""
    return NamedSharding(mesh, P("d", None, None))


def field3v_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nz, ny, nx, 3) vector fields."""
    return NamedSharding(mesh, P("d", None, None, None))


def source_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (S, ...) source arrays: rows over the ring axis."""
    return NamedSharding(mesh, P("d"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_axis_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0, value=0.0):
    """Pad ``axis`` up to a multiple (shard-evenness requirement); returns
    (padded, original_size)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return jnp.pad(x, widths, constant_values=value), size
