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


def device_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
                n_slices: int = 1) -> Mesh:
    """Device mesh over ``n_devices`` (default: all local devices).

    ``n_slices == 1``: 1-D mesh, axis ``"d"`` (one ICI domain).
    ``n_slices > 1``: 2-D multi-slice mesh, axes ``("s", "d")`` — the major
    ``"s"`` axis crosses slices (DCN), the minor ``"d"`` axis is the fast
    intra-slice fabric (ICI).  ``jax.devices()`` enumerates devices
    slice-major (process-major), so a plain reshape lands each mesh row
    inside one slice.  Collectives ride the cheap axis: the ring rotates
    sources over ``"d"`` with one ``"s"`` forward per pass
    (parallel.ring), and the Step-3 z-slab halos touch DCN only at the
    n_slices-1 slice-boundary planes.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if n_slices <= 1:
        return Mesh(devices, ("d",))
    if devices.size % n_slices:
        raise ValueError(f"{devices.size} devices not divisible into "
                         f"{n_slices} slices")
    return Mesh(devices.reshape(n_slices, -1), ("s", "d"))


def _all_axes(mesh: Mesh):
    """Dim-0 spec entry sharding over every mesh axis (slice-major)."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def node_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for flat (N,) node vectors: contiguous z-slabs."""
    return NamedSharding(mesh, P(_all_axes(mesh)))


def field3_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nz, ny, nx) fields: slabs along z."""
    return NamedSharding(mesh, P(_all_axes(mesh), None, None))


def field3v_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nz, ny, nx, 3) vector fields."""
    return NamedSharding(mesh, P(_all_axes(mesh), None, None, None))


def source_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (S, ...) source arrays: rows over the ring axes."""
    return NamedSharding(mesh, P(_all_axes(mesh)))


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
