"""Top-level API: ``SignedHeatSolver`` facade over the two domain solvers.

Mirrors the reference's pair of solver classes behind one entry point
(``SignedHeatTetSolver`` / ``SignedHeatGridSolver`` constructed at
/root/reference/src/main.cpp:289-292 and selected by the --grid flag).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from .config import LevelSetConstraint, SignedHeatOptions
from .io.mesh_io import Mesh, PointCloud


class SignedHeatSolver:
    """domain: "tet" (default, like the reference) or "grid".

    ``mesh``: optional ``jax.sharding.Mesh`` (``shm3d.parallel.device_mesh``;
    1-D single-slice or 2-D ("s", "d") multi-slice)
    to run multi-chip — Step 1 rotates source shards over ICI (ring schedule)
    and grid Step 3 runs on z-slab-sharded fields with XLA-inserted halo
    collectives.  One code path serves 1 and N devices."""

    def __init__(self, domain: str = "tet", mesh=None):
        if domain not in ("tet", "grid"):
            raise ValueError(f"domain must be 'tet' or 'grid', got {domain!r}")
        self.domain = domain
        if domain == "grid":
            from .solvers.grid import GridSolver

            self._impl = GridSolver(mesh=mesh)
        else:
            from .tet.solver import SignedHeatTetSolver

            self._impl = SignedHeatTetSolver(mesh=mesh)

    def compute_distance(self, geom: Union[Mesh, PointCloud],
                         options: SignedHeatOptions = SignedHeatOptions()):
        """Returns a GridResult (phi per grid node) or TetResult (phi per tet
        vertex), matching the reference's ``computeDistance`` overloads."""
        return self._impl.compute_distance(geom, options)

    @property
    def last_stats(self) -> dict:
        """Diagnostics from the most recent solve: which Step-3 path ran
        (``step3_path`` — e.g. the >32^3 fast path switches from the
        reference BFS to the device wavefront spanning tree), Krylov
        iterations, residuals."""
        return getattr(self._impl, "last_stats", {})

    def isosurface(self, result, isoval: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
        """Extract an isosurface mesh (V, F) from a solve result
        (reference: igl::marching_tets on the tet path, Polyscope marching
        cubes on the grid path — src/main.cpp:116-124)."""
        from .ops import contour

        if self.domain == "grid":
            return contour.grid_isosurface(result.grid, result.phi, isoval)
        return contour.marching_tets(result.mesh.vertices, result.mesh.tets, result.phi, isoval)
