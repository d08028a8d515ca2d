"""Accuracy at scale vs the f64 CPU oracle (VERDICT r1 item 3).

The fast suite proves rel-L2 <= 1e-6 against the oracle at 16^3
(tests/test_device_grid.py); the north star couples <1 s AND rel-L2 <= 1e-5
at production resolutions.  This slow test runs the PRODUCT DEFAULT tier
(float32 device solve + one f64 defect-correction step, refine_steps=1) on a
real scan at 64^3 and compares against the direct-LU f64 oracle
(scipy spsolve on the full KKT saddle, the reference's exact semantics,
/root/reference/src/signed_heat_grid_solver.cpp:77-109).  ~10 min of host
time for the oracle factorization, hence SHM3D_SLOW-gated; at 128^3+ the
oracle is intractable and bench.py instead reports rel-L2 against the
f64 defect-corrected device reference (rel res <= 1e-11).
"""

import os

import numpy as np
import pytest

from shm3d.config import SignedHeatOptions
from shm3d.io.mesh_io import read_geometry
from shm3d.oracle import reference as oracle
from shm3d.solvers.grid import GridSolver

slow = pytest.mark.skipif(
    not os.environ.get("SHM3D_SLOW"), reason="set SHM3D_SLOW=1 to run"
)

DATA = os.environ.get("SHM3D_DATA", "/root/reference/data")


@slow
def test_grid64_default_tier_matches_oracle_1e5():
    geom = read_geometry(os.path.join(DATA, "bunny_small.obj"))
    opts64 = SignedHeatOptions(dtype="float64", h_coef=2.0, refine_steps=0,
                               disk_cache=False)
    expected = oracle.solve_grid(geom, opts64)
    assert expected.grid.n == 64

    # product default tier: f32 device solve + f64 defect correction
    opts = SignedHeatOptions(dtype="float32", h_coef=2.0, refine_steps=1,
                             disk_cache=False)
    got = GridSolver().compute_distance(geom, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-5, f"rel L2 {rel} at 64^3 (north-star tolerance)"
