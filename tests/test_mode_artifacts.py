"""Mode-aware operator artifacts (tet/solver._prepare_host, VERDICT r2 #4).

The disk artifact persists the discretization plus only the Step-3 operator
family its first run needed (CR face state for the default, vertex state for
--no-cr, neither for greedy); a later run in a different mode must build the
missing family from the cached mesh and merge it back into the artifact so
subsequent processes load it (_ensure_vertex_ops / _ensure_cr_path +
_upgrade_artifact).
"""

import json
import os

import numpy as np

from shm3d import SignedHeatOptions
from shm3d.geometry.procedural import make_icosphere
from shm3d.tet.solver import SignedHeatTetSolver


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def _tree_arrays(tmp_path):
    """Union of array keys across every tree artifact under tmp_path."""
    keys = set()
    for d in os.listdir(tmp_path):
        mf = os.path.join(tmp_path, d, "manifest.json")
        if d.startswith("tree_") and os.path.exists(mf):
            with open(mf) as f:
                keys |= set(json.load(f)["arrays"])
    return keys


def test_cr_artifact_lacks_vertex_state_then_upgrades(tmp_path, monkeypatch):
    monkeypatch.setenv("SHM3D_CACHE_DIR", str(tmp_path))
    mesh = make_icosphere(2)
    opts = SignedHeatOptions(dtype="float32")

    s1 = SignedHeatTetSolver()
    r1 = s1.compute_distance(mesh, opts)
    assert s1.last_stats["step3_path"] == "crouzeix-raviart"
    keys = _tree_arrays(tmp_path)
    assert any(k.startswith("r.cr.") for k in keys)
    # lean artifact: no vertex-path solve state persisted alongside CR
    assert not any("H_ell" in k for k in keys), sorted(keys)[:10]

    # --no-cr in a fresh process: vertex ops build lazily from the cached
    # mesh AND the upgrade is merged back into the artifact
    s2 = SignedHeatTetSolver()
    nocr = opts.with_(use_crouzeix_raviart=False)
    r2 = s2.compute_distance(mesh, nocr)
    assert s2.last_stats["step3_path"] == "vertex"
    keys = _tree_arrays(tmp_path)
    assert any("H_ell" in k for k in keys)

    # third process: loads the upgraded artifact, same vertex answer
    s3 = SignedHeatTetSolver()
    r3 = s3.compute_distance(mesh, nocr)
    assert s3.last_stats["step3_path"] == "vertex"
    assert _rel(r3.phi, r2.phi) < 1e-6

    # the CR default still loads and reproduces the original answer
    s4 = SignedHeatTetSolver()
    r4 = s4.compute_distance(mesh, opts)
    assert s4.last_stats["step3_path"] == "crouzeix-raviart"
    assert _rel(r4.phi, r1.phi) < 1e-6


def test_greedy_artifact_upgrades_to_cr(tmp_path, monkeypatch):
    monkeypatch.setenv("SHM3D_CACHE_DIR", str(tmp_path))
    mesh = make_icosphere(2)
    opts = SignedHeatOptions(dtype="float32")

    s0 = SignedHeatTetSolver()
    s0.compute_distance(mesh, opts.with_(fast_integration=True))
    assert s0.last_stats["step3_path"] == "greedy"
    keys = _tree_arrays(tmp_path)
    # greedy artifact: neither family persisted
    assert not any(k.startswith("r.cr.ell") for k in keys)
    assert not any("H_ell" in k for k in keys)

    # exact CR solve on the greedy-keyed artifact: CR state builds on
    # demand and matches a from-scratch CR solve
    s1 = SignedHeatTetSolver()
    r1 = s1.compute_distance(mesh, opts)
    assert s1.last_stats["step3_path"] == "crouzeix-raviart"
    assert any(k.startswith("r.cr.ell") for k in _tree_arrays(tmp_path))

    ref = SignedHeatTetSolver().compute_distance(
        mesh, opts.with_(disk_cache=False))
    assert _rel(r1.phi, ref.phi) < 1e-6


def test_tetmesh_int32_pack_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("SHM3D_CACHE_DIR", str(tmp_path))
    from shm3d.tet import mesher
    from shm3d.tet.solver import build_tet_domain
    from shm3d.utils import treestore

    pts = np.asarray(make_icosphere(1).vertices)
    m = build_tet_domain(pts, 2.0, 0.0, mean_area=1e-2)
    treestore.save_tree(("tetmesh-pack-test",), {"m": m})
    m2 = treestore.load_tree(("tetmesh-pack-test",))["m"]
    for f in mesher._TETMESH_I64:
        a, b = getattr(m, f), getattr(m2, f)
        if a is None:
            assert b is None
            continue
        assert b.dtype == a.dtype, f
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(m.vertices, m2.vertices)
    assert (m.n_src, m.conforming) == (m2.n_src, m2.conforming)
    # the on-disk copy is int32 (the point of the packing)
    keys = _tree_arrays(tmp_path)
    assert "r.m!.tets" in keys
