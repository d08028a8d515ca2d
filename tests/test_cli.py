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
