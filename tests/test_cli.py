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
