"""Driver-contract tests for __graft_entry__ (entry + dryrun_multichip).

Round 1's dryrun failed under the driver environment because it assumed the
caller had already forced the CPU backend (MULTICHIP_r01.json: "need 8
devices, have 1").  The subprocess test below reproduces the driver env
(no XLA_FLAGS, platform preset left to the environment) and requires
``dryrun_multichip`` to claim its own backend.
"""

import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, example = g.entry()
    phi = jax.jit(fn)(*example)
    phi.block_until_ready()
    assert phi.shape == (16 ** 3,)
    assert bool(np.all(np.isfinite(np.asarray(phi))))


def test_dryrun_multichip_in_process():
    """conftest already forced 8 CPU devices; the dryrun must work here."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_claims_backend_in_driver_env():
    """Fresh subprocess WITHOUT XLA_FLAGS: dryrun_multichip must force the
    CPU backend and the virtual device count itself."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, f"stderr:\n{out.stderr[-2000:]}"
    assert "DRYRUN_OK" in out.stdout
