"""Numerical sanitizer: runtime validation of solver invariants (SURVEY §5.2).

The reference's only sanitizer is AddressSanitizer in clang Debug builds
(/root/reference/CMakeLists.txt:32) — memory errors are not the TPU failure
mode.  What corrupts a JAX solver silently is *numerics*: NaN/Inf escaping a
guard, an operator whose hand-written adjoint drifted from its forward, a
"projected" iterate leaving the constraint null space.  This module is the
ASan analog for those: cheap randomized invariant checks at phase boundaries,
off by default, enabled by ``SHM3D_DEBUG=1`` or the CLI ``--debug`` flag.

Checks are host-side (they pull small reductions, not full arrays, where
possible) and raise ``NumericalCheckError`` with the failing phase named, so a
corrupted solve fails loudly at the first bad phase instead of returning
garbage phi.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

ENABLED: bool = bool(os.environ.get("SHM3D_DEBUG", ""))


class NumericalCheckError(AssertionError):
    pass


def enabled() -> bool:
    return ENABLED


def enable(flag: bool = True) -> None:
    global ENABLED
    ENABLED = flag


def check_finite(name: str, arr, allow_fraction: float = 0.0) -> None:
    """All entries finite (device reduction; one scalar crosses the host
    boundary).  ``allow_fraction`` tolerates a bounded fraction of
    non-finite entries — Step 1 legitimately produces NaN directions at
    grid nodes coinciding with a source (the Yukawa 1/r singularity that
    the reference's divergence guard zeroes afterwards,
    /root/reference/src/signed_heat_grid_solver.cpp:72-74)."""
    if not ENABLED:
        return
    import jax.numpy as jnp

    a = jnp.asarray(arr)
    bad = float(jnp.mean((~jnp.isfinite(a)).astype(jnp.float32)))
    if bad > allow_fraction:
        raise NumericalCheckError(
            f"{name}: {bad:.2%} non-finite entries (allowed {allow_fraction:.2%})"
        )


def check_adjoint(name: str, fwd: Callable, adj: Callable, shape_in, shape_out,
                  dtype=np.float64, rtol: float = 1e-4, seed: int = 0) -> None:
    """Randomized adjointness: <fwd(x), y> == <x, adj(y)>.

    Catches forward/adjoint drift in hand-paired operators (the gradient /
    divergence pair, segment-sum FEM assemblies).  One random probe is an
    unbiased detector: a systematic mismatch fails with probability 1."""
    if not ENABLED:
        return
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape_in), dtype)
    y = jnp.asarray(rng.standard_normal(shape_out), dtype)
    lhs = float(jnp.vdot(jnp.asarray(fwd(x)).ravel(), y.ravel()))
    rhs = float(jnp.vdot(x.ravel(), jnp.asarray(adj(y)).ravel()))
    scale = max(abs(lhs), abs(rhs), np.finfo(np.float64).tiny)
    if abs(lhs - rhs) / scale > rtol:
        raise NumericalCheckError(
            f"{name}: adjoint mismatch <Ax,y>={lhs:.6e} vs <x,A*y>={rhs:.6e}"
        )


def check_symmetric(name: str, matvec: Callable, n: int, dtype=np.float64,
                    rtol: float = 1e-4, seed: int = 0) -> None:
    """Randomized symmetry of an implicit operator: <Ax, y> == <x, Ay>.
    The CG solves assume symmetry; an asymmetric assembly (e.g. a bad
    segment-sum dedup) makes CG silently wrong rather than failing."""
    if not ENABLED:
        return
    check_adjoint(name, matvec, matvec, (n,), (n,), dtype, rtol, seed)


def check_constraint(name: str, u, a_apply: Callable, b_scale: float,
                     rtol: float = 1e-3) -> None:
    """Projected iterates must satisfy A u ≈ 0 relative to the RHS scale —
    the null-space method's core invariant (shm3d.solve.projection)."""
    if not ENABLED:
        return
    import jax.numpy as jnp

    viol = float(jnp.linalg.norm(jnp.asarray(a_apply(u))))
    if not np.isfinite(viol) or viol > rtol * max(b_scale, np.finfo(np.float64).tiny):
        raise NumericalCheckError(
            f"{name}: constraint violation |Au|={viol:.3e} "
            f"(rhs scale {b_scale:.3e}, rtol {rtol})"
        )


def check_unit_field(name: str, Y, rtol: float = 1e-2,
                     allow_fraction: float = 1e-3) -> None:
    """Step-2 output rows are unit vectors (reference normalizes inline,
    /root/reference/src/signed_heat_grid_solver.cpp:60-62).  NaN rows (the
    coincident-node singularity) are exempt up to ``allow_fraction``."""
    if not ENABLED:
        return
    import jax.numpy as jnp

    norms = jnp.linalg.norm(jnp.asarray(Y), axis=-1)
    finite = jnp.isfinite(norms)
    bad_nan = float(jnp.mean((~finite).astype(jnp.float32)))
    off = jnp.where(finite, jnp.abs(norms - 1.0), 0.0)
    worst = float(jnp.max(off))
    if bad_nan > allow_fraction or worst > rtol:
        raise NumericalCheckError(
            f"{name}: non-unit field (max |‖Y‖-1| = {worst:.3e}, "
            f"{bad_nan:.2%} non-finite rows)"
        )
