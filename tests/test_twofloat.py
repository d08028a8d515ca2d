"""Two-float (double-f32) defect correction (solve/twofloat, round 4).

The grid default accuracy tier moved from host-f64 residuals (hundreds of
MB over the TPU tunnel per pass) to device-resident error-free pair
arithmetic.  These tests pin (1) the error-free transforms themselves,
(2) the pair stencils against f64 references including the adjoint
structure of the divergence, and (3) end-to-end: pair-mode refinement
reaches the same accuracy as the legacy host-f64 mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm3d.config import SignedHeatOptions
from shm3d.ops import stencil
from shm3d.solve import twofloat as tf


def _pair64(p):
    return np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)


def test_error_free_transforms():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal(4096) * 10.0 ** rng.integers(
        -6, 6, 4096), jnp.float32)
    b = jnp.asarray(rng.standard_normal(4096) * 10.0 ** rng.integers(
        -6, 6, 4096), jnp.float32)
    s, e = tf.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(_pair64((s, e)), exact)  # exact, not close
    p, pe = tf.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(_pair64((p, pe)), exact)


def test_error_free_transforms_f64():
    """The Dekker split constant must follow the input dtype: with the f32
    constant (4097) the f64 two_prod silently loses the error-free property
    (advisor r4).  Verified via exact Fraction arithmetic."""
    from fractions import Fraction

    rng = np.random.default_rng(7)
    a64 = rng.standard_normal(512) * 10.0 ** rng.integers(-8, 8, 512)
    b64 = rng.standard_normal(512) * 10.0 ** rng.integers(-8, 8, 512)
    p, pe = tf.two_prod(jnp.asarray(a64, jnp.float64),
                        jnp.asarray(b64, jnp.float64))
    p, pe = np.asarray(p), np.asarray(pe)
    for i in range(0, 512, 37):
        exact = Fraction(a64[i]) * Fraction(b64[i])
        assert Fraction(p[i]) + Fraction(pe[i]) == exact
    s, e = tf.two_sum(jnp.asarray(a64, jnp.float64),
                      jnp.asarray(b64, jnp.float64))
    s, e = np.asarray(s), np.asarray(e)
    for i in range(0, 512, 37):
        assert Fraction(s[i]) + Fraction(e[i]) == (Fraction(a64[i])
                                                   + Fraction(b64[i]))


def test_pair_stencils_match_f64():
    rng = np.random.default_rng(5)
    n, h = 19, 0.0371
    Y = rng.standard_normal((n, n, n, 3)).astype(np.float32)
    d64 = np.asarray(stencil.divergence_apply(
        jnp.asarray(Y, jnp.float64), np.float64(h)))
    dp = _pair64(stencil.divergence_apply_pair(jnp.asarray(Y), h))
    assert np.linalg.norm(dp - d64) / np.linalg.norm(d64) < 1e-13

    u64 = rng.standard_normal((n, n, n))
    u_hi = u64.astype(np.float32)
    u_lo = (u64 - u_hi).astype(np.float32)
    l64 = np.asarray(stencil.laplacian_apply(
        jnp.asarray(u_hi, jnp.float64) + jnp.asarray(u_lo, jnp.float64),
        np.float64(h)))
    lp = _pair64(stencil.laplacian_apply_pair(
        jnp.asarray(u_hi), jnp.asarray(u_lo), h))
    # the Laplacian of random data cancels ~nothing; compare against the
    # magnitude of the operands to bound the pair error meaningfully
    assert np.abs(lp - l64).max() < 1e-10 * np.abs(u64).max() / h ** 2


@pytest.mark.parametrize("is_mesh_guard", [False, True])
def test_pair_rhs_nan_guard(is_mesh_guard):
    from shm3d.solvers.grid import _pair_rhs

    n = 8
    Y = np.ones((n * n * n, 3), np.float32)
    Y[0, 0] = np.inf
    hi, lo = _pair_rhs(jnp.asarray(Y), 0.5, (n, n, n), is_mesh_guard)
    if is_mesh_guard:
        assert np.isfinite(np.asarray(hi)).all()
    else:
        assert not np.isfinite(np.asarray(hi)).all()


def test_refine_pair_matches_host_mode():
    """End-to-end: f32 solve + pair refinement == f32 solve + host-f64
    refinement to the refine target, on the same geometry."""
    from shm3d.geometry.procedural import make_icosphere
    from shm3d.solvers.grid import GridSolver

    mesh = make_icosphere(1)
    base = SignedHeatOptions(dtype="float32", h_coef=1.0, refine_steps=3,
                             refine_target=1e-10, disk_cache=False)
    s1 = GridSolver()
    r_pair = s1.compute_distance(mesh, base.with_(refine_mode="pair"))
    rel1 = s1.last_stats["refine_rel_res"]
    s2 = GridSolver()
    r_host = s2.compute_distance(mesh, base.with_(refine_mode="host"))
    rel2 = s2.last_stats["refine_rel_res"]
    assert rel1 <= 1e-9, rel1   # pair residuals support deep refinement
    assert rel2 <= 1e-9, rel2
    rel = (np.linalg.norm(r_pair.phi - r_host.phi)
           / np.linalg.norm(r_host.phi))
    assert rel < 1e-7, rel
