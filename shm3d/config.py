"""Configuration for the signed heat method (SHM) in 3D.

Mirrors the reference options struct ``SignedHeat3DOptions``
(/root/reference/include/signed_heat_3d.h:20-28) plus TPU-specific knobs the
reference does not have (dtype policy, iterative-solver controls, Step-1
strategy).  One dataclass, CLI-overridable, no hidden GUI-only knobs
(SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class LevelSetConstraint(enum.Enum):
    """Constraint mode for Step 3 (reference: geometry-central
    ``LevelSetConstraint``, used at /root/reference/src/main.cpp:54,150-153).

    - ZERO_SET: pin phi = 0 on the source geometry (Dirichlet elimination).
    - MULTIPLE: per-connected-component equality constraints (KKT saddle).
    - NONE: unconstrained solve followed by a mean shift along the source.
    """

    ZERO_SET = "zero_set"
    MULTIPLE = "multiple"
    NONE = "none"


@dataclasses.dataclass(frozen=True)
class SignedHeatOptions:
    """Options controlling a signed-distance solve.

    Defaults follow /root/reference/include/signed_heat_3d.h:20-28:
    levelSetConstraint=ZeroSet, tCoef=1.0, hCoef=0.0, scale=2.0,
    useCrouzeixRaviart=true, fastIntegration=false.  The reference's
    ``rebuild`` flag is replaced by keyed operator caching (SURVEY.md §5.4);
    see shm3d.solve.cache.
    """

    level_set_constraint: LevelSetConstraint = LevelSetConstraint.ZERO_SET
    t_coef: float = 1.0
    h_coef: float = 0.0
    scale: float = 2.0
    use_crouzeix_raviart: bool = True
    fast_integration: bool = False
    # Conforming tet domain: recover the source surface as tet faces
    # (reference TETFLAGS_PRESERVE path, signed_heat_tet_solver.cpp:885-1016).
    # False forces the vertex-path (non-conforming) mesh on triangle meshes.
    conforming: bool = True

    # --- TPU-framework extensions (absent in the reference) ---
    # Compute dtype for the device path. float32 is the TPU-native choice;
    # float64 works on CPU (tests/oracle parity) and, slowly, on TPU.
    dtype: str = "float32"
    # Step-1 evaluation strategy on the grid domain:
    #   "dense" — exact pairwise kernel at every node (reference semantics,
    #             /root/reference/src/signed_heat_grid_solver.cpp:48-65).
    #   "shell" — exact kernel on the near-surface shell (lam*d <= shell_t)
    #             and on a coarsened node lattice, trilinear direction
    #             interpolation elsewhere (shm3d.ops.farfield; the
    #             "hierarchical summation" the reference defers,
    #             README.md:77-81).  ~10x fewer pairs at 128^3+.
    #   "auto"  — "shell" for grids >= shell_auto_n nodes/axis, else "dense".
    step1_method: str = "auto"
    shell_t: float = 8.0
    shell_coarse_factor: int = 4
    shell_auto_n: int = 128
    # Iterative solver controls (device path). The reference uses direct
    # sparse factorization (CHOLMOD/LU via geometry-central); the TPU path
    # uses matrix-free CG/MINRES with multigrid preconditioning (SURVEY.md §7).
    # solver_tol=None resolves per dtype (see resolved_solver_tol): float32
    # Krylov solves hit a roundoff floor well above f64-meaningful tolerances,
    # so a fixed tight default would burn maxiter on TPU.
    solver_tol: Optional[float] = None
    solver_maxiter: int = 10000
    # Grid Step-3 algorithm: "projected_cg" (null-space method: MG-PCG on
    # P H P u = P b — converges in tens of iterations at any grid size) or
    # "minres_kkt" (block-preconditioned MINRES on the saddle; retained for
    # comparison, not mesh-independent).
    solver_method: str = "projected_cg"
    # At-scale grid pinning tier: when the per-occupied-cell constraint row
    # count exceeds the exact-orthonormalization cap (projection.
    # ORTHO_GRAM_CAP), the f32 device solve pins a spatially subsampled
    # subset of at most this many rows (one per cell brick — spatial
    # separation keeps the subset's Gram well-conditioned, so the whitened
    # projector is f32-stable and the whole Step 3 stays on device).  The
    # f64 defect correction projects with the FULL row set, restoring exact
    # constraint parity.  None disables subsampling: Step 3 then runs the
    # host-projected loop (exact f64 Gram solves every iteration; ~20x
    # slower at 256^3 over the TPU tunnel).
    max_device_pins: Optional[int] = 4096
    # Iterative refinement: after an f32 solve, compute the residual in f64 on
    # host/device and correct. Gives near-f64 accuracy at f32 speed. Skipped
    # when the f64 relative residual is already below refine_target.
    refine_steps: int = 1
    refine_target: float = 1e-9
    # Relative tolerance of each tet-path defect-CORRECTION solve (the
    # refinement only needs a modest contraction per pass; the final
    # accuracy is the product of per-pass contractions).  Chasing the
    # primary solve's tolerance on the correction rhs is pathological on
    # ill-conditioned CR systems: the f64 residual concentrates on sliver
    # modes (the dual of a random rhs, dev-notes knot study) — measured
    # knot@h=1: the first CR solve converges in 79 iterations, the
    # correction solve then burned 1,232 more crawling to its f32 floor
    # (~15x the primary cost for one decade beyond 1e-7).
    refine_solver_tol: float = 1e-2
    # Residual precision source for the grid-path refinement:
    #   "pair" (default) — device-resident two-float (double-f32) residuals
    #     (solve/twofloat): no bulk host<->device transfers; at 256^3 over
    #     the remote TPU tunnel the old host path spent ~60 s/solve moving
    #     the (N,3) field + (N,) iterates and running slow-host stencils.
    #   "host" — the round-2/3 behavior: exact NumPy f64 residuals on host.
    refine_mode: str = "pair"
    # Verbose per-phase timing (reference: VERBOSE stderr diagnostics,
    # /root/reference/src/main.cpp:76-101).
    verbose: bool = False
    # Persist operator-cache artifacts (source quadrature, constraint rows,
    # Gram factor) to $SHM3D_CACHE_DIR so cold runs in NEW processes skip
    # tens of seconds of host precompute (SURVEY.md §5.4; the reference's
    # rebuild-flag cache is per-process only).
    disk_cache: bool = True

    def __post_init__(self):
        # fail loudly on misconfiguration: a typo'd refine_mode used to fall
        # through to the slow host-f64 path silently (advisor r4)
        if self.refine_mode not in ("pair", "host"):
            raise ValueError(
                f"refine_mode={self.refine_mode!r}; expected 'pair' or 'host'")
        if self.step1_method not in ("auto", "dense", "shell"):
            raise ValueError(
                f"step1_method={self.step1_method!r}; expected "
                "'auto', 'dense' or 'shell'")
        if self.solver_method not in ("projected_cg", "minres_kkt"):
            raise ValueError(
                f"solver_method={self.solver_method!r}; expected "
                "'projected_cg' or 'minres_kkt'")

    def with_(self, **kwargs) -> "SignedHeatOptions":
        return dataclasses.replace(self, **kwargs)

    def refine_pass_budget(self, rel0: float) -> int:
        """Defect-correction pass budget given the measured starting
        relative residual ``rel0``.

        Each correction pass contracts the true residual by roughly
        ``refine_solver_tol`` (its loose per-pass target), so reaching
        ``refine_target`` from ``rel0`` takes about
        ``log(target/rel0)/log(tol)`` passes.  With a fixed single pass the
        default tier (refine_steps=1, tol=1e-2) landed ~100x short of
        refine_target on ill-conditioned CR systems (advisor r4); the
        budget is derived instead, with ``refine_steps`` as the user floor
        (0 still disables refinement) and a hard cap of 8 passes so a
        stalled solve cannot loop unboundedly — the loops also stop early
        on stagnation (see _refined_solve / _refine)."""
        import math

        if self.refine_steps <= 0:
            return 0
        if not (rel0 > self.refine_target) or not math.isfinite(rel0):
            return self.refine_steps
        contraction = min(self.refine_solver_tol, 0.5)
        need = math.ceil(math.log(self.refine_target / rel0)
                         / math.log(contraction))
        return max(self.refine_steps, min(need, 8))

    def resolved_solver_tol(self, dtype_name: Optional[str] = None) -> float:
        """Dtype-aware solver tolerance: float32 Krylov residuals stall near
        their roundoff floor (~1e-5 with MG-PCG), so the default tolerance
        must not chase f64 accuracy on an f32 device path."""
        if self.solver_tol is not None:
            return self.solver_tol
        return 1e-5 if (dtype_name or self.dtype) == "float32" else 1e-10

    def cache_key(self) -> tuple:
        """Key over the options that affect the cached discretization /
        operator artifacts (reference contract: rebuild on hCoef change,
        /root/reference/src/main.cpp:146-147)."""
        return (self.h_coef, self.scale, self.dtype, self.conforming,
                self.max_device_pins)
