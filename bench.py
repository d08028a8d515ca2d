#!/usr/bin/env python
"""Benchmark harness: end-to-end signed-distance solve on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (BASELINE.md config ⑤): SprayBottle.pc (52,290 oriented
points) on a 128^3 grid (hCoef=3), exact (KKT) integration, f32 device path.
The reference publishes no numbers (README.md:75-81 — "There is no
acceleration applied in this program"); vs_baseline is measured against the
north-star target of 1.0 s for a warm solve (BASELINE.json "north_star"),
value/target, so < 1.0 means the target is beaten.

Timing protocol (BASELINE.md): warm operator cache with one cold solve, then
median of 3 warm re-solves (the reference's own caching contract,
/root/reference/src/main.cpp:113).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATA = os.environ.get("SHM3D_DATA", "/root/reference/data")
NORTH_STAR_S = 1.0


def _backend_reachable() -> bool:
    """Probe device availability in a SUBPROCESS with a hard timeout.

    jax backend init hangs indefinitely when the TPU tunnel's remote side
    is down (observed: a 6+ hour worker outage in round 3 turned the bench
    into rc=124 with no output).  A probe that cannot hang lets the
    harness emit an honest error JSON instead of silence.  Two attempts
    guard against a healthy-but-congested tunnel being misread as an
    outage (backend init + the tiny matmul compile normally finish in
    tens of seconds; 2 x 300 s is a wide margin, and
    SHM3D_BENCH_PROBE_TIMEOUT widens it further if needed)."""
    import subprocess

    if os.environ.get("SHM3D_BENCH_NO_PROBE"):
        return True
    timeout_s = float(os.environ.get("SHM3D_BENCH_PROBE_TIMEOUT", "300"))
    for _ in range(2):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "x = jnp.ones((128, 128)); (x @ x).block_until_ready(); "
                 "print('OK')"],
                capture_output=True, text=True, timeout=timeout_s)
            if r.returncode == 0 and "OK" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    import numpy as np

    if not _backend_reachable():
        print(json.dumps({
            "metric": "spraybottle_pc_h3_grid128_warm_solve",
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "detail": {"error": "device backend unreachable: probe program "
                                "failed twice within the timeout (TPU "
                                "tunnel outage)"},
        }), flush=True)
        return

    from shm3d.config import SignedHeatOptions
    from shm3d.io.mesh_io import read_geometry
    from shm3d.solvers.grid import GridSolver
    from shm3d.utils.jaxcache import enable_compilation_cache

    # Persistent XLA compilation cache: a driver-style fresh process reuses
    # compiled programs from disk instead of paying minutes of tunnel
    # compiles (VERDICT r1: 324 s driver cold vs 36.5 s warm-cache cold).
    enable_compilation_cache()

    path = os.path.join(DATA, "SprayBottle.pc")
    h_coef = 3.0
    if not os.path.exists(path):  # fallback asset
        path = os.path.join(DATA, "bunny.pc")

    geom = read_geometry(path)
    # Step 1 via the auto strategy (dense Pallas below 128^3, shell
    # decomposition at/above) and the projected MG-PCG Step 3 with
    # dtype-aware tolerance.
    opts = SignedHeatOptions(
        dtype="float32",
        h_coef=h_coef,
        refine_steps=0,
        solver_maxiter=2000,
        verbose=os.environ.get("SHM3D_BENCH_VERBOSE", "") != "",
    )
    solver = GridSolver()

    # Cold solve (discretize + compile + solve).  First compiles over the TPU
    # tunnel take minutes and occasionally kill the remote worker; compiled
    # programs are cached server-side, so a retry resumes cheaply.
    cold_s = cold_phases = None
    for attempt in range(3):
        t0 = time.time()
        try:
            solver.compute_distance(geom, opts)
            cold_s = time.time() - t0
            # cold breakdown (VERDICT r2 #2): host precompute vs Step 1 vs
            # Step 3 attribution of the cold path; whatever cold_s exceeds
            # their sum is compile + transfer overhead
            cold_phases = {k: round(v, 3) for k, v in
                           solver.last_stats.get("phases", {}).items()}
            break
        except Exception as e:  # jax.errors.JaxRuntimeError on worker restart
            print(f"# cold attempt {attempt} failed: {type(e).__name__}", file=sys.stderr)
            time.sleep(10)
    if cold_s is None:
        raise RuntimeError("benchmark cold solve failed after retries")

    # Warm protocol (one convention, BENCH_TABLE.md uses the same): the
    # timed span blocks on device completion of phi (compute_distance
    # returns only after the solve chain finishes); the (N,) device->host
    # transfer is measured separately as phi_transfer_s.
    times = []
    for _ in range(3):
        t0 = time.time()
        res = solver.compute_distance(geom, opts)
        times.append(time.time() - t0)
    warm_s = float(np.median(times))
    t0 = time.time()
    phi0 = res.phi  # pulls the host copy
    phi_transfer_s = time.time() - t0
    assert np.isfinite(phi0).all(), "non-finite phi in benchmark solve"

    # --- HEADLINE EMISSION (ADVICE r3): print the one-line JSON contract
    # NOW, before any optional section, so a timeout or worker crash in the
    # accuracy/256^3/sphere extras can no longer cost the round its headline
    # (BENCH_r03.json recorded rc=124, parsed=null).  Optional-section
    # results go to BENCH_DETAIL.json + stderr, never stdout.
    detail = {
        "asset": os.path.basename(path),
        "cold_s": round(cold_s, 2),
        "cold_phases_s": cold_phases,
        "warm_runs_s": [round(t, 4) for t in times],
        "grid": int(res.grid.n),
        "n_sources": int(geom.positions.shape[0]) if hasattr(geom, "positions") else None,
        "phi_transfer_s": round(phi_transfer_s, 4),
    }
    print(
        json.dumps(
            {
                "metric": "spraybottle_pc_h3_grid128_warm_solve",
                "value": round(warm_s, 4),
                "unit": "s",
                "vs_baseline": round(warm_s / NORTH_STAR_S, 4),
                "detail": detail,
            }
        ),
        flush=True,
    )

    # Optional sections below share a wall-clock budget; each checks the
    # remaining budget before starting so the process exits cleanly instead
    # of being killed mid-section by the driver's box.
    t_start = time.time()
    budget_s = float(os.environ.get("SHM3D_BENCH_BUDGET_S", "900"))

    def over_budget():
        return time.time() - t_start > budget_s

    # Accuracy at scale (VERDICT r1 item 3): measure BOTH tiers against an
    # f64 defect-corrected reference solve at the same config.  The reference
    # tier iterates host-f64 corrections until the exact f64 relative
    # residual of the projected KKT system is <= 1e-11 (matching
    # /root/reference/src/signed_heat_grid_solver.cpp:100-108's direct-LU
    # semantics to roundoff); rel-L2 of each tier's phi against it is the
    # honest accuracy number the warm timings pair with.
    accuracy = {}
    skip_acc = os.environ.get("SHM3D_BENCH_NO_ACCURACY", "") != "" or over_budget()
    if not skip_acc:
        # default tier (refine_steps=1): timing + phi
        opts1 = opts.with_(refine_steps=1)
        solver.compute_distance(geom, opts1)  # warm the refine path
        t1 = []
        for _ in range(3):
            t0 = time.time()
            res1 = solver.compute_distance(geom, opts1)
            t1.append(time.time() - t0)
        phi1 = res1.phi
        rel_res1 = solver.last_stats.get("refine_rel_res")

        # f64 defect-corrected reference
        opts_ref = opts.with_(refine_steps=10, refine_target=1e-11)
        res_ref = solver.compute_distance(geom, opts_ref)
        phi_ref = res_ref.phi
        ref_nrm = float(np.linalg.norm(phi_ref))
        accuracy = {
            "rel_l2_fast_tier": float("%.3e" % (float(np.linalg.norm(phi0 - phi_ref)) / ref_nrm)),
            "rel_l2_default_tier": float("%.3e" % (float(np.linalg.norm(phi1 - phi_ref)) / ref_nrm)),
            "warm_default_tier_s": round(float(np.median(t1)), 4),
            "default_tier_rel_res": rel_res1,
            "ref_tier_rel_res": solver.last_stats.get("refine_rel_res"),
        }

    # 256^3: the north-star scale (BASELINE.json couples < 1 s AND
    # rel-L2 <= 1e-5 at 256^3; VERDICT r2 #3).  Same protocol as the 128^3
    # headline: fast + default tiers timed warm, rel-L2 of each against a
    # refine-to-convergence f64 reference at the same discretization.
    g256 = {}
    if not skip_acc and os.environ.get("SHM3D_BENCH_NO_256", "") == "" \
            and not over_budget():
        o256 = opts.with_(h_coef=4.0)
        solver.compute_distance(geom, o256)  # warm
        tf = []
        for _ in range(3):
            t0 = time.time()
            r256 = solver.compute_distance(geom, o256)
            tf.append(time.time() - t0)
        phi_f = r256.phi
        o256d = o256.with_(refine_steps=1)
        solver.compute_distance(geom, o256d)  # warm the refine path
        td = []
        for _ in range(3):
            t0 = time.time()
            r256d = solver.compute_distance(geom, o256d)
            td.append(time.time() - t0)
        phi_d = r256d.phi
        ref256 = solver.compute_distance(
            geom, o256.with_(refine_steps=8, refine_target=1e-11)).phi
        nrm = float(np.linalg.norm(ref256))
        g256 = {
            "warm_fast_tier_s": round(float(np.median(tf)), 4),
            "warm_default_tier_s": round(float(np.median(td)), 4),
            "rel_l2_fast_tier": float("%.3e" % (float(np.linalg.norm(phi_f - ref256)) / nrm)),
            "rel_l2_default_tier": float("%.3e" % (float(np.linalg.norm(phi_d - ref256)) / nrm)),
            "ref_tier_rel_res": solver.last_stats.get("refine_rel_res"),
        }

    # Analytic cross-check (VERDICT r2 weak #4: the reference tier above is
    # the same solver refined — self-referential).  A unit sphere has a
    # closed-form signed distance |x - c| - R; the solve's deviation from it
    # is discretization error (O(h) of the method itself, NOT solver error)
    # plus solver error, so it upper-bounds the latter with independent
    # ground truth.
    sphere = {}
    if not skip_acc and os.environ.get("SHM3D_BENCH_NO_SPHERE", "") == "" \
            and not over_budget():
        from shm3d.geometry.procedural import make_icosphere

        sph = make_icosphere(4, radius=1.0)
        for h, tag in ((3.0, "sphere_grid128"), (4.0, "sphere_grid256")):
            so = opts.with_(h_coef=h, refine_steps=1)
            rs = solver.compute_distance(sph, so)
            from shm3d.ops.farfield import _positions_of

            g = rs.grid
            pos = _positions_of(np.arange(int(g.n) ** 3, dtype=np.int64), g)
            exact = np.linalg.norm(pos.astype(np.float64), axis=1) - 1.0
            err = np.asarray(rs.phi, np.float64) - exact
            sphere[tag] = {
                "rel_l2_vs_analytic": float("%.3e" % (
                    float(np.linalg.norm(err)) / float(np.linalg.norm(exact)))),
                "max_abs_err": float("%.3e" % float(np.abs(err).max())),
            }

    # Full detail (headline + optional sections) to a side file + stderr;
    # stdout already carried the one-line contract above.
    detail.update(accuracy=accuracy, grid256=g256, sphere_analytic=sphere)
    full = {
        "metric": "spraybottle_pc_h3_grid128_warm_solve",
        "value": round(warm_s, 4),
        "unit": "s",
        "vs_baseline": round(warm_s / NORTH_STAR_S, 4),
        "detail": detail,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_DETAIL.json")
    try:
        with open(out, "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    print(json.dumps(full), file=sys.stderr)


if __name__ == "__main__":
    main()
