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


def main():
    import numpy as np

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
    # Dense Pallas Step 1 (the block-sparse culled variant kept 66% of the
    # pair grid at this config — not worth its SMEM segmentation overhead)
    # and the projected MG-PCG Step 3 with dtype-aware tolerance.
    opts = SignedHeatOptions(
        dtype="float32",
        h_coef=h_coef,
        refine_steps=0,
        solver_maxiter=2000,
        cull_eps=0.0,
        verbose=os.environ.get("SHM3D_BENCH_VERBOSE", "") != "",
    )
    solver = GridSolver()

    # Cold solve (discretize + compile + solve).  First compiles over the TPU
    # tunnel take minutes and occasionally kill the remote worker; compiled
    # programs are cached server-side, so a retry resumes cheaply.
    cold_s = None
    for attempt in range(3):
        t0 = time.time()
        try:
            solver.compute_distance(geom, opts)
            cold_s = time.time() - t0
            break
        except Exception as e:  # jax.errors.JaxRuntimeError on worker restart
            print(f"# cold attempt {attempt} failed: {type(e).__name__}", file=sys.stderr)
            time.sleep(10)
    if cold_s is None:
        raise RuntimeError("benchmark cold solve failed after retries")

    times = []
    for _ in range(3):
        t0 = time.time()
        res = solver.compute_distance(geom, opts)
        times.append(time.time() - t0)
    warm_s = float(np.median(times))

    assert np.isfinite(res.phi).all(), "non-finite phi in benchmark solve"
    print(
        json.dumps(
            {
                "metric": "spraybottle_pc_h3_grid128_warm_solve",
                "value": round(warm_s, 4),
                "unit": "s",
                "vs_baseline": round(warm_s / NORTH_STAR_S, 4),
                "detail": {
                    "asset": os.path.basename(path),
                    "cold_s": round(cold_s, 2),
                    "warm_runs_s": [round(t, 4) for t in times],
                    "grid": int(res.grid.n),
                    "n_sources": int(geom.positions.shape[0]) if hasattr(geom, "positions") else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
