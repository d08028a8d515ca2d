#!/usr/bin/env python
"""Full benchmark sweep: the five BASELINE.md measurement configs.

Prints one JSON line per config (same schema as bench.py) plus a final
summary line, and writes a markdown table to BENCH_TABLE.md.  The headline
driver metric stays in bench.py; this harness is the regression sweep for
the whole BASELINE matrix (configs ①-⑤, /root/repo/BASELINE.md):

  1. bunny_small.obj  grid h=0, fast (greedy) integration
  2. knot.obj         tet domain h=1, exact integration (CR path)
  3. bunny.pc         grid h=0, exact integration
  4. polygon-bear.obj tet domain (non-conforming fallback path)
  5. SprayBottle.pc   grid h=3 and h=4, exact integration

Timing protocol (BASELINE.md): one cold solve (discretize + compile +
solve), then median of 3 warm re-solves against the hot operator cache
(the reference's own caching contract, /root/reference/src/main.cpp:113).

Usage: python bench_all.py [--configs 1,2,5a] [--json-only]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATA = os.environ.get("SHM3D_DATA", "/root/reference/data")


def _solve_config(name, asset, domain, opts_kw, warm_runs=3):
    import numpy as np

    from shm3d.api import SignedHeatSolver
    from shm3d.config import SignedHeatOptions
    from shm3d.io.mesh_io import read_geometry
    from shm3d.utils.jaxcache import enable_compilation_cache

    # same persistent-XLA-cache policy as bench.py: fresh processes reuse
    # compiled programs from disk instead of paying tunnel compiles again
    enable_compilation_cache()

    path = os.path.join(DATA, asset)
    if not os.path.exists(path):
        return {"metric": name, "skipped": f"asset {asset} missing"}
    geom = read_geometry(path)
    opts = SignedHeatOptions(dtype="float32", refine_steps=0, **opts_kw)
    solver = SignedHeatSolver(domain)

    t0 = time.time()
    res = solver.compute_distance(geom, opts)
    phi = res.phi  # block on the host transfer for honest cold timing
    cold_s = time.time() - t0

    # Warm protocol (same convention as bench.py): the timed span blocks on
    # device completion of phi; the device->host transfer is reported
    # separately (phi_transfer_s).
    times = []
    for _ in range(warm_runs):
        t0 = time.time()
        res = solver.compute_distance(geom, opts)
        times.append(time.time() - t0)
    warm_s = float(np.median(times))
    t0 = time.time()
    phi = res.phi
    transfer_s = time.time() - t0
    assert np.isfinite(phi).all(), f"{name}: non-finite phi"
    n_dof = int(phi.shape[0])
    return {
        "metric": name,
        "value": round(warm_s, 4),
        "unit": "s",
        "detail": {
            "asset": asset,
            "cold_s": round(cold_s, 2),
            "warm_runs_s": [round(t, 4) for t in times],
            "phi_transfer_s": round(transfer_s, 4),
            "n_dof": n_dof,
            "phi_range": [round(float(phi.min()), 5), round(float(phi.max()), 5)],
            "step3_path": solver.last_stats.get("step3_path"),
            # warm per-phase split (from the final warm run): Step 1 vs
            # Step 3 attribution at scale (VERDICT r1 weak #7)
            "phases_s": {k: round(v, 4) for k, v in
                         solver.last_stats.get("phases", {}).items()},
            # solve internals (VERDICT r2 #8): iteration counts, device
            # programs used and their wall clock, AMG shape — so the next
            # perf regression is a JSON diff, not a timeout
            "solve": {k: solver.last_stats[k]
                      for k in ("iters", "residual", "rel_res", "proj_iters",
                                "chunks", "proj_chunks", "amg_sizes",
                                "iter_seconds_est")
                      if k in solver.last_stats},
        },
    }


CONFIGS = {
    # ① small mesh, grid, greedy integration
    "1": ("bunny_small_grid16_fast", "bunny_small.obj", "grid",
          dict(h_coef=0.0, fast_integration=True)),
    # ② medium mesh, tet domain, exact integration (CR face path)
    "2": ("knot_tet_h1_exact", "knot.obj", "tet", dict(h_coef=1.0)),
    # ③ small point cloud, grid, exact integration
    "3": ("bunny_pc_grid16_exact", "bunny.pc", "grid", dict(h_coef=0.0)),
    # ④ polygon mesh → non-conforming tet fallback
    "4": ("polygon_bear_tet_fallback", "polygon-bear.obj", "tet", dict()),
    # ⑤ large point cloud, grid, at scale
    "5a": ("spraybottle_pc_grid128_exact", "SprayBottle.pc", "grid",
           dict(h_coef=3.0, solver_maxiter=2000)),
    "5b": ("spraybottle_pc_grid256_exact", "SprayBottle.pc", "grid",
           dict(h_coef=4.0, solver_maxiter=2000)),
}


def _run_one_subprocess(key: str, timeout_s: int):
    """Run one config in a FRESH interpreter and parse its JSON line.

    Isolation is load-bearing on the tunneled TPU: the worker's HBM reclaim
    for a dead/errored client can lag, so consecutive large configs in one
    process turn a single RESOURCE_EXHAUSTED into a poisoned sweep
    (round-4 bench: knot OOM'd and every later config — even the 16^3
    ones — failed in the same process).  A fresh client per config also
    matches the BASELINE cold protocol (cold = fresh-process first solve)."""
    import subprocess

    name = CONFIGS[key][0]
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", key],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"metric": name, "error": f"timeout after {timeout_s} s"}
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
    return {"metric": name,
            "error": f"no JSON (rc={proc.returncode}): {' | '.join(tail)}"}


#: generous per-config wall bound: first-ever Pallas compiles at knot scale
#: take minutes over the tunnel (CLAUDE.md) on top of host meshing
_CONFIG_TIMEOUT_S = int(os.environ.get("SHM3D_BENCH_CONFIG_TIMEOUT", "2700"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS),
                    help="comma-separated subset of " + ",".join(CONFIGS))
    ap.add_argument("--json-only", action="store_true",
                    help="skip the BENCH_TABLE.md write")
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--in-process", action="store_true",
                    help="run configs in this process (no subprocess isolation)")
    args = ap.parse_args()

    if args.one is not None:
        name, asset, domain, kw = CONFIGS[args.one]
        try:
            row = _solve_config(name, asset, domain, kw)
        except Exception as e:
            row = {"metric": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
        return

    rows = []
    for key in args.configs.split(","):
        key = key.strip()
        name, asset, domain, kw = CONFIGS[key]
        if args.in_process:
            try:
                row = _solve_config(name, asset, domain, kw)
            except Exception as e:  # keep sweeping; report the failure
                row = {"metric": name, "error": f"{type(e).__name__}: {e}"}
        else:
            row = _run_one_subprocess(key, _CONFIG_TIMEOUT_S)
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "value" in r]
    print(json.dumps({
        "metric": "bench_all_summary",
        "value": round(sum(r["value"] for r in ok), 4) if ok else None,
        "unit": "s (sum of warm medians)",
        "configs_ok": len(ok),
        "configs_total": len(rows),
    }))

    if not args.json_only:
        lines = [
            "# BENCH_TABLE — full BASELINE config sweep",
            "",
            f"Backend: `{_backend()}` · protocol: 1 cold + median of 3 warm "
            "(BASELINE.md).  Warm timings block on device completion of phi; "
            "the device→host transfer is the separate +xfer column (the one "
            "documented convention, shared with bench.py).",
            "",
            "| Config | DOF | Cold (s) | Warm (s) | +xfer (s) |",
            "|---|---|---|---|---|",
        ]
        for r in rows:
            if "value" in r:
                d = r["detail"]
                lines.append(
                    f"| {r['metric']} | {d['n_dof']:,} | {d['cold_s']} | "
                    f"**{r['value']}** | {d['phi_transfer_s']} |"
                )
            else:
                lines.append(f"| {r['metric']} | — | — | "
                             f"{r.get('error', r.get('skipped'))} | — |")
        lines += [
            "",
            "Accuracy pairing for these timed tiers: README.md §Performance "
            "and bench.py's JSON accuracy block (rel-L2 of each tier vs a "
            "refine-to-1e-11 reference of the same discretization).",
        ]
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_TABLE.md"), "w") as f:
            f.write("\n".join(lines) + "\n")


def _backend():
    import jax

    return jax.default_backend()


if __name__ == "__main__":
    main()
