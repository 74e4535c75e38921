#!/usr/bin/env python
"""Benchmark campaigns (reference: benchmark/CUTEst/run_one_phase.jl named
campaigns + scripts/solve_cutest.jl): run the built-in problem sets with
both solver lanes and emit parity CSVs + performance-profile data.

    python scripts/run_campaigns.py [--out results] [--platform cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--x64", action="store_true", default=True)
    ap.add_argument("--max-it", type=int, default=500)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from onephase_tpu.baselines import (performance_profile,
                                        scipy_baseline_solve)
    from onephase_tpu.cli import get_problems
    from onephase_tpu.config import Params
    from onephase_tpu.harness import run_problems

    pars = Params().with_overrides({"output_level": 0,
                                    "term.max_it": args.max_it})
    summaries = {}
    for pset in ("zoo", "netlib_feasible", "netlib_infeasible", "examples"):
        ns = argparse.Namespace(problem_set=pset, mps_dir=None)
        probs = get_problems(ns)
        summaries[f"one_phase/{pset}"] = run_problems(
            probs, f"one_phase_{pset}", pars=pars, out_root=args.out)
        if pset in ("zoo", "netlib_feasible"):
            summaries[f"scipy/{pset}"] = run_problems(
                probs, f"scipy_{pset}", pars=pars, out_root=args.out,
                solve_func=scipy_baseline_solve)

    # performance profile (one-phase vs scipy on the feasible sets)
    prof = performance_profile({
        "one_phase": {**summaries["one_phase/zoo"],
                      **summaries["one_phase/netlib_feasible"]},
        "scipy": {**summaries["scipy/zoo"],
                  **summaries["scipy/netlib_feasible"]},
    })
    with open(os.path.join(args.out, "performance_profile.json"), "w") as fh:
        json.dump({k: {"tau": t.tolist(), "frac": f.tolist()}
                   for k, (t, f) in prof.items()}, fh, indent=1)
    print("campaigns complete; results in", args.out)


if __name__ == "__main__":
    main()
