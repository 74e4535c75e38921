#!/usr/bin/env python
"""Netlib-infeasible (lpi_*) campaign: one-phase lane vs linprog/HiGHS lane,
plus a status/iteration parity report against the reference's committed
table (benchmark-tables/table_netlib_infeasible_one-phase.csv).

The instances are dimension-matched synthetic stand-ins (models/netlib.py:
LPI_DIMS — the true MPS files cannot ship in this environment); real files
can be run instead via `python -m onephase_tpu.cli --problem-set mps
--mps-dir <dir>`.

    python scripts/run_lpi.py [--out results] [--max-n 1500] [--platform cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_CSV = "/root/reference/benchmark-tables/table_netlib_infeasible_one-phase.csv"
REF_IPOPT_CSV = "/root/reference/benchmark-tables/table_netlib_infeasible_IPOPT.csv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results")
    ap.add_argument("--max-n", type=int, default=1500)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--max-it", type=int, default=500)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", args.platform == "cpu")

    from onephase_tpu.baselines import scipy_linprog_solve
    from onephase_tpu.config import Params
    from onephase_tpu.harness import compare_to_reference, run_problems
    from onephase_tpu.models.netlib import lpi_suite

    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": args.max_it,
        "term.max_time": 600.0})

    specs = lpi_suite(max_n=args.max_n)
    data = lpi_suite(max_n=args.max_n, as_data=True)

    ours = run_problems(specs, "lpi_one_phase", pars=pars,
                        out_root=args.out)
    highs = run_problems(data, "lpi_highs", pars=pars, out_root=args.out,
                         solve_func=scipy_linprog_solve)

    report = {}
    if os.path.isfile(REF_CSV):
        report = compare_to_reference(ours, REF_CSV)
    n_match = sum(1 for v in report.values() if v["status_match"])
    n_inf = sum(1 for v in ours.values() if v.status == "primal_infeasible")
    n_inf_h = sum(1 for v in highs.values()
                  if v.status == "primal_infeasible")
    t_ours = sum(v.total_time for v in ours.values())
    t_highs = sum(v.total_time for v in highs.values())
    out = {
        "n_problems": len(ours),
        "one_phase_infeasible_verdicts": n_inf,
        "highs_infeasible_verdicts": n_inf_h,
        "status_match_vs_reference_table": f"{n_match}/{len(report)}",
        "one_phase_total_iters": sum(v.it_count for v in ours.values()),
        "reference_total_iters_same_names": sum(
            v["ref_it"] for v in report.values()),
        "one_phase_wall_s": round(t_ours, 1),
        "highs_wall_s": round(t_highs, 1),
        "note": ("dimension-matched synthetic stand-ins "
                 "(models/netlib.py:LPI_DIMS); statuses are the parity "
                 "criterion, per-problem iteration counts are indicative"),
        "per_problem": report,
    }
    path = os.path.join(args.out, "lpi_parity.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_problem"},
                     indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
