#!/usr/bin/env python
"""Batched-LP throughput head-to-head in the TPU's regime + crossover curve
(VERDICT r3 item 2; BASELINE.md ">=1.5x Ipopt-class aggregate throughput on
batched Netlib at 1 host").

The r3 head-to-heads all sat in HiGHS's sweet spot (tiny sparse LPs,
n<=700, where the committed ratio was 0.33x warm).  This campaign sweeps
problem size n with batch>=64 mixed feasible+infeasible pools on IDENTICAL
data per lane:

  one-phase  — one shape class per n -> ONE compiled vmapped batch on the
               chip (parallel/buckets.solve_bucketed), f32 MXU factor path,
               f64 residual/Farkas measurement; cold (incl. compile) and
               warm walls both reported.
  HiGHS      — scipy.linprog(method="highs") per instance, csr-sparse input
               (the industrial baseline lane, reference run_netlib.jl
               framing).

Scored per size: status agreement vs ground truth (both lanes), fval
cross-check on both-Optimal pairs, wall-clock per lane, aggregate
throughput ratio, and the measured crossover size n* where the TPU lane
overtakes.  Density is a lane parameter: "netlib" (~8 nnz/row) and
"dense" (50%) regimes are both recorded.

    python scripts/run_throughput_crossover.py [--platform cpu] [--quick]
Writes results/throughput_crossover.json (+ .md table).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_lane(sizes, batch, density, pars, round_to, dtype, label, results):
    import jax

    from onephase_tpu.baselines import scipy_linprog_solve
    from onephase_tpu.models.netlib import sized_mixed_suite
    from onephase_tpu.parallel.buckets import solve_bucketed

    for n in sizes:
        m = n // 2
        problems = sized_mixed_suite(n, m, n_pairs=batch // 2,
                                     density=density)
        t0 = time.time()
        ours_cold = solve_bucketed(problems, pars, round_to=round_to,
                                   dtype=dtype, escalate_f64=True)
        wall_cold = time.time() - t0
        t0 = time.time()
        ours = solve_bucketed(problems, pars, round_to=round_to, dtype=dtype,
                              escalate_f64=True)
        wall_warm = time.time() - t0
        del ours_cold

        t0 = time.time()
        highs = {name: scipy_linprog_solve(d, pars)
                 for name, d in problems.items()}
        wall_highs = time.time() - t0

        n_truth_ours = n_truth_highs = n_fval = n_pairs_opt = 0
        n_escalated = 0
        misses = []
        worst_rel = 0.0
        for name, d in problems.items():
            truth = ("optimal" if name.endswith("_feas")
                     else "primal_infeasible")
            s_o = {"Optimal": "optimal"}.get(ours[name].status,
                                             ours[name].status)
            s_h = {"Optimal": "optimal"}.get(highs[name].status,
                                             highs[name].status)
            n_truth_ours += s_o == truth
            n_truth_highs += s_h == truth
            n_escalated += getattr(ours[name], "escalated", False)
            if s_o != truth:
                misses.append(f"{name}:{s_o}@{ours[name].iterations}it")
            if s_o == "optimal" and s_h == "optimal":
                n_pairs_opt += 1
                rel = abs(ours[name].obj - highs[name].obj) / max(
                    1.0, abs(highs[name].obj))
                worst_rel = max(worst_rel, rel)
                n_fval += rel < 5e-3
        row = {
            "density": label, "n": n, "m": m, "batch": len(problems),
            "status_vs_truth_ours": f"{n_truth_ours}/{len(problems)}",
            "status_vs_truth_highs": f"{n_truth_highs}/{len(problems)}",
            "fval_agree": f"{n_fval}/{n_pairs_opt}",
            "worst_fval_rel_err": worst_rel,
            "n_escalated_f64": n_escalated,
            "misses": misses,
            "wall_ours_cold_s": round(wall_cold, 2),
            "wall_ours_warm_s": round(wall_warm, 2),
            "wall_highs_s": round(wall_highs, 2),
            "speedup_warm": round(wall_highs / wall_warm, 2),
            "speedup_cold": round(wall_highs / wall_cold, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--sizes", default="256,512,1024,2048")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--density", default="both",
                    choices=["both", "dense", "netlib"],
                    help="restrict to one density lane (batch-scaling "
                         "campaigns target dense, where the MXU wins)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="results/throughput_crossover.json")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)  # f64 measurement lane
    import jax.numpy as jnp

    from onephase_tpu.config import Params

    sizes = [int(s) for s in args.sizes.split(",")]
    if args.quick:
        sizes = sizes[:2]
    # pure-f32 hot loop: in-loop residual/Farkas measurement stays f32
    # (conservative: VJP noise only ever sits ON TOP of the true Farkas
    # value, so a measured crossing of 1e-3 is trustworthy; the false
    # NEGATIVES it can produce end MAX_IT and are retried by the CPU-f64
    # escalation pass).  residual_precision="f64" in the loop would put
    # emulated-f64 oracle evals on the chip every iteration — measured to
    # double-to-triple the batched wall.
    # max_it 120 for the f32 pass: every f32-certifiable instance in the
    # pool lands by ~iteration 53 (scripts/diag_infeas.py traces); the
    # stragglers that would burn 300 masked batch-iterations go to the
    # CPU-f64 escalation pass sooner instead
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 120, "term.tol_opt": 1e-4,
        "term.tol_inf_2": 1e-3,
        # invchol (explicit M=Q^-1, fastest backsolves) + ADAPTIVE
        # double-single refinement: measured on-chip at n=512 dense,
        # fixed-3 highprec passes leave 12/64 unresolved at f32 and
        # "xla" trisolves 2/64 at 6x backsolve cost; adaptive-8 resolves
        # 64/64 at the invchol speed (easy iterations exit after 1-2
        # passes, the ill-conditioned endgame gets up to 8)
        "chunk_size": 25, "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_adaptive": True, "kkt.it_refine_max": 8,
        "kkt.it_refine_tol": 5e-7,
        "kkt.it_refine_highprec": True,
        # r5: per-instance no-progress exit.  A vmapped batch runs until
        # its SLOWEST instance terminates; the netlib pools carry ~4
        # f32-floor stallers per size that forced whole batches to
        # max_it=120 while the median instance was done at ~14 — measured
        # as the entire 5x netlib-vs-dense gap at equal shapes
        # (results/sparse_lane_analysis.md §1).  STALLED instances exit to
        # the f64 recheck/escalation instead of burning masked iterations.
        "term.stall_patience": 25})

    results = []
    # dense lane first: it is the regime where the MXU should win
    lanes = [(0.5, "dense(50%)"), (None, "netlib(~8/row)")]
    if args.density == "dense":
        lanes = lanes[:1]
    elif args.density == "netlib":
        lanes = lanes[1:]
    for density, label in lanes:
        run_lane(sizes, args.batch, density, pars, 128, jnp.float32,
                 label, results)

    crossover = {}
    for lab in {r["density"] for r in results}:
        rows = sorted([r for r in results if r["density"] == lab],
                      key=lambda r: r["n"])
        c = next((r["n"] for r in rows if r["speedup_warm"] >= 1.0), None)
        crossover[lab] = c
    payload = {
        "device": str(jax.devices()[0]),
        "config": {"tol_opt": 1e-4, "tol_inf_2": 1e-3, "max_it": 120,
                   "factor": "f32 MXU (invchol, adaptive ds-refine)",
                   "measurement": "f32 in-loop + CPU-f64 escalation",
                   "batch": args.batch},
        "crossover_n_warm": crossover,
        "rows": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    md = args.out.replace(".json", ".md")
    with open(md, "w") as fh:
        fh.write(f"# Batched-LP throughput crossover — {jax.devices()[0]}\n\n")
        fh.write("Mixed feasible+infeasible pools, identical data per lane; "
                 "one-phase = one vmapped f32 batch/shape (warm excludes "
                 "compile), HiGHS = per-instance csr.\n\n")
        fh.write("| density | n | batch | ours st | HiGHS st | fval agree | "
                 "ours warm s | ours cold s | HiGHS s | speedup warm | "
                 "speedup cold |\n|" + "---|" * 11 + "\n")
        for r in results:
            fh.write(f"| {r['density']} | {r['n']} | {r['batch']} | "
                     f"{r['status_vs_truth_ours']} | "
                     f"{r['status_vs_truth_highs']} | {r['fval_agree']} | "
                     f"{r['wall_ours_warm_s']} | {r['wall_ours_cold_s']} | "
                     f"{r['wall_highs_s']} | {r['speedup_warm']} | "
                     f"{r['speedup_cold']} |\n")
        fh.write(f"\nCrossover (warm speedup >= 1): {crossover}\n")
    print(f"wrote {args.out} and {md}")


if __name__ == "__main__":
    main()
