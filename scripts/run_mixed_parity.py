#!/usr/bin/env python
"""Mixed feasible+infeasible LP campaign: falsifiable parity + aggregate
throughput (VERDICT r2 items 4 and 5).

Two lanes on IDENTICAL LPData instances (models/netlib.mixed_suite — half
feasible with checkable optima, half infeasible at the same dimensions):

  one-phase  — shape-bucketed vmapped batches on the device
               (parallel/buckets.solve_bucketed), f32 + matmul "highest"
  HiGHS      — scipy.linprog(method="highs") per instance (the
               Ipopt-class industrial baseline lane, reference
               run_netlib.jl:4-66 framing)

Scored:
  status agreement   — must *distinguish* Optimal from primal_infeasible
                       (all-infeasible scoring is impossible by design)
  fval agreement     — relative objective error on both-Optimal instances
  aggregate speed    — bucketed one-phase wall vs HiGHS wall on the same
                       pool (BASELINE.md: ">=1.5x Ipopt-class aggregate
                       throughput on batched Netlib at 1 host")

    python scripts/run_mixed_parity.py [--pairs 12] [--platform tpu]
Writes results/mixed_parity.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--max-n", type=int, default=600)
    ap.add_argument("--platform", default=None,
                    help="cpu to force CPU; default = ambient (TPU)")
    ap.add_argument("--max-it", type=int, default=200)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--round-to", type=int, default=128)
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from onephase_tpu.baselines import scipy_linprog_solve
    from onephase_tpu.config import Params
    from onephase_tpu.models.netlib import mixed_suite
    from onephase_tpu.parallel.buckets import solve_bucketed

    problems = mixed_suite(n_pairs=args.pairs, max_n=args.max_n)
    import jax as _jax
    _jax.config.update("jax_enable_x64", True)   # for the f64 measurement
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": args.max_it,
        "term.tol_opt": args.tol,
        # r4: residual_precision="f64" measures the KKT residuals AND the
        # Farkas certificate with f64 oracle arithmetic while the solve/
        # factor path stays f32 on the MXU.  The r3 campaign measured in
        # f32; TPU matmul noise sat ON TOP of the true certificate
        # (true min farkas 2e-4..9e-4 on the misses, scripts/diag_infeas.py)
        # and pushed 8/96 over the 1e-3 threshold -> MAX_IT.  The f64
        # measurement removes the noise; the threshold stays 1e-3 because
        # that is the certificate quality f32 ITERATES deliver (a 1e-4
        # threshold was measured to miss 22/96 — tighter measurement
        # cannot manufacture a better certificate than the iterates carry).
        "term.tol_inf_2": 1e-3,
        # r4 final lane: pure-f32 hot loop (no in-loop emulated f64) +
        # adaptive double-single refinement (resolves the ill-conditioned
        # endgame at f32, see ipm/core._refine_solve_hp) + between-chunk
        # f64 recheck + CPU-f64 escalation for the residue
        "chunk_size": 25, "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_adaptive": True, "kkt.it_refine_max": 8,
        "kkt.it_refine_tol": 5e-7,
        "kkt.it_refine_highprec": True})

    # --- one-phase lane: bucketed batches on the device ---------------
    t0 = time.time()
    ours = solve_bucketed(problems, pars, round_to=args.round_to,
                          dtype=jnp.float32, escalate_f64=True)
    wall_ours = time.time() - t0
    # steady-state lane (compile excluded): campaigns amortize compiles
    # across shape classes via the persistent XLA cache, so both numbers
    # are reported
    t0 = time.time()
    ours2 = solve_bucketed(problems, pars, round_to=args.round_to,
                           dtype=jnp.float32, escalate_f64=True)
    wall_ours_warm = time.time() - t0
    ours = ours2

    # --- HiGHS lane ---------------------------------------------------
    t0 = time.time()
    highs = {}
    for name, d in problems.items():
        highs[name] = scipy_linprog_solve(d, pars)
    wall_highs = time.time() - t0

    # --- scoring ------------------------------------------------------
    per = {}
    n_status = n_truth = n_fval = n_opt_pairs = 0
    worst_rel = 0.0
    for name, d in problems.items():
        r_o = ours[name]
        r_h = highs[name]
        truth = "optimal" if name.endswith("_feas") else "primal_infeasible"
        s_o = {"Optimal": "optimal"}.get(r_o.status, r_o.status)
        s_h = {"Optimal": "optimal"}.get(r_h.status, r_h.status)
        status_match = s_o == s_h
        truth_match = s_o == truth
        n_status += status_match
        n_truth += truth_match
        rec = {"ours": s_o, "highs": s_h, "truth": truth,
               "status_match": bool(status_match),
               "it": r_o.iterations}
        if getattr(r_o, "escalated", False):
            rec["escalated_f64"] = True
        if s_o == "optimal" and s_h == "optimal":
            n_opt_pairs += 1
            rel = abs(r_o.obj - r_h.obj) / max(1.0, abs(r_h.obj))
            worst_rel = max(worst_rel, rel)
            rec["fval_ours"] = r_o.obj
            rec["fval_highs"] = r_h.obj
            rec["fval_rel_err"] = rel
            n_fval += rel < 5e-3
        per[name] = rec

    out = {
        "n_problems": len(problems),
        "platform": jax.default_backend(),
        "n_escalated_f64": sum(
            1 for r in ours.values() if getattr(r, "escalated", False)),
        "status_agreement_vs_highs": f"{n_status}/{len(problems)}",
        "status_agreement_vs_ground_truth": f"{n_truth}/{len(problems)}",
        "fval_agreement_on_both_optimal":
            f"{n_fval}/{n_opt_pairs} (rel < 5e-3)",
        "worst_fval_rel_err": worst_rel,
        "one_phase_wall_s_cold": round(wall_ours, 2),
        "one_phase_wall_s_warm": round(wall_ours_warm, 2),
        "highs_wall_s": round(wall_highs, 2),
        "aggregate_speedup_vs_highs_warm":
            round(wall_highs / max(wall_ours_warm, 1e-9), 2),
        "aggregate_speedup_vs_highs_cold":
            round(wall_highs / max(wall_ours, 1e-9), 2),
        "per_problem": per,
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "mixed_parity.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    brief = {k: v for k, v in out.items() if k != "per_problem"}
    print(json.dumps(brief, indent=1))


if __name__ == "__main__":
    main()
