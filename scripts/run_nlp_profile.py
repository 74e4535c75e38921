#!/usr/bin/env python
"""Config-matched NLP iteration-profile campaign (VERDICT r3 missing #2).

The reference compared per-problem iteration counts and failure totals
against Ipopt at MATCHED settings (tol, max_iter=3000, no scaling —
benchmark/CUTEst/run_cutest.jl:10-98; table docs/one-phase.tex:916-930).
No Ipopt exists in this image, so the Ipopt-class lanes are scipy's two
constrained-NLP codes at the same matched settings:

  trust-constr — interior-point (closest algorithmic match; slow)
  SLSQP        — active-set SQP (completes far more instances/hour)

All three lanes run the SAME problem set serially on CPU f64 with the
same tol_opt/max_it; committed outputs are a per-problem
(status, iterations) table and Dolan-Moré iteration profiles — the
like-for-like comparison the wall-clock campaigns cannot give.

    python scripts/run_nlp_profile.py [--max-it 500] [--tol 1e-6]
Writes results/nlp_profile.json (+ .md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-it", type=int, default=500)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--budget-s", type=float, default=600.0,
                    help="per-lane wall budget; problems past it are "
                         "recorded MAX_TIME (the r3 trust-constr lane "
                         "finished 6/16 in 900s — honesty beats waiting)")
    ap.add_argument("--large", action="store_true",
                    help="CUTEst-scale set (n+m ~ 10^2..10^4, the "
                         "docs/one-phase.tex:896 size window) instead of "
                         "the small zoo/COPS set; writes "
                         "results/nlp_profile_large.json unless --out")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = ("results/nlp_profile_large.json" if args.large
                    else "results/nlp_profile.json")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from onephase_tpu.baselines import scipy_baseline_solve
    from onephase_tpu.config import Params
    from onephase_tpu.models import zoo
    from onephase_tpu.models.examples import (electron, kissing,
                                              largest_small_polygon, max_cut)
    from onephase_tpu.solver import one_phase_solve

    # the NLP set: zoo nonlinear problems + the COPS examples (reference
    # test/problems.jl + benchmark/Examples) — constrained, 2nd-derivative
    # NLPs in the CUTEst small/mid range
    if args.large:
        # CUTEst-scale window (100 <= nvar+ncon <= 10,000,
        # docs/one-phase.tex:896): constrained 2nd-derivative NLPs from
        # the in-repo families at the sizes the reference's table spans
        from onephase_tpu.models.examples import chain_ocp
        from onephase_tpu.models.tax import tax1d
        from bench import make_qp
        problems = {
            "kissing50d4": kissing(m_pts=50, dim=4),      # n=200, m~1225
            "electron50": electron(np_=50),               # n=150, m=50
            "polygon25": largest_small_polygon(nv=25),    # n=48, m~300
            "maxcut40r6": max_cut(n=40, r=6),             # n=240, m=40
            "chainocp32": chain_ocp(K=32, nx=8).to_nlpspec(),   # n=256
            "chainocp128": chain_ocp(K=128, nx=8).to_nlpspec(), # n=1024
            "econ25": tax1d(na=25),                       # n=73, m=625
            "econ50": tax1d(na=50),                       # n=148, m=2500
            "qp1000": make_qp(n=1000, m=500, seed=3),     # n=1000, m=500
            "qp2000": make_qp(n=2000, m=1000, seed=4),    # n=2000, m=1000
        }
    else:
        problems = {
        "rosenbrook2": zoo.rosenbrook2(), "rosenbrook3": zoo.rosenbrook3(),
        "circle1": zoo.circle1(), "circle2": zoo.circle2(),
        "circle_nc1": zoo.circle_nc1(), "circle_nc2": zoo.circle_nc2(),
        "quad_opt": zoo.quad_opt(), "unbd_feas": zoo.unbd_feas(),
        "kissing12d3": kissing(m_pts=12, dim=3),
        "kissing25d4": kissing(m_pts=25, dim=4),
        "electron12": electron(np_=12),
        "polygon8": largest_small_polygon(nv=8),
        "maxcut12": max_cut(n=12, r=3),
        }
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": args.max_it,
        "term.tol_opt": args.tol})

    import numpy as np
    dims = {name: {"nvar": int(np.size(spec.x0)),
                   "ncon": int(np.size(getattr(spec, "lcon", [])))}
            for name, spec in problems.items()}

    lanes = {
        "one_phase": lambda s: one_phase_solve(s, pars),
        "trust_constr": lambda s: scipy_baseline_solve(s, pars),
        "slsqp": lambda s: scipy_baseline_solve(s, pars, method="SLSQP"),
    }
    table = {}
    for lane, solve in lanes.items():
        t_lane = time.time()
        for name, spec in problems.items():
            if time.time() - t_lane > args.budget_s:
                table.setdefault(name, {})[lane] = {
                    "status": "MAX_TIME(lane budget)", "it": -1, "s": None}
                continue
            t0 = time.time()
            try:
                r = solve(spec)
                rec = {"status": r.status, "it": r.iterations,
                       "s": round(time.time() - t0, 2),
                       "fval": float(r.obj)}
            except Exception as e:  # noqa: BLE001
                rec = {"status": f"ERR({type(e).__name__})", "it": -1,
                       "s": round(time.time() - t0, 2)}
            table.setdefault(name, {})[lane] = rec
            print(f"{lane:>12} {name:<12} {rec['status']:<18} "
                  f"it={rec['it']:>5} {rec['s']}s", flush=True)

    # Dolan-More iteration profile over problems solved by >= 1 lane
    def solved(rec):
        return rec.get("status") == "Optimal" and rec.get("it", -1) > 0

    taus = [1.0, 1.5, 2.0, 3.0, 5.0, 10.0, 100.0]
    profile = {}
    scored = [p for p in table
              if any(solved(table[p].get(l, {})) for l in lanes)]
    for lane in lanes:
        fracs = []
        for tau in taus:
            cnt = 0
            for p in scored:
                best = min((table[p][l]["it"] for l in lanes
                            if solved(table[p].get(l, {}))), default=None)
                rec = table[p].get(lane, {})
                if best and solved(rec) and rec["it"] <= tau * best:
                    cnt += 1
            fracs.append(round(cnt / max(1, len(scored)), 3))
        profile[lane] = dict(zip(map(str, taus), fracs))

    fails = {lane: sum(1 for p in table
                       if table[p].get(lane, {}).get("status") != "Optimal")
             for lane in lanes}
    payload = {
        "config_matched": {"tol_opt": args.tol, "max_it": args.max_it,
                           "scaling": "none (all lanes)",
                           "dtype": "f64", "platform": "cpu"},
        "failures": fails, "n_problems": len(problems),
        "dims": dims,
        "iteration_profile": profile, "per_problem": table,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    md = args.out.replace(".json", ".md")
    with open(md, "w") as fh:
        fh.write("# NLP iteration profile — config-matched lanes "
                 f"(tol {args.tol}, max_it {args.max_it}, f64 CPU)\n\n")
        fh.write("| problem | one-phase | trust-constr | SLSQP |\n"
                 "|---|---|---|---|\n")
        for p, recs in table.items():
            cells = []
            for lane in lanes:
                r = recs.get(lane, {})
                cells.append(f"{r.get('status', '—')} ({r.get('it', '—')} it, "
                             f"{r.get('s', '—')}s)")
            fh.write(f"| {p} | " + " | ".join(cells) + " |\n")
        fh.write(f"\nFailures (not Optimal): {fails} of {len(problems)}\n\n")
        fh.write("Dolan-Moré iteration profile (fraction within tau x best "
                 "iters):\n\n| lane | " + " | ".join(map(str, taus))
                 + " |\n|" + "---|" * (len(taus) + 1) + "\n")
        for lane, fr in profile.items():
            fh.write(f"| {lane} | " + " | ".join(str(v) for v in fr.values())
                     + " |\n")
    print(f"wrote {args.out} and {md}")


if __name__ == "__main__":
    main()
