#!/usr/bin/env python
"""Isolate what each escalation layer buys on the 96-instance mixed pool
(VERDICT r4 item 5).

The committed 96/96 headline (`results/mixed_parity.json`) runs three
stacked mechanisms; this campaign runs the SAME pool through each prefix of
the stack so the size of the CPU-f64 "escape hatch" is explicit:

  f32            pure on-chip lane: f32 solve + f32 in-loop measurement,
                 no between-chunk f64 recheck, no escalation
  f32+f64meas    + exact-f64 re-measurement of still-RUNNING/STALLED
                 iterates between chunks (term.batch_f64_recheck — the r4
                 `terminate_f64`/`jtprod_hi` fix; releases instances the
                 f32 measurement noise floor holds hostage)
  f32+escalate   + one-shot CPU-f64 re-solve of unresolved instances
                 (solve_bucketed escalate_f64 — the committed lane)

Scored vs ground truth per lane (reference framing:
`src/IPM/terminate.jl:3-23`, `docs/one-phase.tex:957-985`).

    python scripts/run_mixed_lanes.py [--pairs 12] [--platform cpu]
Writes results/mixed_parity_lanes.json (+ .md table).
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
    ap.add_argument("--platform", default=None)
    ap.add_argument("--max-it", type=int, default=200)
    ap.add_argument("--out", default="results/mixed_parity_lanes.json")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from onephase_tpu.config import Params
    from onephase_tpu.models.netlib import mixed_suite
    from onephase_tpu.parallel.buckets import solve_bucketed

    problems = mixed_suite(n_pairs=args.pairs, max_n=args.max_n)
    base = {
        "output_level": 0, "term.max_it": args.max_it,
        "term.tol_opt": 1e-4, "term.tol_inf_2": 1e-3,
        "chunk_size": 25, "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_adaptive": True, "kkt.it_refine_max": 8,
        "kkt.it_refine_tol": 5e-7, "kkt.it_refine_highprec": True,
        "term.stall_patience": 25,
    }
    lanes = {
        "f32": ({"term.batch_f64_recheck": False}, False),
        "f32+f64meas": ({}, False),
        "f32+escalate": ({}, True),
    }

    rows = []
    per_lane_miss = {}
    for lname, (over, esc) in lanes.items():
        pars = Params().with_overrides({**base, **over})
        t0 = time.time()
        res = solve_bucketed(problems, pars, round_to=128,
                             dtype=jnp.float32, escalate_f64=esc)
        wall = time.time() - t0
        n_truth = 0
        misses = []
        n_esc = 0
        for name, r in res.items():
            truth = ("optimal" if name.endswith("_feas")
                     else "primal_infeasible")
            s = {"Optimal": "optimal"}.get(r.status, r.status)
            if s == truth:
                n_truth += 1
            else:
                misses.append(f"{name}:{s}@{r.iterations}it")
            n_esc += bool(getattr(r, "escalated", False))
        rows.append({"lane": lname,
                     "resolved_vs_truth": f"{n_truth}/{len(problems)}",
                     "n_escalated_f64": n_esc,
                     "wall_s": round(wall, 2), "misses": misses})
        per_lane_miss[lname] = set(misses)
        print(json.dumps(rows[-1]), flush=True)

    payload = {
        "device": str(jax.devices()[0]),
        "pool": f"mixed_suite(n_pairs={args.pairs}, max_n={args.max_n}) = "
                f"{len(problems)} instances",
        "config": base,
        "rows": rows,
        "f64meas_rescues": sorted(
            {m.split(":")[0] for m in per_lane_miss["f32"]}
            - {m.split(":")[0] for m in per_lane_miss["f32+f64meas"]}),
        "escalation_rescues": sorted(
            {m.split(":")[0] for m in per_lane_miss["f32+f64meas"]}
            - {m.split(":")[0] for m in per_lane_miss["f32+escalate"]}),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    with open(args.out.replace(".json", ".md"), "w") as fh:
        fh.write("# Mixed-pool resolution by escalation layer — "
                 f"{jax.devices()[0]}\n\n")
        fh.write("| lane | resolved vs truth | escalated | wall s |\n"
                 "|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['lane']} | {r['resolved_vs_truth']} | "
                     f"{r['n_escalated_f64']} | {r['wall_s']} |\n")
        fh.write(f"\nf64-measurement alone rescues: "
                 f"{payload['f64meas_rescues']}\n")
        fh.write(f"CPU-f64 escalation additionally rescues: "
                 f"{payload['escalation_rescues']}\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
