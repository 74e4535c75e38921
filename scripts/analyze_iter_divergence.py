#!/usr/bin/env python
"""Attribute the iteration-count divergence vs the reference (VERDICT r4
item 7).

Statuses and argmins match the reference everywhere comparable, but the
TRAJECTORIES differ widely in the winning direction: ECON50 84 its here vs
268 in `benchmark-tables/table_ECON_one-phase.csv:2`, kissing25d4 184 vs
KISSING2's 151 (`benchmark/Examples/kissing.jl:3-5`).  The parameter
DEFAULTS are identical (init_style=:gertz, agg_gamma=:mehrotra_stb,
max_it_corrections=2 — `src/parameters.jl:91,181,269`), so this script
isolates which IMPLEMENTATION choices move the count: it re-solves the same
problems on CPU f64 with each suspect reverted to the reference's behavior
and records iteration counts plus full mu/eta/step-type traces.

Ablations (each one lever, default lane = the committed campaign lane):
  refine_ref   it_refine back to the reference's fixed 3 passes at solve
               precision (schur.jl:158-174) — the campaign lane runs
               compensated-f64 refinement to 1e-12, giving near-exact
               directions
  corr0        corrections off (max_it_corrections=0)
  init_meh     init_style=mehrotra
  agg_affine   agg_gamma=affine

    python scripts/analyze_iter_divergence.py
Writes results/iter_divergence.md (+ .json with the full traces).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from onephase_tpu.config import Params
    from onephase_tpu.models.examples import kissing
    from onephase_tpu.models.tax import tax1d
    from onephase_tpu.solver import one_phase_solve

    base = {
        "output_level": 0, "term.tol_opt": 1e-6, "term.max_it": 400,
        "chunk_size": 25, "history_capacity": 1300,
        "kkt.it_refine_highprec": True, "kkt.it_refine_tol": 1e-12,
    }
    lanes = {
        "campaign": {},
        "refine_ref": {"kkt.it_refine_highprec": False,
                       "kkt.it_refine_tol": 0.0,
                       "kkt.it_refine_adaptive": False,
                       "kkt.it_refine_num": 3},
        "corr0": {"max_it_corrections": 0},
        "init_meh": {"init.init_style": "mehrotra"},
        "agg_affine": {"ls.agg_gamma": "affine"},
    }
    problems = {
        "ECON50": (lambda: tax1d(na=50), 268),
        "kissing25d4": (lambda: kissing(25, 4), 151),
    }

    out = {"problems": {}}
    for pname, (mk, ref_it) in problems.items():
        rows = {}
        for lname, over in lanes.items():
            pars = Params().with_overrides({**base, **over})
            r = one_phase_solve(mk(), pars)
            rows[lname] = {
                "status": r.status, "it": r.iterations,
                "obj": float(r.obj),
                "trace": [{k: rec[k] for k in
                           ("t", "step_type", "mu", "eta_P", "alpha_P",
                            "dual_scaled", "prm_scaled", "delta")
                           if k in rec}
                          for rec in r.history] if lname == "campaign"
                else None,
            }
            print(f"{pname:<12} {lname:<11} {r.status:<18} it="
                  f"{r.iterations:>4}  obj={float(r.obj):.6g}", flush=True)
        out["problems"][pname] = {"reference_it": ref_it, "lanes": rows}

    os.makedirs("results", exist_ok=True)
    with open("results/iter_divergence.json", "w") as fh:
        json.dump(out, fh, indent=1)

    with open("results/iter_divergence.md", "w") as fh:
        fh.write("# Why the iteration counts diverge from the reference "
                 "(in the winning direction)\n\n")
        fh.write("CPU f64 lanes, tol 1e-6; reference counts from "
                 "`benchmark-tables/table_ECON_one-phase.csv:2` and "
                 "`benchmark/Examples/kissing.jl:3-5` (Julia 0.5, 2018). "
                 "Parameter defaults are IDENTICAL to the reference "
                 "(`src/parameters.jl:91,181,269`); each lane reverts one "
                 "implementation choice.\n\n")
        fh.write("| problem | reference | " +
                 " | ".join(lanes) + " |\n|" + "---|" * (len(lanes) + 2)
                 + "\n")
        for pname, rec in out["problems"].items():
            cells = [f"{rec['lanes'][ln]['it']} "
                     f"({rec['lanes'][ln]['status']})" for ln in lanes]
            fh.write(f"| {pname} | {rec['reference_it']} | " +
                     " | ".join(cells) + " |\n")
        fh.write("\nFull mu/eta_P/step-type traces for the campaign lanes "
                 "are in iter_divergence.json.\n")
    print("wrote results/iter_divergence.md")


if __name__ == "__main__":
    main()
