#!/usr/bin/env python
"""Solver-config x problem-class matrix ON THE DEVICE (VERDICT r3 item 8).

The CPU-8 test tier (tests/test_config_matrix.py, test_kkt.py,
test_parity_modes.py) covers the config matrix under conftest's CPU pin;
this script runs the same matrix on the ambient TPU so backend-lowering
differences (cf. the r2 bf16-matmul episode) are caught on the real
hardware: kkt solver types x linear solver backends x acceptance modes on
the small status+argmin zoo.

    python scripts/run_config_matrix_tpu.py
Writes results/config_matrix_tpu.json (+ .md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/config_matrix_tpu.json")
    ap.add_argument("--max-it", type=int, default=81)
    ap.add_argument("--problems", default=None,
                    help="comma-separated subset; each on-chip cell costs "
                         "~2 min of serial tunnel compile, so the default "
                         "full 9x8 matrix is a ~2.5h campaign — one "
                         "representative per status class keeps it ~1h")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)  # f64 zoo solves on-chip

    from onephase_tpu.config import Params
    from onephase_tpu.models import zoo
    from onephase_tpu.solver import one_phase_solve

    # configs: the reference's test matrix (runtests.jl:150-194 —
    # schur+chol, clever_symmetric+ldlt, symmetric) + the TPU backends
    configs = {
        "schur_xla": {},
        "schur_invchol": {"kkt.linear_solver_type": "invchol"},
        # the pallas backend is wired to the structured kernels (the dense
        # Schur kernel's hand-written batched chol lost to XLA and was
        # deleted in r3, results/profile_kernels_tpu.md) — exercise it
        # through the banded kernel, its real dispatch path
        "banded_pallas": {"kkt.kkt_solver_type": "banded",
                          "kkt.linear_solver_type": "pallas"},
        "schur_f32fb": {"kkt.factor_precision": "f32_fallback"},
        "symmetric_ldlt": {"kkt.kkt_solver_type": "symmetric"},
        "clever_ldlt": {"kkt.kkt_solver_type": "clever_symmetric"},
        "clever_eigh": {"kkt.kkt_solver_type": "clever_symmetric",
                        "kkt.linear_solver_type": "eigh"},
        "filter_test2": {"ls.filter_type": "test2"},
        "agg_constant": {"ls.agg_gamma": "constant"},
    }
    # problem classes with expected status (+ argmin checks where defined)
    problems = {
        "toy_lp1": (zoo.toy_lp1, "Optimal"),
        "toy_lp5": (zoo.toy_lp5, "Optimal"),
        "rosenbrook2": (zoo.rosenbrook2, "Optimal"),
        "circle_nc1": (zoo.circle_nc1, "Optimal"),
        "toy_lp_inf1": (zoo.toy_lp_inf1, "primal_infeasible"),
        "circle_nc_inf1": (zoo.circle_nc_inf1, "primal_infeasible"),
        "lp_unbd": (zoo.lp_unbd, "dual_infeasible"),
        "unbd_feas": (zoo.unbd_feas, "Optimal"),
    }
    if args.problems:
        keep = set(args.problems.split(","))
        problems = {k: v for k, v in problems.items() if k in keep}

    table = {}
    fails = []
    t_all = time.time()
    for cname, over in configs.items():
        pars = Params().with_overrides({
            "output_level": 0, "term.max_it": args.max_it,
            "a_norm_penalty": 1e-4, **over})
        for pname, (mk, want) in problems.items():
            t0 = time.time()
            try:
                r = one_phase_solve(mk(), pars)
                ok = r.status == want
                rec = {"status": r.status, "want": want, "ok": bool(ok),
                       "it": r.iterations, "s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001
                rec = {"status": f"ERR({type(e).__name__})", "want": want,
                       "ok": False, "s": round(time.time() - t0, 1)}
            table.setdefault(cname, {})[pname] = rec
            if not rec["ok"]:
                fails.append(f"{cname}/{pname}: {rec['status']}")
            print(f"{cname:>16} {pname:<16} {rec['status']:<18} "
                  f"{'ok' if rec['ok'] else 'MISMATCH'}", flush=True)
            # incremental write: ~72 serial on-chip compiles make this a
            # long campaign; a partial table is still evidence
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as fh:
                json.dump({"device": str(jax.devices()[0]),
                           "wall_s": round(time.time() - t_all, 1),
                           "partial": True, "fails": fails,
                           "table": table}, fh, indent=1)

    payload = {
        "device": str(jax.devices()[0]),
        "wall_s": round(time.time() - t_all, 1),
        "n_cells": sum(len(v) for v in table.values()),
        "n_fail": len(fails), "fails": fails,
        "table": table,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    md = args.out.replace(".json", ".md")
    with open(md, "w") as fh:
        fh.write(f"# Config-matrix on device — {jax.devices()[0]}\n\n")
        fh.write("| config | " + " | ".join(problems) + " |\n|"
                 + "---|" * (len(problems) + 1) + "\n")
        for cname, row in table.items():
            cells = [("OK" if row[p]["ok"] else row[p]["status"])
                     + f" ({row[p].get('it', '—')})" for p in problems]
            fh.write(f"| {cname} | " + " | ".join(cells) + " |\n")
        fh.write(f"\n{payload['n_cells']} cells, {len(fails)} failures"
                 + (f": {fails}" if fails else "") + "\n")
    print(f"wrote {args.out} and {md}")


if __name__ == "__main__":
    main()
