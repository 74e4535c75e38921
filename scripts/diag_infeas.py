#!/usr/bin/env python
"""Diagnose the mixed-parity infeasibility misses (VERDICT r3 item 1).

Runs the failing instances of results/mixed_parity.json serially with full
history and prints the per-iteration trail of the quantities the
infeasibility certificate needs (reference terminate.jl:3-23):

    fark1 = |J'y|_1 / (-a'y)      < tol_inf_1 (1e-3)
    fark2 = (|J'y|_1 + s'y)/|y|_1 < tol_inf_2 (1e-6 ref / 1e-3 f32 lane)
    max_vio > tol_opt

Lanes: --dtype f32 / f64, --platform cpu / tpu.  The f64-vs-f32 delta on
identical instances separates precision stalls from algorithm misses.

    python scripts/diag_infeas.py --dtype f64 --platform cpu
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FAILING = [
    "lpi_bgdbg1_0_infeas", "lpi_klein2_10_infeas", "lpi_klein2_27_infeas",
    "lpi_box1_36_infeas", "lpi_forest6_39_infeas", "lpi_klein2_44_infeas",
    "lpi_pang_46_infeas", "lpi_qual_47_infeas",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f64", choices=["f32", "f64"])
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--max-it", type=int, default=300)
    ap.add_argument("--tol-inf-2", type=float, default=None)
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--tail", type=int, default=12)
    ap.add_argument("--resid-f64", action="store_true",
                    help="measure residuals+Farkas in f64 (needs x64)")
    ap.add_argument("--bucketed", action="store_true",
                    help="solve through the padded bucketed batch driver "
                         "(the campaign path) instead of serially")
    args = ap.parse_args()

    import jax
    if args.platform:
        # env-var JAX_PLATFORMS is pinned to axon by sitecustomize; the
        # config API is the only working override
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "f64" or args.resid_f64:
        jax.config.update("jax_enable_x64", True)

    from onephase_tpu.config import Params
    from onephase_tpu.models.netlib import mixed_suite
    from onephase_tpu.solver import one_phase_solve

    tol_inf_2 = args.tol_inf_2 if args.tol_inf_2 is not None else (
        1e-6 if args.dtype == "f64" else 1e-3)
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": args.max_it,
        "term.tol_opt": 1e-4 if args.dtype == "f32" else 1e-6,
        "term.tol_inf_2": tol_inf_2,
        "chunk_size": 25,
        "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_highprec": True,
        **({"kkt.residual_precision": "f64"} if args.resid_f64 else {})})

    problems = mixed_suite(n_pairs=48)
    names = args.names or FAILING
    if args.bucketed:
        import jax.numpy as jnp
        from onephase_tpu.parallel.buckets import solve_bucketed
        dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
        res_all = solve_bucketed({n: problems[n] for n in names}, pars,
                                 round_to=128, dtype=dtype)
        for name in names:
            r = res_all[name]
            print(f"{name}: status={r.status} it={r.iterations}")
        print(json.dumps({n: {"status": res_all[n].status,
                              "it": res_all[n].iterations}
                          for n in names}, indent=1))
        return
    summary = {}
    for name in names:
        d = problems[name]
        res = one_phase_solve(d.to_spec(), pars)
        print(f"\n=== {name}  ({args.dtype}/{args.platform})  "
              f"status={res.status} it={res.iterations}")
        hist = res.history
        rows = hist[-args.tail:]
        print(f"{'t':>4} {'mode':>5} {'mu':>9} {'rP':>9} {'delta':>9} "
              f"{'vio':>9} {'fark':>9} {'sdf':>9} {'ynorm':>9} {'alphaP':>8}")
        for r in rows:
            print(f"{int(r['t']):>4} {str(r.get('step_type', '?')):>5} "
                  f"{r['mu']:>9.2e} {r['primal_residual']:>9.2e} "
                  f"{r['delta']:>9.2e} {r['con_vio']:>9.2e} "
                  f"{r['farkas']:>9.2e} "
                  f"{r.get('dual_scaled', float('nan')):>9.2e} "
                  f"{r.get('y_norm', float('nan')):>9.2e} "
                  f"{r.get('alpha_P', float('nan')):>8.2e}")
        # minimum farkas seen over whole run
        fmin = min((r["farkas"] for r in hist), default=float("nan"))
        mu_end = hist[-1]["mu"] if hist else float("nan")
        summary[name] = {"status": res.status, "it": res.iterations,
                         "fark_min": fmin, "mu_end": mu_end}
        print(f"  min farkas over run: {fmin:.3e}   tol_inf_2={tol_inf_2}")
    print("\n" + json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
