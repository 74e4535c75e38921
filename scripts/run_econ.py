#!/usr/bin/env python
"""ECON/Tax scenario-NLP parity campaign (reference benchmark-tables/
table_ECON_one-phase.csv: ECON50 268 it, ECON125 250 it, ECON250 326 it,
all Optimal; model benchmark/Tax-problem/tax1D.jl:6-36).

    python scripts/run_econ.py [--sizes 50,125,250] [--max-it 600]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50,125,250")
    ap.add_argument("--max-it", type=int, default=600)
    ap.add_argument("--out", default="results")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", args.platform == "cpu")

    from onephase_tpu.config import Params
    from onephase_tpu.harness import compare_to_reference, run_problems
    from onephase_tpu.models.tax import tax1d

    pars = Params().with_overrides({
        "output_level": 1, "term.max_it": args.max_it,
        "term.tol_opt": args.tol, "term.max_time": 3600.0,
        "chunk_size": 25})
    probs = {f"ECON{na}": tax1d(na=na)
             for na in (int(s) for s in args.sizes.split(","))}
    summary = run_problems(probs, "econ_one_phase", pars=pars,
                           out_root=args.out)
    ref = "/root/reference/benchmark-tables/table_ECON_one-phase.csv"
    report = compare_to_reference(summary, ref) if os.path.isfile(ref) else {}
    path = os.path.join(args.out, "econ_parity.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
