#!/usr/bin/env python
"""COPS/Examples parity campaign (VERDICT r2 item 8).

Reference baselines (benchmark/Examples/kissing.jl:3-5 comments): CUTEst
KISSING solves in 180 iterations, KISSING2 in 151; CHAIN solves in the
smoke test (test/CUTEst.jl:11-30); the COPS models (largest small polygon,
electron, max-cut relaxation) have no committed reference counts — status
Optimal is the criterion.

The true SIF instances cannot ship here, so the kissing rows run the
KISSING2-style stand-in (models/examples.kissing) at two sizes bracketing
the CUTEst models' scale; iteration counts are committed as indicative,
statuses as the parity criterion.

    python scripts/run_examples.py  [--out results]
Writes results/examples/{summary.csv,summary.json} + examples_parity.json.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_ROWS = {
    "kissing12d3": {"ref_name": "KISSING-like", "ref_it": 180,
                    "ref_status": "optimal"},
    "kissing25d4": {"ref_name": "KISSING2-like", "ref_it": 151,
                    "ref_status": "optimal"},
    "chain50": {"ref_name": "CHAIN smoke", "ref_it": None,
                "ref_status": "optimal"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--max-it", type=int, default=600)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", args.platform == "cpu")

    from onephase_tpu.config import Params
    from onephase_tpu.harness import run_problems
    from onephase_tpu.models import examples

    pars = Params().with_overrides({
        "output_level": 1, "term.max_it": args.max_it,
        "term.max_time": 900.0, "chunk_size": 50})
    probs = {
        "kissing12d3": examples.kissing(12, 3),
        "kissing25d4": examples.kissing(25, 4),
        "polygon20": examples.largest_small_polygon(20),
        "electron25": examples.electron(25),
        "maxcut30": examples.max_cut(30, 5),
        "chain50": examples.chain(50),
    }
    summary = run_problems(probs, "examples", pars=pars, out_root=args.out)

    report = {}
    for name, rec in summary.items():
        row = {"status": rec.status, "it": rec.it_count,
               "time_s": round(rec.total_time, 1), "fval": rec.fval}
        row.update(REF_ROWS.get(name, {}))
        report[name] = row
    path = os.path.join(args.out, "examples_parity.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
