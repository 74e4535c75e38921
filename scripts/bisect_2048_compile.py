#!/usr/bin/env python
"""Bisect the n=2048/batch>=128 TPU compile crash (VERDICT r4 weak #2).

`results/bench_sweep_r4.md` rows n=2048, batch in {128, 256} die with
`tpu_compile_helper subprocess exit code 1` (HTTP 500) before any step
runs.  This script COMPILE-ONLY probes the same jitted chunk program
(`BatchSolver._run_batch` via AOT lower().compile()) across a config grid
so the failing axis is isolated without paying full solves:

  - batch        64 / 96 / 128          (the reported crash threshold)
  - chunk_size   20 (bench default) / 5 (smaller while-loop program)
  - backend      invchol (crashing lane) / xla
  - dtype        f32

Each probe runs in a SUBPROCESS so a helper crash cannot take down the
sweep.  Writes results/compile_2048.json (+ .md).

    python scripts/bisect_2048_compile.py [--probe n,batch,chunk,lst]
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def probe(n, batch, chunk, lst):
    """Child-process entry: AOT-compile the chunk program, print verdict."""
    import jax
    import numpy as np

    from bench import make_qp
    from onephase_tpu.config import Params
    from onephase_tpu.nlp import canonicalize
    from onephase_tpu.parallel.batch import BatchSolver
    import jax.numpy as jnp

    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 60, "term.tol_opt": 1e-4,
        "chunk_size": chunk, "history_capacity": 2,
        "kkt.linear_solver_type": lst,
        "kkt.it_refine_highprec": True})
    nlp = canonicalize(make_qp(n, n // 2), dtype=jnp.float32)
    solver = BatchSolver(nlp, pars)
    x0s = np.zeros((batch, nlp.n), np.float32)
    st = solver.init(x0s)
    jax.block_until_ready(st)
    t0 = time.time()
    lowered = solver._run_batch.lower(st)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    mem = compiled.memory_analysis()
    print(json.dumps({
        "ok": True, "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "argument_size_gib": round(
            getattr(mem, "argument_size_in_bytes", 0) / 2**30, 2),
        "temp_size_gib": round(
            getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2),
        "output_size_gib": round(
            getattr(mem, "output_size_in_bytes", 0) / 2**30, 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None,
                    help="internal: n,batch,chunk,lst -> run one probe")
    ap.add_argument("--out", default="results/compile_2048.json")
    args = ap.parse_args()

    if args.probe:
        n, batch, chunk, lst = args.probe.split(",")
        return probe(int(n), int(batch), int(chunk), lst)

    grid = [
        # reproduce the crash + find the failing axis
        (2048, 64, 20, "invchol"),    # known-good row (6.28% MFU r4)
        (2048, 128, 20, "invchol"),   # known-crash row
        (2048, 128, 5, "invchol"),    # smaller while-loop program
        (2048, 128, 20, "xla"),       # backend axis
        (2048, 96, 20, "invchol"),    # threshold refinement
        (2048, 256, 5, "invchol"),    # does chunk shrink rescue b=256?
    ]
    rows = []
    for n, batch, chunk, lst in grid:
        spec = f"{n},{batch},{chunk},{lst}"
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--probe", spec],
                capture_output=True, text=True, timeout=900)
            line = next((ln for ln in reversed(
                out.stdout.strip().splitlines())
                if ln.startswith("{")), None)
            if line:
                rec = json.loads(line)
            else:
                tail = (out.stderr or out.stdout).strip().splitlines()
                rec = {"ok": False,
                       "error": tail[-1][:300] if tail else
                       f"exit {out.returncode}"}
        except subprocess.TimeoutExpired:
            rec = {"ok": False, "error": "timeout 900s"}
        rec.update({"n": n, "batch": batch, "chunk_size": chunk,
                    "lst": lst, "wall_s": round(time.time() - t0, 1)})
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump({"rows": rows, "partial": True}, fh, indent=1)

    with open(args.out, "w") as fh:
        json.dump({"rows": rows}, fh, indent=1)
    md = args.out.replace(".json", ".md")
    with open(md, "w") as fh:
        fh.write("# n=2048 compile-crash bisect (AOT compile-only probes)\n\n")
        fh.write("| n | batch | chunk | backend | ok | compile s | "
                 "temp GiB | error |\n|" + "---|" * 8 + "\n")
        for r in rows:
            fh.write(f"| {r['n']} | {r['batch']} | {r['chunk_size']} | "
                     f"{r['lst']} | {r['ok']} | {r.get('compile_s', '—')} | "
                     f"{r.get('temp_size_gib', '—')} | "
                     f"{r.get('error', '')} |\n")
    print(f"wrote {args.out} and {md}")


if __name__ == "__main__":
    main()
