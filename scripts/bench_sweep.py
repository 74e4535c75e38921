#!/usr/bin/env python
"""Size x batch throughput sweep of the batched one-phase IPM on one chip,
with FLOP/MFU accounting.

Reference framing: the one-phase paper's cost profile (docs/one-phase.tex:
901-931) — Schur formation 42.1% + factorization 35.4% dominate — so the
sweep measures the full jitted IPM (formation + factorization + direction
solve + line search), not an isolated kernel, on random strictly-convex
QPs (bench.make_qp).

Per (n, batch) config we report (round 3: over CERTIFIED solves — the
run goes to termination and statuses are recorded; a row whose batch does
not fully certify says so):
  - statuses       status histogram + solved count
  - fac/s          KKT factorizations per second (BASELINE.json metric)
  - iter/s         outer iterations per second (sum over batch)
  - solves/s       certified solves per second
  - model GFLOP/s  achieved, from a per-iteration dense-path FLOP model:
       Q form   2 m_c n^2   (J^T diag J, canonical rows m_c)
       factor   n^3/3 per factorization
       solves   ~ n_solve * 2 n^2  (refined backsolves, ls trials)
       probes   J/H products ~ 8 m_c n
  - MFU           model GFLOP/s vs assumed peak (f32-on-MXU).

Writes results/bench_sweep.json + a markdown table, prints progress lines.

Run (TPU):   python scripts/bench_sweep.py
Run (CPU):   python scripts/bench_sweep.py --platform cpu --sizes 128,256
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e: 197 TFLOP/s bf16; f32 matmuls on the MXU run at ~1/4 of bf16.
PEAK_F32 = 49.2e12
PEAK_BF16 = 197e12


def flops_per_outer_iter(n, m_canon, n_fac_per_iter, n_solves=14):
    """Dense-path FLOP model for one outer iteration of one instance."""
    q_form = 2.0 * m_canon * n * n            # J^T D J (fused, MXU)
    factor = n_fac_per_iter * (n ** 3) / 3.0  # Cholesky(s)
    solves = n_solves * 2.0 * n * n           # backsolves + refinement
    return q_form + factor + solves


def run_config(n, m, batch, pars_over, dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_qp
    from onephase_tpu.config import Params
    from onephase_tpu.nlp import canonicalize
    from onephase_tpu.parallel.batch import BatchSolver

    pars = Params().with_overrides({
        "output_level": 0,
        "term.max_it": 60,
        "term.tol_opt": 1e-4,
        "chunk_size": 20,
        "history_capacity": 2,
        "kkt.it_refine_highprec": True,
        **pars_over,
    })
    nlp = canonicalize(make_qp(n, m), dtype=dtype)
    solver = BatchSolver(nlp, pars)
    rng = np.random.default_rng(1)
    x0s = rng.normal(size=(batch, nlp.n)) * 0.1

    from onephase_tpu.ipm.state import OPTIMAL, RUNNING, STATUS_NAMES

    t0 = time.perf_counter()
    st = solver.init(x0s)
    st = solver.run_chunk(st)
    jax.block_until_ready(st)
    compile_s = time.perf_counter() - t0

    max_chunks = (pars.term.max_it + pars.chunk_size - 1) // pars.chunk_size
    st = solver.init(x0s)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(max_chunks):
        st = solver.run_chunk(st)
        if not (np.asarray(st.status) == RUNNING).any():
            break
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0

    statuses = [STATUS_NAMES[int(c)] for c in np.asarray(st.status)]
    solved = int(np.sum(np.asarray(st.status) == OPTIMAL))
    total_fac = int(jnp.sum(st.cum_fac))
    total_outer = int(jnp.sum(jnp.minimum(st.t - 1, 60)))
    m_canon = nlp.m  # canonical rows incl. bound rows
    fac_per_iter = total_fac / max(1, total_outer)
    model_flop = total_outer * flops_per_outer_iter(n, m_canon, fac_per_iter)
    return {
        "n": n, "m": m, "batch": batch, "m_canon": int(m_canon),
        "time_s": round(dt, 3), "compile_s": round(compile_s, 1),
        "solved": solved,
        "statuses": {c: statuses.count(c) for c in sorted(set(statuses))},
        "total_fac": total_fac, "total_outer": total_outer,
        "fac_per_s": round(total_fac / dt, 1),
        "iter_per_s": round(total_outer / dt, 1),
        "solves_per_s": round(solved / dt, 1),
        "model_gflop_per_s": round(model_flop / dt / 1e9, 1),
        "mfu_f32_pct": round(100.0 * model_flop / dt / PEAK_F32, 2),
        "mfu_bf16_pct": round(100.0 * model_flop / dt / PEAK_BF16, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024,2048")
    ap.add_argument("--batches", default="16,64,256")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--lst", default="invchol",
                    help="kkt.linear_solver_type")
    ap.add_argument("--qform", default="same",
                    help="kkt.q_form_dtype (same|bf16)")
    ap.add_argument("--precision", default="highest",
                    help="Params.matmul_precision (default|high|highest) — "
                         "lanes for measuring the MXU-precision cost")
    ap.add_argument("--out", default="results/bench_sweep.json")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    dtype = jnp.float32

    sizes = [int(s) for s in args.sizes.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    dev = jax.devices()[0]
    rows = []
    for n in sizes:
        for batch in batches:
            # HBM guard: per instance the state carries L/M only (1 n^2;
            # J/H are folded constants since the r3 placeholder fix, Q is
            # rebuilt on demand since the r4 state-Q fix), double-buffered
            # by the while loop + formation transients; skip > ~12GB
            m = n // 2
            bytes_est = batch * (n * n) * 4 * 2.5
            if bytes_est > 12e9:
                rows.append({"n": n, "batch": batch, "skipped": "memory"})
                print(f"n={n} batch={batch}: skipped (est {bytes_est/1e9:.1f} GB)",
                      flush=True)
                continue
            try:
                r = run_config(n, m, batch,
                               {"kkt.linear_solver_type": args.lst,
                                "kkt.q_form_dtype": args.qform,
                                "matmul_precision": args.precision}, dtype)
            except Exception as e:  # noqa: BLE001
                rows.append({"n": n, "batch": batch,
                             "error": str(e).split("\n")[0][:200]})
                print(f"n={n} batch={batch}: ERROR {e}", flush=True)
                continue
            rows.append(r)
            print(f"n={n} batch={batch}: {r['solved']}/{batch} Optimal, "
                  f"{r['fac_per_s']} fac/s, {r['solves_per_s']} solves/s, "
                  f"{r['model_gflop_per_s']} GFLOP/s, "
                  f"MFU(f32) {r['mfu_f32_pct']}% (compile {r['compile_s']}s)",
                  flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    payload = {"device": str(dev), "linear_solver_type": args.lst,
               "q_form_dtype": args.qform,
               "matmul_precision": args.precision,
               "dtype": "float32", "tol_opt": 1e-4, "max_it": 60,
               "peak_f32": PEAK_F32, "peak_bf16": PEAK_BF16, "rows": rows}
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    md = args.out.replace(".json", ".md")
    with open(md, "w") as fh:
        fh.write(f"# Bench sweep — {dev}, {args.lst}, f32, tol 1e-4, "
                 f"matmul {args.precision}"
                 + (f", Q in {args.qform}" if args.qform != "same" else "")
                 + "\n\n")
        fh.write("| n | batch | solved | fac/s | iter/s | solves/s | GFLOP/s | MFU f32 % | time s |\n")
        fh.write("|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            if "fac_per_s" in r:
                fh.write(f"| {r['n']} | {r['batch']} | "
                         f"{r['solved']}/{r['batch']} | {r['fac_per_s']} | "
                         f"{r['iter_per_s']} | {r['solves_per_s']} | "
                         f"{r['model_gflop_per_s']} | "
                         f"{r['mfu_f32_pct']} | {r['time_s']} |\n")
            else:
                fh.write(f"| {r['n']} | {r['batch']} | — | — | — | — | — | — | "
                         f"{r.get('skipped') or r.get('error')} |\n")
    print(f"wrote {args.out} and {md}")


if __name__ == "__main__":
    main()
