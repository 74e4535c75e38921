"""TPU benchmark: scenario-structured arrow KKT vs the dense generic path.

Measures seconds per outer IPM iteration (full jitted step: Q formation,
factorization, direction, line search) for the same two-stage QP
(models/examples.two_stage_qp) solved

  - dense:  generic OnePhaseKernel on the flattened NLPSpec
            (n = nz + K*nx flat variables, dense Schur complement)
  - arrow:  ScenarioKernel (per-scenario blocks + border, never forms
            the dense Q)

to locate the crossover (VERDICT item 6).  The ECON-style block-angular
regime is nx=64, mc=32 — the reference's ECON250 has ~1.5k variables
(benchmark-tables/table_ECON_one-phase.csv:2-4); K=256 here is ~16k.

Run (TPU):  python scripts/bench_scenario.py
Run (CPU):  python scripts/bench_scenario.py --platform cpu --ks 4,16
Writes results/scenario_bench.{json,md}.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def per_iter_time(kernel, st, iters=8, reps=3):
    """Median time of run_chunk (chunk_size outer iterations)."""
    import jax
    st = kernel.run_chunk(st)            # compile + warmup
    jax.block_until_ready(st.p.x)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = kernel.run_chunk(st)
        jax.block_until_ready(out.p.x)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--ks", default="16,64,256,1024")
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--nz", type=int, default=16)
    ap.add_argument("--mc", type=int, default=32)
    ap.add_argument("--dense-max-n", type=int, default=20000)
    ap.add_argument("--out", default="results/scenario_bench")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from onephase_tpu.config import Params
    from onephase_tpu.ipm.core import OnePhaseKernel
    from onephase_tpu.models.examples import two_stage_qp
    from onephase_tpu.nlp import canonicalize
    from onephase_tpu.parallel.scenario import ScenarioKernel

    dtype = jnp.float32
    iters = 8
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 1000, "chunk_size": iters,
        "history_capacity": 2})

    rows = []
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}",
          flush=True)
    for K in [int(k) for k in args.ks.split(",")]:
        spec = two_stage_qp(K=K, nz=args.nz, nx=args.nx, mc=args.mc)
        n_flat = args.nz + K * args.nx
        row = {"K": K, "nx": args.nx, "mc": args.mc, "n_flat": n_flat}

        sk = ScenarioKernel(spec, pars, dtype=dtype)
        try:
            row["arrow_s_per_it"] = per_iter_time(sk, sk.initial_state(),
                                                  iters)
        except Exception as e:  # noqa: BLE001
            row["arrow_s_per_it"] = None
            row["arrow_err"] = str(e).split("\n")[0][:120]

        if n_flat <= args.dense_max_n:
            try:
                gk = OnePhaseKernel(
                    canonicalize(spec.to_nlpspec(), dtype=dtype), pars)
                row["dense_s_per_it"] = per_iter_time(
                    gk, gk.initial_state(), iters)
            except Exception as e:  # noqa: BLE001
                row["dense_s_per_it"] = None
                row["dense_err"] = str(e).split("\n")[0][:120]
        else:
            row["dense_s_per_it"] = None
            row["dense_err"] = "skipped (n_flat > dense-max-n)"
        a, d = row["arrow_s_per_it"], row["dense_s_per_it"]
        row["speedup_arrow"] = (d / a) if (a and d) else None
        rows.append(row)
        print(row, flush=True)

    os.makedirs("results", exist_ok=True)
    with open(args.out + ".json", "w") as fh:
        json.dump({"backend": jax.default_backend(),
                   "dtype": dtype.__name__, "rows": rows}, fh, indent=1)
    with open(args.out + ".md", "w") as fh:
        fh.write(f"# Scenario arrow-vs-dense bench — {jax.default_backend()},"
                 f" {dtype.__name__}, nx={args.nx} mc={args.mc}\n\n")
        fh.write("| K | n_flat | arrow s/it | dense s/it | arrow speedup |\n"
                 "|---|---|---|---|---|\n")
        for r in rows:
            def fmt(v, err):
                if isinstance(v, float):
                    return f"{v:.4f}"
                return r.get(err, "—") or "—"
            sp = ("—" if r["speedup_arrow"] is None
                  else f"{r['speedup_arrow']:.2f}x")
            fh.write(f"| {r['K']} | {r['n_flat']} | "
                     f"{fmt(r['arrow_s_per_it'], 'arrow_err')} | "
                     f"{fmt(r['dense_s_per_it'], 'dense_err')} | {sp} |\n")
    print(f"wrote {args.out}.json/.md", flush=True)


if __name__ == "__main__":
    main()
