#!/usr/bin/env python
"""Large-instance demonstration on one chip (VERDICT r2 item 6 criterion):
solve an n+m >= 10^4 structured NLP on the TPU within HBM, and document
the max-shape table for each kernel path.

The instance is a chain OCP (models/examples.chain_ocp) at K stages of
nx-dim states — the structured-KKT story: ChainKernel factors the
block-tridiagonal Schur complement at O(K nb^3) and never forms the dense
(n, n) Q.  The same scales run through BandedKernel matrix_free=True (no
dense J/H anywhere).

    python scripts/bench_large.py [--k 400 --nx 32 --mc 16]
Writes results/bench_large.json + results/max_shape.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--k", type=int, default=400)
    ap.add_argument("--nx", type=int, default=32)
    ap.add_argument("--mc", type=int, default=16)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--max-it", type=int, default=200)
    ap.add_argument("--out", default="results/bench_large.json")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from onephase_tpu.config import Params
    from onephase_tpu.ipm.state import STATUS_NAMES
    from onephase_tpu.models.examples import chain_ocp
    from onephase_tpu.parallel.chain import ChainKernel

    spec = chain_ocp(K=args.k, nx=args.nx, mc=args.mc)
    n = args.k * args.nx
    m = (args.k - 1) * args.mc
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": args.max_it,
        "term.tol_opt": args.tol, "chunk_size": 25,
        "history_capacity": 2})

    t0 = time.time()
    ck = ChainKernel(spec, pars, dtype=jnp.float32)
    st = ck.initial_state()
    st = ck.run_chunk(st)
    jax.block_until_ready(st.p.x)
    compile_s = time.time() - t0

    t0 = time.time()
    st = ck.initial_state()
    done = False
    while not done:
        st = ck.run_chunk(st)
        done = int(np.asarray(st.status)) != 0
    jax.block_until_ready(st.p.x)
    solve_s = time.time() - t0

    status = STATUS_NAMES[int(st.status)]
    res = {
        "device": str(jax.devices()[0]),
        "problem": f"chain_ocp(K={args.k}, nx={args.nx}, mc={args.mc})",
        "n_variables": n,
        "m_constraints": m,
        "n_plus_m": n + m,
        "status": status,
        "iterations": int(st.t) - 1,
        "solve_s": round(solve_s, 1),
        "compile_s": round(compile_s, 1),
        "kernel": "ChainKernel (block-tridiag Schur, f32, never dense Q)",
        "tol": args.tol,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))

    md = "results/max_shape.md"
    with open(md, "w") as fh:
        fh.write(f"""# Max-shape table — one {jax.devices()[0].device_kind} chip, 16 GB HBM

Memory model per kernel path (f32; x2 for the while-loop double buffer):

| path | factor-state memory | dominant term | max shape on 16 GB |
|---|---|---|---|
| dense `OnePhaseKernel` | Q + L/M: 2 n^2 (J/H folded for constant-structure problems) | n^2 | n ~ 20k single; n=2048 at batch 64 (bench_sweep) |
| dense, non-constant J/H | + Jc (m n) + H (n^2) | m n | n ~ 10k at m ~ n/2 |
| `ChainKernel` | band blocks: 3 K nb^2 + stage jacobians 2 K mc nx | K nb^2 | n = K*nx ~ 10^6 at nb=32 (this file demonstrates {n + m} = n+m) |
| `BandedKernel` | band: 3 K nb^2 + dense J (m n) + H (n^2) | m n | n ~ 10k |
| `BandedKernel(matrix_free=True)` | band + probes: 3 K nb^2 + 3 nb n | n nb | n ~ 10^5 at nb=64 |

Demonstrated on-device (this run, results/bench_large.json):
`{res['problem']}` — n={n}, m={m}, **n+m={n + m}**, {status} in
{res['iterations']} iterations, {res['solve_s']}s solve
({res['compile_s']}s compile), ChainKernel f32 at tol {args.tol}.
The dense path at this n would hold a {n}x{n} Q ({4 * n * n / 1e9:.1f} GB
per buffer) and form it at O(m n^2); the chain path's band is
{3 * args.k * args.nx * args.nx * 4 / 1e6:.0f} MB.
""")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
