#!/usr/bin/env python
"""Ipopt-class aggregate-throughput head-to-head (BASELINE.md: ">= 1.5x
Ipopt-class aggregate throughput on batched CUTEst/Netlib at 1 host").

Lane comparison on IDENTICAL constrained-QP instances (the bench.py
family at n=256: dense objective curvature + linear constraints + box
bounds — the CUTEst mid-size regime):

  one-phase  — ONE vmapped batch on the device: a parametric QP template
               (per-instance (A, b, C) as pdata) under a single compiled
               solver, f32 + matmul highest, tol 1e-4, statuses certified
  trust-constr — scipy's interior-point NLP solver (the in-image
               Ipopt-class lane, baselines.scipy_baseline_solve) per
               instance, f64, same tolerance

HiGHS is deliberately NOT this lane: it is an LP-specialist simplex code
(see results/dense_throughput.json for that honest comparison — it wins
small-LP wall-clock); the reference's benchmark lane is Ipopt
(run_cutest.jl:10-98), an interior-point NLP code like this one.

    python scripts/run_nlp_throughput.py [--batch 16] [--n 256]
Writes results/nlp_throughput.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--scipy-budget-s", type=float, default=900.0,
                    help="wall budget for the scipy lane; extrapolated "
                         "if exceeded")
    ap.add_argument("--out", default="results/nlp_throughput.json")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from onephase_tpu.baselines import scipy_baseline_solve
    from onephase_tpu.config import Params
    from onephase_tpu.ipm.state import OPTIMAL, RUNNING, STATUS_NAMES
    from onephase_tpu.nlp import NLPSpec, canonicalize
    from onephase_tpu.parallel.batch import BatchSolver

    n, m, B = args.n, args.m, args.batch
    rng = np.random.default_rng(0)
    As = rng.normal(size=(B, n, n)) / np.sqrt(n)
    bs = rng.normal(size=(B, n))
    Cs = rng.normal(size=(B, m, n)) / np.sqrt(n)

    # parametric template: per-instance data rides as pdata
    pdata0 = {"A": np.zeros((n, n)), "b": np.zeros(n), "C": np.zeros((m, n))}
    spec = NLPSpec(
        f=lambda x, pd: 0.5 * jnp.sum((pd["A"] @ x) ** 2) + jnp.dot(pd["b"], x),
        c=lambda x, pd: pd["C"] @ x,
        lcon=np.full(m, -1.0), ucon=np.full(m, 1.0),
        lvar=np.full(n, -10.0), uvar=np.full(n, 10.0),
        x0=np.zeros(n), lin=tuple(range(m)),
        name=f"qp_pool_n{n}", pdata=pdata0)
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 100, "term.tol_opt": 1e-4,
        "chunk_size": 25, "history_capacity": 2,
        "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_highprec": True})
    nlp = canonicalize(spec, dtype=jnp.float32)
    solver = BatchSolver(nlp, pars)
    pdata = {"A": jnp.asarray(As, jnp.float32),
             "b": jnp.asarray(bs, jnp.float32),
             "C": jnp.asarray(Cs, jnp.float32)}
    x0s = rng.normal(size=(B, n)) * 0.1

    def run():
        st = solver.init(x0s, pdata=pdata)
        for _ in range(4):
            st = solver.run_chunk(st)
            if not (np.asarray(st.status) == RUNNING).any():
                break
        jax.block_until_ready(st)
        return st

    t0 = time.time()
    st = run()
    wall_cold = time.time() - t0
    t0 = time.time()
    st = run()
    wall_warm = time.time() - t0
    statuses = [STATUS_NAMES[int(s)] for s in np.asarray(st.status)]
    solved = int(np.sum(np.asarray(st.status) == OPTIMAL))
    objs = np.asarray(st.cache.fval)

    # scipy trust-constr lane on the same instances (budgeted).  It gets
    # its OWN iteration budget (1000): an interior-point NLP code needs
    # far more than the one-phase outer-iteration cap to converge, and a
    # lane that never reaches Optimal would make the comparison vacuous.
    sp_pars = pars.with_overrides({"term.max_it": 1000})
    t0 = time.time()
    sp_solved = sp_done = 0
    fval_ok = 0
    for i in range(B):
        Ai, bi, Ci = As[i], bs[i], Cs[i]
        spec_i = NLPSpec(
            f=lambda x, Ai=Ai, bi=bi: 0.5 * jnp.sum((jnp.asarray(Ai) @ x) ** 2)
            + jnp.dot(jnp.asarray(bi), x),
            c=lambda x, Ci=Ci: jnp.asarray(Ci) @ x,
            lcon=np.full(m, -1.0), ucon=np.full(m, 1.0),
            lvar=np.full(n, -10.0), uvar=np.full(n, 10.0),
            x0=np.zeros(n), lin=tuple(range(m)), name=f"qp{i}")
        r = scipy_baseline_solve(spec_i, sp_pars)
        sp_done += 1
        if r.status == "Optimal":
            sp_solved += 1
            rel = abs(r.obj - objs[i]) / max(1.0, abs(r.obj))
            fval_ok += rel < 5e-3
        if time.time() - t0 > args.scipy_budget_s:
            break
    wall_scipy_partial = time.time() - t0
    wall_scipy_est = wall_scipy_partial * B / max(sp_done, 1)

    out = {
        "n_problems": B, "n": n, "m": m,
        "platform": jax.default_backend(),
        "one_phase_statuses": {s: statuses.count(s)
                               for s in sorted(set(statuses))},
        "one_phase_wall_s_cold": round(wall_cold, 2),
        "one_phase_wall_s_warm": round(wall_warm, 2),
        "one_phase_solves_per_s_warm": round(solved / wall_warm, 2),
        "trust_constr_done": sp_done,
        "trust_constr_optimal": sp_solved,
        "fval_agreement_on_checked": f"{fval_ok}/{sp_solved} (rel < 5e-3)",
        "trust_constr_wall_s": round(wall_scipy_partial, 2),
        "trust_constr_wall_s_est_full": round(wall_scipy_est, 2),
        "trust_constr_solves_per_s": round(
            sp_done / max(wall_scipy_partial, 1e-9), 3),
        "aggregate_speedup_vs_trust_constr_warm":
            round(wall_scipy_est / max(wall_warm, 1e-9), 1),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
