#!/usr/bin/env python
"""ECON per-iteration on-device cost breakdown (VERDICT r3 item 3c; the
TODO's unchecked item).  Times each component of one outer iteration of
the ECON flagship (models/tax.tax1d) in the campaign's exact mixed-
precision layout (f64 state/oracles + f32_fallback MXU factor,
run_econ.py lane), so the next optimization is data-driven:

    oracle   a(x) + J^T products at f64 (line-search + residual evals)
    form     Q = H + J' D J (f32 cast + fused jtdj)
    factor   Cholesky f32 + pivot check (+ f64 fallback branch cost)
    finalize M = L^-T L^-1 (invchol)
    direction RHS + refined solve + KKT-error ratio
    ls_trial one line-search trial (move_primal + dual step + accept)
    outer    the full fused outer_iter (cross-check: components ~ outer)

    python scripts/profile_econ.py [--na 50] [--reps 10]
Writes results/profile_econ.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--na", type=int, default=50)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="results/profile_econ.md")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from onephase_tpu.config import Params
    from onephase_tpu.ipm.core import OnePhaseKernel
    from onephase_tpu.models.tax import tax1d
    from onephase_tpu.nlp import canonicalize

    # the ECON campaign lane (run_econ.py defaults)
    pars = Params().with_overrides({
        "output_level": 0, "term.tol_opt": 1e-6, "chunk_size": 5,
        "history_capacity": 2,
        "kkt.factor_precision": "f32_fallback",
        "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_highprec": True, "kkt.it_refine_tol": 1e-12})
    nlp = canonicalize(tax1d(na=args.na), dtype=jnp.float64)
    kern = OnePhaseKernel(nlp, pars)
    dev = jax.devices()[0]
    print(f"device={dev} na={args.na} n={nlp.n} m_canon={nlp.m}")

    st = jax.block_until_ready(
        kern.initial_state_from(jnp.asarray(nlp.x0, kern.dtype)))
    # advance a few iterations so the profile point is representative
    st = jax.block_until_ready(kern.run_chunk(st))

    rows = []

    def rec(name, fn, *a):
        t = timeit(fn, *a, reps=args.reps)
        rows.append((name, t * 1e3))
        print(f"  {name:<12} {t*1e3:9.2f} ms")
        return t

    # oracle evals (the line search's per-trial cost: a(x) + pullback)
    x = st.p.x

    @jax.jit
    def oracle(xx):
        import jax as _j
        cons, pull = _j.vjp(lambda v: nlp.c(v), xx)
        a = nlp.a_of(xx, cons, None)
        return a, pull(jnp.ones(nlp.m_orig, kern.dtype))[0]

    rec("oracle_eval", oracle, x)

    @jax.jit
    def form(stt):
        return kern.form_factor(stt.p, stt.cache, stt.fact, stt.pdata)
    fact = jax.block_until_ready(form(st))
    rec("form_Q", form, st)

    @jax.jit
    def factor(f):
        return kern.factor(f.Q, jnp.asarray(1e-6, kern.dtype))
    (L, D), ok = jax.block_until_ready(factor(fact))
    rec("factor", factor, fact)

    fin = jax.jit(kern.finalize_solver)
    Mop = jax.block_until_ready(fin(L))
    rec("finalize_inv", fin, L)

    @jax.jit
    def direction(stt, f, Lm, Dv):
        f2 = f._replace(L=Lm, D=Dv, delta=jnp.asarray(1e-6, kern.dtype),
                        ok=jnp.asarray(True))
        return kern.compute_direction(f2, stt.p, stt.cache, 0.0, 0.0, 0.0)
    rec("direction", direction, st, fact, Mop, D)

    @jax.jit
    def terminate(stt):
        return kern.terminate(stt.p, stt.cache, stt.pdata, stt.bvals)
    rec("terminate", terminate, st)

    @jax.jit
    def outer(stt):
        return kern.outer_iter(stt)
    rec("outer_iter", outer, st)

    total_comp = sum(t for nm, t in rows if nm != "outer_iter")
    outer_ms = dict(rows)["outer_iter"]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write(f"# ECON per-iteration cost breakdown — {dev}, "
                 f"na={args.na} (n={nlp.n}, m_canon={nlp.m}), f64 state + "
                 "f32_fallback factor (the run_econ.py lane)\n\n")
        fh.write("| component | ms | share of outer |\n|---|---|---|\n")
        for nm, ms in rows:
            fh.write(f"| {nm} | {ms:.2f} | {100*ms/outer_ms:.0f}% |\n")
        fh.write(f"\ncomponent sum (1x each) {total_comp:.2f} ms vs outer "
                 f"{outer_ms:.2f} ms — the outer iteration runs the line "
                 "search (multiple oracle evals), refinement passes and "
                 "2 correction steps, so outer >> single components is "
                 "expected; the ratio table shows where an outer "
                 "iteration's time goes per single call.\n")
        fh.write("\nReference cost profile for comparison "
                 "(docs/one-phase.tex:901-912): Schur form 42.1%, "
                 "factorizations 35.4%, Jacobian 7.9%, Hessian 3.4%, "
                 "backsolves 0.8%, constraints 0.6%.\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
