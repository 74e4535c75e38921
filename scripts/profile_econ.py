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


def loop_time(step, carry0, iters=64, reps=3):
    """Time `step` amortized inside ONE dispatch.

    Through the axon tunnel a single dispatch costs ~27 ms — more than most
    components themselves (the r4-era per-call numbers were flat at the
    dispatch floor and attributed nothing).  Here the component runs
    `iters` times inside one jitted fori_loop; inputs carry a loop-index
    perturbation so XLA cannot CSE the calls, and the carry keeps every
    call live.  Returns seconds per single call.
    """
    import jax
    from jax import lax

    @jax.jit
    def run(c0):
        return lax.fori_loop(0, iters, step, c0)

    out = jax.block_until_ready(run(carry0))    # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(run(carry0))
    del out
    return (time.perf_counter() - t0) / (reps * iters)


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

    # Single dispatches through the axon tunnel cost ~27 ms — more than
    # most components (r4-era per-call timings were flat at that floor).
    # Each component is therefore timed amortized inside ONE fori_loop
    # dispatch; inputs carry a loop-index perturbation so XLA cannot CSE
    # the repeated calls (see loop_time).
    rows = []
    iters = max(args.reps, 32)

    def rec(name, step, carry0, it=None):
        t = loop_time(step, carry0, iters=it or iters)
        rows.append((name, t * 1e3))
        print(f"  {name:<12} {t*1e3:9.2f} ms", flush=True)
        return t

    one = jnp.asarray(1.0, kern.dtype)
    x = st.p.x

    # oracle evals (the line search's per-trial cost: a(x) + pullback)
    def oracle_step(i, c):
        xx, acc = c
        xv = xx * (one + 1e-12 * i)
        cons, pull = jax.vjp(lambda v: nlp.c(v), xv)
        a = nlp.a_of(xv, cons, None)
        g = pull(jnp.ones(nlp.m_orig, kern.dtype))[0]
        return xx, acc + a[0] + g[0]

    rec("oracle_eval", oracle_step, (x, jnp.zeros((), kern.dtype)))

    def form_step(i, c):
        stt, acc = c
        p = stt.p._replace(y=stt.p.y * (one + 1e-12 * i))
        f = kern.form_factor(p, stt.cache, stt.fact, stt.pdata)
        return stt, acc + f.Q.ravel()[0]

    rec("form_Q", form_step, (st, jnp.zeros((), kern.dtype)))

    fact = jax.jit(lambda s: kern.form_factor(
        s.p, s.cache, s.fact, s.pdata))(st)

    def factor_step(i, c):
        f, acc = c
        d = jnp.asarray(1e-6, kern.dtype) * (one + 1e-9 * i)
        (L, D), ok = kern.factor(f.Q, d)
        return f, acc + L.ravel()[0]

    rec("factor", factor_step, (fact, jnp.zeros((), kern.dtype)))

    (L, D), ok = jax.jit(lambda f: kern.factor(
        f.Q, jnp.asarray(1e-6, kern.dtype)))(fact)

    def finalize_step(i, c):
        Lm, acc = c
        M = kern.finalize_solver(Lm * (one + 1e-14 * i))
        return Lm, acc + M.ravel()[0]

    rec("finalize_inv", finalize_step, (L, jnp.zeros((), kern.dtype)))

    Mop = jax.jit(kern.finalize_solver)(L)
    f2 = fact._replace(L=Mop, D=D, delta=jnp.asarray(1e-6, kern.dtype),
                       ok=jnp.asarray(True))

    def direction_step(i, c):
        acc = c
        eta = 1e-12 * i
        dir_, kerr = kern.compute_direction(f2, st.p, st.cache,
                                            eta, eta, eta)
        return acc + dir_.x[0] + kerr

    rec("direction", direction_step, jnp.zeros((), kern.dtype))

    def terminate_step(i, c):
        acc = c
        p = st.p._replace(y=st.p.y * (one + 1e-12 * i))
        code = kern.terminate(p, st.cache, st.pdata, st.bvals)
        return acc + code

    rec("terminate", terminate_step, jnp.zeros((), jnp.int32))

    # the full fused outer iteration, chained through its own state
    rec("outer_iter", lambda i, s: kern.outer_iter(s), st, it=16)

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
