#!/usr/bin/env python
"""Component-level timing of one batched IPM outer step.

The bench sweep shows per-batch-step cost growing ~linearly in batch size
(no parallel gain), so this script times each step component in isolation
— vmapped exactly as BatchSolver runs them — to find the serializing op:

    form_factor   fused Q = H + J^T D J        (MXU matmuls)
    factor        Cholesky(+delta)             (suspect: XLA serializes)
    finalize      trisolve-vs-I / tri_inv_gram (suspect)
    direction     RHS build + refined solves
    ls_trial      one line-search trial (oracle evals + dual step)
    outer_iter    the whole fused step, for cross-check

    python scripts/profile_step.py [--n 256] [--batches 1,16,64,256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=20):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--m", type=int, default=None)
    ap.add_argument("--batches", default="1,16,64,256")
    ap.add_argument("--lst", default="invchol")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import make_qp
    from onephase_tpu.config import Params
    from onephase_tpu.ipm.core import OnePhaseKernel
    from onephase_tpu.nlp import canonicalize

    n = args.n
    m = args.m or n // 2
    pars = Params().with_overrides({
        "output_level": 0, "history_capacity": 2,
        "kkt.linear_solver_type": args.lst,
        "kkt.it_refine_highprec": True,
        "batch_max_step_attempts": 4,
    })
    nlp = canonicalize(make_qp(n, m), dtype=jnp.float32)
    kern = OnePhaseKernel(nlp, pars)
    print(f"device={jax.devices()[0]} n={n} m={m} (canon {nlp.m}) lst={args.lst}")
    print(f"{'batch':>6} {'form_fac':>10} {'factor':>10} {'finalize':>10} "
          f"{'direction':>10} {'chunk/it':>11} {'chol_xla':>10} "
          f"{'trisolI_xla':>11}")

    for b in [int(x) for x in args.batches.split(",")]:
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(rng.normal(size=(b, nlp.n)) * 0.1, jnp.float32)
        init_b = jax.jit(jax.vmap(lambda x0: kern._initial_state(x0)))
        st = jax.block_until_ready(init_b(x0s))

        # component closures, vmapped like BatchSolver
        def _form(stt):
            return kern.form_factor(stt.p, stt.cache, stt.fact, stt.pdata)
        form_b = jax.jit(jax.vmap(_form))
        fact = jax.block_until_ready(form_b(st))

        def _factor(f):
            return kern.factor(f.Q, jnp.asarray(1e-6, jnp.float32))
        factor_b = jax.jit(jax.vmap(_factor))
        (L, D), ok = jax.block_until_ready(factor_b(fact))

        fin_b = jax.jit(jax.vmap(kern.finalize_solver))
        Mop = jax.block_until_ready(fin_b(L))

        def _dir(stt, f, Lm, Dv):
            f2 = f._replace(L=Lm, D=Dv, delta=jnp.asarray(1e-6, jnp.float32),
                            ok=jnp.asarray(True))
            return kern.compute_direction(f2, stt.p, stt.cache,
                                          0.0, 0.0, 0.0)
        dir_b = jax.jit(jax.vmap(_dir))


        # raw XLA reference ops at the same shapes
        Q = fact.Q + 1e-3 * jnp.eye(nlp.n, dtype=jnp.float32)[None]
        chol = jax.jit(jnp.linalg.cholesky)
        eye = jnp.eye(nlp.n, dtype=jnp.float32)

        def _trisol(Lb):
            return jax.scipy.linalg.solve_triangular(Lb, eye, lower=True)
        trisol_b = jax.jit(jax.vmap(_trisol))

        t_form = timeit(form_b, st)
        t_fac = timeit(factor_b, fact)
        t_fin = timeit(fin_b, L)
        t_dir = timeit(dir_b, st, fact, Mop, D)
        t_outer = float('nan')
        t_chol = timeit(chol, Q)
        t_tri = timeit(trisol_b, jnp.linalg.cholesky(Q))
        print(f"{b:>6} {t_form*1e3:>9.2f}m {t_fac*1e3:>9.2f}m "
              f"{t_fin*1e3:>9.2f}m {t_dir*1e3:>9.2f}m {t_outer*1e3:>10.2f}m "
              f"{t_chol*1e3:>9.2f}m {t_tri*1e3:>10.2f}m")


if __name__ == "__main__":
    main()
