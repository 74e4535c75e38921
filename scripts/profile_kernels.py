"""On-device kernel microbenchmarks: XLA vs Pallas for the IPM hot ops.

Run on the target backend (TPU by default; JAX_PLATFORMS_OVERRIDE=cpu to
compare).  Measures, for representative (n, batch) points of the batched
IPM workload:

  - cholesky:    jnp.linalg.cholesky  vs  ops.cholesky.pallas_chol (vmap)
  - chol_solve:  two XLA trisolves    vs  ops.cholesky.pallas_chol_solve
  - fused Q:     xla_fused_q          vs  ops.schur.pallas_fused_q

Output: one table row per (op, n, batch, impl) with median ms/call and
effective GFLOP/s.  This is the evidence behind the default
`kkt.linear_solver_type` per backend (TODO.md round-2 item 1).
"""

import os
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS_OVERRIDE"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS_OVERRIDE"])
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def spd_batch(b, n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(b, n, n)).astype(np.float32) / np.sqrt(n)
    Q = np.einsum("bij,bkj->bik", A, A) + 2.0 * np.eye(n, dtype=np.float32)
    return jnp.asarray(Q, dtype)


def main():
    from onephase_tpu.ops.cholesky import pallas_chol, pallas_chol_solve
    from onephase_tpu.ops.schur import pallas_fused_q, xla_fused_q

    dtype = jnp.float32
    print(f"backend={jax.default_backend()} dev={jax.devices()[0]}")
    rows = []
    for n in (128, 256, 512):
        for b in (16, 64):
            Q = spd_batch(b, n, dtype)
            bvec = jnp.ones((b, n), dtype)
            rng = np.random.default_rng(1)
            m = n // 2
            J = jnp.asarray(rng.normal(size=(b, m, n)), dtype)
            w = jnp.abs(jnp.asarray(rng.normal(size=(b, m)), dtype)) + 0.1
            H = Q
            bnd = jnp.ones((b, n), dtype)

            xla_chol = jax.jit(jnp.linalg.cholesky)
            t = timeit(xla_chol, Q)
            flops = b * n**3 / 3
            rows.append(("chol", n, b, "xla", t, flops / t / 1e6))

            pl_chol = jax.jit(jax.vmap(lambda q: pallas_chol(q)[0]))
            t = timeit(pl_chol, Q)
            rows.append(("chol", n, b, "pallas", t, flops / t / 1e6))

            L = xla_chol(Q)
            import jax.scipy.linalg as jsl
            xla_solve = jax.jit(jax.vmap(lambda l, v: jsl.solve_triangular(
                l.T, jsl.solve_triangular(l, v, lower=True), lower=False)))
            t = timeit(xla_solve, L, bvec)
            flops = b * 2 * n**2
            rows.append(("solve", n, b, "xla", t, flops / t / 1e6))

            pl_solve = jax.jit(jax.vmap(pallas_chol_solve))
            t = timeit(pl_solve, L, bvec)
            rows.append(("solve", n, b, "pallas", t, flops / t / 1e6))

            xq = jax.jit(jax.vmap(xla_fused_q))
            t = timeit(xq, J, w, H, bnd)
            flops = b * (2 * m * n * n)
            rows.append(("fusedq", n, b, "xla", t, flops / t / 1e6))

            pq = jax.jit(jax.vmap(lambda j_, w_, h_, b_: pallas_fused_q(
                j_, w_, h_, b_)))
            t = timeit(pq, J, w, H, bnd)
            rows.append(("fusedq", n, b, "pallas", t, flops / t / 1e6))

    print(f"{'op':8s} {'n':>5s} {'batch':>5s} {'impl':8s} "
          f"{'ms':>9s} {'GFLOP/s':>9s}")
    for op, n, b, impl, t, gf in rows:
        print(f"{op:8s} {n:5d} {b:5d} {impl:8s} {t:9.3f} {gf:9.1f}")


if __name__ == "__main__":
    main()
