"""TPU microbenchmark: Pallas kernels vs XLA for the IPM hot ops.

Dispatch through the axon tunnel costs ~1-2 ms per executable launch, so
sub-ms ops are timed by chaining ITERS data-dependent applications inside a
single jitted fori_loop and dividing.

Per (n, batch) config:
  - factor:   jnp.linalg.cholesky      vs  blocked Pallas chol
  - inverse:  XLA trisolve-vs-identity vs  blocked Pallas tri_inv_gram
  - solve:    XLA trisolve pair        vs  explicit-inverse matvec
  - fused Q:  xla_fused_q              vs  pallas_fused_q

Used to pick `kkt.linear_solver_type` defaults per backend.
Run:  python scripts/profile_kernels.py [--sizes 128,256,512] [--batches 1,16,64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 32


def chain_time(step, init, reps=5):
    """Time step applied ITERS times on-device; returns seconds/application."""
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, v: step(v), x)

    try:
        out = jax.block_until_ready(run(init))   # compile + warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(out)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (reps * ITERS), None
    except Exception as e:  # noqa: BLE001
        return None, str(e).split("\n")[0][:100]


def fmt(t):
    return f"{t*1e6:8.1f}us" if t is not None else "    FAIL "


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="128,256,512")
    ap.add_argument("--batches", default="1,16,64")
    ap.add_argument("--m-ratio", type=float, default=0.5)
    ap.add_argument("--skip-pallas", action="store_true",
                    help="XLA variants only (the pallas compiles hang via "
                         "the remote-compile tunnel at n>=1024)")
    ap.add_argument("--bf16-q", action="store_true",
                    help="also time the bf16 fused-Q variant")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    batches = [int(b) for b in args.batches.split(",")]

    from onephase_tpu.ops.cholesky import (pallas_chol, pallas_tri_inv_gram,
                                           xla_chol_inv_from_L)
    from onephase_tpu.ops.schur import pallas_fused_q, xla_fused_q

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    fails = []

    for n in sizes:
        m = int(n * args.m_ratio)
        for b in batches:
            A = rng.normal(size=(b, n, n)).astype(np.float32)
            Q = jnp.asarray(A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))
            rhs = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
            J = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))
            w = jnp.abs(jnp.asarray(rng.normal(size=(b, m)).astype(np.float32))) + 0.1
            bnd = jnp.abs(rhs) + 0.1
            eps = jnp.asarray(1e-20, jnp.float32)

            L = jax.block_until_ready(jnp.linalg.cholesky(Q))
            Minv = jax.jit(jax.vmap(xla_chol_inv_from_L))(L)

            # --- factor ---
            t_xc, e = chain_time(
                lambda X: jnp.linalg.cholesky(Q + eps * (X + X.transpose(0, 2, 1))), L)
            if e: fails.append(f"n={n} b={b} xla_chol: {e}")
            if args.skip_pallas:
                t_pc = t_bc = t_pi = t_bi = t_pq = None
                err_c = err_i = float("nan")
            else:
                pchol = jax.vmap(lambda q: pallas_chol(q)[0])
                t_pc, e = chain_time(
                    lambda X: pchol(Q + eps * (X + X.transpose(0, 2, 1))), L)
                if e: fails.append(f"n={n} b={b} pallas_chol: {e}")
                # auto dispatcher under vmap (routes to XLA on hardware)
                from onephase_tpu.ops.cholesky import chol_auto
                bchol = jax.vmap(chol_auto)
                t_bc, e = chain_time(
                    lambda X: bchol(Q + eps * (X + X.transpose(0, 2, 1)))[0], L)
                if e: fails.append(f"n={n} b={b} chol_auto_vmap: {e}")

            # --- inverse (finalize step) ---
            t_xi, e = chain_time(
                lambda X: jax.vmap(xla_chol_inv_from_L)(L + eps * X), Minv)
            if e: fails.append(f"n={n} b={b} xla_inv: {e}")
            if not args.skip_pallas:
                from onephase_tpu.ops.cholesky import tri_inv_gram_auto
                pinv = jax.vmap(pallas_tri_inv_gram)
                t_pi, e = chain_time(lambda X: pinv(L + eps * X), Minv)
                if e: fails.append(f"n={n} b={b} pallas_inv: {e}")
                binv = jax.vmap(tri_inv_gram_auto)
                t_bi, e = chain_time(lambda X: binv(L + eps * X), Minv)
                if e: fails.append(f"n={n} b={b} inv_auto_vmap: {e}")

            # --- solve ---
            def tri2(r):
                z = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)
                z = jax.scipy.linalg.solve_triangular(
                    L.transpose(0, 2, 1), z, lower=False)
                return z[..., 0] / jnp.maximum(1.0, jnp.max(jnp.abs(z)))
            t_xs, e = chain_time(tri2, rhs)
            if e: fails.append(f"n={n} b={b} xla_solve: {e}")

            def mv(r):
                z = jnp.einsum("bij,bj->bi", Minv, r)
                return z / jnp.maximum(1.0, jnp.max(jnp.abs(z)))
            t_mv, e = chain_time(mv, rhs)
            if e: fails.append(f"n={n} b={b} mv_solve: {e}")

            # --- fused Q ---
            xq = jax.vmap(xla_fused_q)
            t_xq, e = chain_time(lambda X: xq(J, w, X * 1e-20 + Q, bnd), Q)
            if e: fails.append(f"n={n} b={b} xla_q: {e}")
            t_bq = None
            if args.bf16_q:
                bq16 = jax.vmap(lambda j_, w_, h_, b_: xla_fused_q(
                    j_, w_, h_, b_, mxu_dtype=jnp.bfloat16))
                t_bq, e = chain_time(lambda X: bq16(J, w, X * 1e-20 + Q, bnd), Q)
                if e: fails.append(f"n={n} b={b} bf16_q: {e}")
            if not args.skip_pallas:
                pq = jax.vmap(lambda j_, w_, h_, b_: pallas_fused_q(j_, w_, h_, b_))
                t_pq, e = chain_time(lambda X: pq(J, w, X * 1e-20 + Q, bnd), Q)
                if e: fails.append(f"n={n} b={b} pallas_q: {e}")

            # correctness spot checks for the pallas paths
            if not args.skip_pallas:
                try:
                    Lp = jax.vmap(lambda q: pallas_chol(q)[0])(Q)
                    err_c = float(jnp.max(jnp.abs(Lp - L)) / jnp.max(jnp.abs(L)))
                    Mp = pinv(L)
                    err_i = float(jnp.max(jnp.abs(Mp - Minv)) / jnp.max(jnp.abs(Minv)))
                except Exception as ex:  # noqa: BLE001
                    err_c = err_i = float("nan")
                    fails.append(f"n={n} b={b} pallas check: {str(ex).split(chr(10))[0][:100]}")

            print(f"n={n:4d} m={m:4d} b={b:3d} | "
                  f"chol x {fmt(t_xc)} p {fmt(t_pc)} bp {fmt(t_bc)} (err {err_c:.1e}) | "
                  f"inv x {fmt(t_xi)} p {fmt(t_pi)} bp {fmt(t_bi)} (err {err_i:.1e}) | "
                  f"solve tri {fmt(t_xs)} mv {fmt(t_mv)} | "
                  f"Q x {fmt(t_xq)} p {fmt(t_pq)}"
                  + (f" bf16 {fmt(t_bq)}" if args.bf16_q else ""),
                  flush=True)

    for f in fails:
        print(f, flush=True)


if __name__ == "__main__":
    main()
