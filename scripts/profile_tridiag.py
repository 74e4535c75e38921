#!/usr/bin/env python
"""TPU microbenchmark: Pallas single-kernel block-tridiagonal Cholesky vs
the XLA lax.scan implementation (ops/tridiag_pallas.py vs
ops/block_tridiag.py).

The XLA scan pays per-step dispatch + HBM round-trips for K tiny dense
steps; the Pallas kernel keeps the whole recursion in VMEM.  This is the
shape where a hand kernel should win on TPU (the dense factorizations are
the shape where XLA wins — results/profile_kernels_tpu.md).

    python scripts/profile_tridiag.py            # TPU
Writes results/profile_tridiag_tpu.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CHAIN = 16  # applications per timed call: amortizes the ~25 ms tunnel RTT


def chain_factor(factor_fn):
    """R chained factor applications inside ONE jitted program (the
    single-call floor through the axon tunnel is ~25 ms, results r3)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(Ad, Bs):
        def body(i, acc):
            out = factor_fn(Ad + (acc * 1e-30) * jnp.eye(Ad.shape[-1],
                                                         dtype=Ad.dtype), Bs)
            first = out[0] if isinstance(out, tuple) else out.Ck
            return acc + jnp.sum(first[0, 0, :1])
        return lax.fori_loop(0, CHAIN, body, jnp.zeros((), Ad.dtype))
    return jax.jit(run)


def chain_solve(solve_fn):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(b, *fargs):
        def body(i, acc):
            x = solve_fn(b + acc * 1e-30, *fargs)
            return acc + jnp.sum(x[0, :1])
        return lax.fori_loop(0, CHAIN, body, jnp.zeros((), b.dtype))
    return jax.jit(run)


def bench(fn, args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="results/profile_tridiag_tpu.md")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from onephase_tpu.ops.block_tridiag import tridiag_factor, tridiag_solve
    from onephase_tpu.ops.tridiag_pallas import (pallas_tridiag_factor,
                                                 pallas_tridiag_solve)

    rng = np.random.default_rng(0)
    rows = []
    shapes = [(50, 32), (100, 32), (200, 32), (50, 64), (100, 64),
              (200, 64), (50, 128), (100, 128), (400, 64)]
    for K, nb in shapes:
        Ad = rng.normal(size=(K, nb, nb)).astype(np.float32)
        Ad = np.einsum("kij,klj->kil", Ad, Ad) + 3 * np.eye(
            nb, dtype=np.float32)
        Bs = (rng.normal(size=(K - 1, nb, nb)) * 0.3).astype(np.float32)
        b = rng.normal(size=(K, nb)).astype(np.float32)
        Adj, Bsj, bj = jnp.asarray(Ad), jnp.asarray(Bs), jnp.asarray(b)
        delta = 1e-3

        try:
            t_xf = bench(chain_factor(
                lambda A, B: tridiag_factor(A, B, delta)), (Adj, Bsj)) / CHAIN
        except Exception as e:  # noqa: BLE001
            rows.append((K, nb, None, None, None, None, str(e)[:80]))
            continue
        try:
            t_pf = bench(chain_factor(
                lambda A, B: pallas_tridiag_factor(A, B, delta)),
                (Adj, Bsj)) / CHAIN
            Ck, Ci, Ek, ok = jax.jit(
                lambda A, B: pallas_tridiag_factor(A, B, delta))(Adj, Bsj)
            ref = jax.jit(lambda A, B: tridiag_factor(A, B, delta))(Adj, Bsj)
            err = float(jnp.max(jnp.abs(Ck - ref.Ck))
                        / jnp.max(jnp.abs(ref.Ck)))
            t_xs = bench(chain_solve(
                lambda bb, f: tridiag_solve(f, bb)), (bj, ref)) / CHAIN
            t_ps = bench(chain_solve(
                lambda bb, C, E: pallas_tridiag_solve(C, E, bb)),
                (bj, Ci, Ek)) / CHAIN
            rows.append((K, nb, t_xf, t_pf, t_xs, t_ps, f"relerr={err:.1e}"))
        except Exception as e:  # noqa: BLE001
            rows.append((K, nb, t_xf, None, None, None, str(e)[:80]))

    lines = [f"# Block-tridiag kernel profile — {jax.devices()[0].device_kind}"
             f", f32\n",
             "`python scripts/profile_tridiag.py` — median of 5, jitted, "
             "delta=1e-3.  factor: XLA lax.scan vs Pallas single kernel; "
             "solve: XLA two-scan trisolves vs Pallas matmul sweeps "
             "(inverse blocks from the factor kernel).\n",
             "| K | nb | n | factor XLA ms | factor Pallas ms | speedup | "
             "solve XLA ms | solve Pallas ms | speedup | note |",
             "|---|---|---|---|---|---|---|---|---|---|"]
    for K, nb, t_xf, t_pf, t_xs, t_ps, note in rows:
        def f(t):
            return f"{1e3 * t:.2f}" if t else "—"
        sf = f"{t_xf / t_pf:.1f}x" if t_xf and t_pf else "—"
        ss = f"{t_xs / t_ps:.1f}x" if t_xs and t_ps else "—"
        lines.append(f"| {K} | {nb} | {K*nb} | {f(t_xf)} | {f(t_pf)} | {sf} "
                     f"| {f(t_xs)} | {f(t_ps)} | {ss} | {note} |")
    text = "\n".join(lines) + "\n"
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write(text)
    print(text)


if __name__ == "__main__":
    main()
