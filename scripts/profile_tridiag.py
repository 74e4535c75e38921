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

        fx = jax.jit(lambda A, B: tridiag_factor(A, B, delta))
        try:
            t_xf = bench(fx, (Adj, Bsj))
        except Exception as e:  # noqa: BLE001
            rows.append((K, nb, None, None, None, None, str(e)[:80]))
            continue
        fp = jax.jit(lambda A, B: pallas_tridiag_factor(A, B, delta))
        try:
            t_pf = bench(fp, (Adj, Bsj))
            Ck, Ci, Ek, ok = fp(Adj, Bsj)
            ref = fx(Adj, Bsj)
            err = float(jnp.max(jnp.abs(Ck - ref.Ck)))
            sx = jax.jit(tridiag_solve)
            t_xs = bench(sx, (ref, bj))
            sp = jax.jit(pallas_tridiag_solve)
            t_ps = bench(sp, (Ci, Ek, bj))
            rows.append((K, nb, t_xf, t_pf, t_xs, t_ps, f"err={err:.1e}"))
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
