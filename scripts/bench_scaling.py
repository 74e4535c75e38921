#!/usr/bin/env python
"""Data-parallel scaling efficiency on a virtual device mesh (VERDICT r3
item 7; BASELINE.md ">=0.8 scaling efficiency in iters/s at N>=2 hosts").

Real pods are unavailable in this environment, so this measures the
HARNESS overhead of the dp-sharded batch solver on 1/2/4/8 virtual CPU
devices (xla_force_host_platform_device_count): weak scaling with a fixed
per-device load — iters/s should grow ~linearly with device count if the
sharded program adds no cross-device serialization.  On a real pod the
same program shards over ICI; this table is the overhead record the
committed MULTICHIP dryrun can be compared against.

    python scripts/bench_scaling.py [--per-device 4] [--devices 1,2,4,8]
Writes results/scaling_efficiency.json (+ .md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per-device", type=int, default=4)
    ap.add_argument("--na", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--chunk-size", type=int, default=20)
    ap.add_argument("--out", default="results/scaling_efficiency.json")
    args = ap.parse_args()

    dev_counts = [int(d) for d in args.devices.split(",")]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count="
                               + str(max(dev_counts)))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from onephase_tpu.config import Params
    from onephase_tpu.models.tax import tax1d
    from onephase_tpu.nlp import canonicalize
    from onephase_tpu.parallel.mesh import ShardedBatchSolver, make_mesh

    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 200, "chunk_size": args.chunk_size,
        "history_capacity": 2,
    })
    nlp = canonicalize(tax1d(na=args.na))
    rows = []
    for nd in dev_counts:
        mesh = make_mesh(nd)
        solver = ShardedBatchSolver(nlp, pars, mesh=mesh)
        b = nd * args.per_device
        x0s = np.ones((b, nlp.n)) * (1.0 + 0.02 * np.arange(b))[:, None]
        st = solver.init(x0s)
        st = solver.run_chunk(st)                  # compile + warm
        jax.block_until_ready(st)
        st = solver.init(x0s)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        chunks = 0
        while solver.num_running(st) and chunks < 10:
            st = solver.run_chunk(st)
            chunks += 1
        jax.block_until_ready(st)
        dt = time.perf_counter() - t0
        total_outer = int(np.sum(np.asarray(st.t) - 1))
        iters_s = total_outer / dt
        rows.append({"devices": nd, "batch": b, "total_outer": total_outer,
                     "chunks": chunks,
                     "wall_s": round(dt, 3), "iters_per_s": round(iters_s, 1)})
        print(rows[-1], flush=True)

    # efficiency is measured WITHIN the sharded lanes: a 1-device mesh
    # lowers to a plain jit with no partitioning or collectives (a
    # different, faster program), and on a VIRTUAL CPU mesh every
    # collective is threadpool-emulated — so the meaningful number is how
    # iters/s grows 2 -> 4 -> 8 devices, normalized to the smallest
    # sharded lane.  On real ICI the collective cost is micro-seconds and
    # the 1-device gap closes; this table records the harness overhead.
    sharded = [r for r in rows if r["devices"] > 1] or rows
    base = sharded[0]["iters_per_s"] / sharded[0]["devices"]
    for r in rows:
        r["efficiency_vs_sharded_base"] = round(
            r["iters_per_s"] / (r["devices"] * base), 3)
    rows[0]["note"] = ("unsharded jit fast path" if rows[0]["devices"] == 1
                       else "")
    payload = {"mode": "weak scaling, dp-sharded ShardedBatchSolver, "
                       f"tax1d(na={args.na}), {args.per_device} inst/device, "
                       "virtual CPU devices; efficiency normalized to the "
                       "2-device sharded lane",
               "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    with open(args.out.replace(".json", ".md"), "w") as fh:
        fh.write("# DP scaling efficiency (weak scaling, virtual CPU mesh)\n\n")
        fh.write("| devices | batch | outer iters | wall s | iters/s | "
                 "efficiency (vs 2-dev) | note |\n|---|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['devices']} | {r['batch']} | {r['total_outer']} "
                     f"| {r['wall_s']} | {r['iters_per_s']} | "
                     f"{r['efficiency_vs_sharded_base']} | "
                     f"{r.get('note', '')} |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
