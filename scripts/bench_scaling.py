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

    # This host exposes the virtual devices over a FIXED physical core
    # budget, so iters/s cannot grow with device count by construction and
    # weak scaling is not measurable here (the r4 table's "22x overhead"
    # and sub-0.8 rows were a per-chunk RECOMPILE — sharding-signature
    # drift, fixed in parallel/mesh.py — plus 8-way oversubscription of
    # 2 cores).  What a virtual mesh CAN measure is the overhead the
    # partitioned program adds: the same total batch, same physical cores,
    # run (a) as one unsharded jit and (b) dp-sharded over nd devices.
    # efficiency = wall_unsharded / wall_sharded; ~1.0 means the sharded
    # program adds no serialization, so N real chips give ~N x.
    from onephase_tpu.parallel.batch import BatchSolver

    b_total = max(dev_counts) * args.per_device
    x0s = np.ones((b_total, nlp.n)) * (1.0 + 0.02 * np.arange(b_total))[:, None]

    def timed_solve(solver):
        st = solver.init(x0s)
        st = solver.run_chunk(st)                  # compile + warm
        jax.block_until_ready(st)
        st = solver.init(x0s)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        chunks = 0
        while chunks < 10:
            running = bool(np.any(np.asarray(st.status) == 0))
            if not running:
                break
            st = solver.run_chunk(st)
            chunks += 1
        jax.block_until_ready(st)
        dt = time.perf_counter() - t0
        return st, dt, chunks

    st_ref, wall_unsharded, _ = timed_solve(BatchSolver(nlp, pars))
    total_outer_ref = int(np.sum(np.asarray(st_ref.t) - 1))
    print({"lane": "unsharded control", "batch": b_total,
           "wall_s": round(wall_unsharded, 3)}, flush=True)

    rows = []
    for nd in dev_counts:
        if nd == 1:
            continue
        solver = ShardedBatchSolver(nlp, pars, mesh=make_mesh(nd))
        st, dt, chunks = timed_solve(solver)
        total_outer = int(np.sum(np.asarray(st.t) - 1))
        assert total_outer == total_outer_ref, (total_outer, total_outer_ref)
        rows.append({"devices": nd, "batch": b_total,
                     "total_outer": total_outer, "chunks": chunks,
                     "wall_s": round(dt, 3),
                     "iters_per_s": round(total_outer / dt, 1),
                     "efficiency_vs_unsharded": round(wall_unsharded / dt, 3)})
        print(rows[-1], flush=True)

    payload = {"mode": "sharding-overhead control: one unsharded jit vs "
                       "dp-sharded over nd virtual CPU devices, IDENTICAL "
                       f"total batch {b_total} of tax1d(na={args.na}) on the "
                       "same fixed physical cores; efficiency = "
                       "wall_unsharded / wall_sharded (~1.0 = the "
                       "partitioned program adds no serialization; real "
                       "chips then scale ~linearly)",
               "unsharded_wall_s": round(wall_unsharded, 3),
               "total_outer": total_outer_ref,
               "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    with open(args.out.replace(".json", ".md"), "w") as fh:
        fh.write("# DP sharding overhead (virtual CPU mesh, fixed physical "
                 "cores)\n\nSame total batch, same cores; efficiency = "
                 "unsharded wall / sharded wall.  Unsharded control: "
                 f"{wall_unsharded:.3f}s for {total_outer_ref} outer its.\n\n")
        fh.write("| devices | batch | outer iters | wall s | iters/s | "
                 "efficiency vs unsharded |\n|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['devices']} | {r['batch']} | {r['total_outer']} "
                     f"| {r['wall_s']} | {r['iters_per_s']} | "
                     f"{r['efficiency_vs_unsharded']} |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
