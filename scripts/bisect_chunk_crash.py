#!/usr/bin/env python
"""Bisect the ECON250 chunk-size crash (VERDICT r3 item 4).

r3 observation: ECON250 (tax1d na=250, n+m ~ 62k canonical, f64 state +
f32_fallback factor) crashes the TPU worker when `chunk_size` (outer
iterations per jitted while-loop program) exceeds 5; the campaign shipped
with chunk_size=5 as a workaround.  This script isolates the axis:

  - chunk_size sweep at fixed na (program size scales ~linearly in
    chunk only through the while-loop TRIP COUNT, which is a runtime
    value — so a pure chunk_size dependence would point at the runtime,
    not program size)
  - history ring on/off (the ring is the only state whose update count
    scales with chunk size)
  - corrections 2 -> 1 (halves the inner-step count per outer iter)
  - na sweep at fixed chunk (memory scaling)

Each config runs ONE chunk of `--its` outer iterations in a fresh
subprocess (a worker crash must not take the sweep down), recording
ok/crash + wall + error head.

    python scripts/bisect_chunk_crash.py [--na 250]
Writes results/chunk_crash_bisect.json (+ .md).
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.models.tax import tax1d
from onephase_tpu.nlp import canonicalize

na, chunk, hist_cap, corr, its = {na}, {chunk}, {hist_cap}, {corr}, {its}
pars = Params().with_overrides({{
    "output_level": 0, "term.max_it": its, "chunk_size": chunk,
    "history_capacity": hist_cap, "max_it_corrections": corr,
    "kkt.factor_precision": "f32_fallback",
    "kkt.linear_solver_type": "invchol",
    "kkt.it_refine_highprec": True, "kkt.it_refine_tol": 1e-12}})
nlp = canonicalize(tax1d(na=na), dtype=jnp.float64)
k = OnePhaseKernel(nlp, pars)
t0 = time.time()
st = k.initial_state_from(jnp.asarray(nlp.x0, k.dtype))
st = k.run_chunk(st)
jax.block_until_ready(st)
print(f"OK t={{int(st.t)}} status={{int(st.status)}} "
      f"wall={{time.time()-t0:.1f}}s", flush=True)
"""


def run_cfg(na, chunk, hist_cap, corr, its, timeout):
    code = CHILD.format(repo=REPO, na=na, chunk=chunk, hist_cap=hist_cap,
                        corr=corr, its=its)
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout)
        ok = p.returncode == 0 and "OK" in p.stdout
        tail = (p.stdout.strip().splitlines() or [""])[-1] if ok else \
            (p.stderr.strip().splitlines() or [""])[-1][:200]
    except subprocess.TimeoutExpired:
        ok, tail = False, f"TIMEOUT {timeout}s"
    return {"na": na, "chunk_size": chunk, "history_capacity": hist_cap,
            "corrections": corr, "its": its, "ok": ok,
            "wall_s": round(time.time() - t0, 1), "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--na", type=int, default=250)
    ap.add_argument("--its", type=int, default=12)
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--out", default="results/chunk_crash_bisect.json")
    args = ap.parse_args()

    na = args.na
    cfgs = [
        # the r3 workaround point + the crash region
        (na, 5, 1024, 2),
        (na, 10, 1024, 2),
        (na, 20, 1024, 2),
        # isolate the history ring
        (na, 20, 2, 2),
        # isolate corrections
        (na, 20, 1024, 1),
        # smaller model, large chunk (memory-vs-program-size axis)
        (125, 50, 1024, 2),
    ]
    rows = []
    for cfg in cfgs:
        r = run_cfg(*cfg, its=args.its, timeout=args.timeout)
        rows.append(r)
        print(json.dumps(r), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump({"rows": rows}, fh, indent=1)
    md = args.out.replace(".json", ".md")
    with open(md, "w") as fh:
        fh.write("# ECON chunk-size crash bisect (fresh subprocess per "
                 "config, one chunk each)\n\n")
        fh.write("| na | chunk | hist_cap | corr | ok | wall s | tail |\n"
                 "|---|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['na']} | {r['chunk_size']} | "
                     f"{r['history_capacity']} | {r['corrections']} | "
                     f"{r['ok']} | {r['wall_s']} | {r['tail'][:80]} |\n")
    print(f"wrote {args.out} and {md}")


if __name__ == "__main__":
    main()
