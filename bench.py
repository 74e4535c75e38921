"""Benchmark: batched solve throughput of the one-phase IPM on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Metric (BASELINE.json): KKT factorizations/s per chip, measured by running
the full jitted IPM (not an isolated kernel) on a vmapped batch of
constrained QP instances to *certified termination* — every factorization
also pays its Schur formation, direction solve and line search, exactly
like production use, and the run only counts if the instances actually
reach `Optimal`.  A solver that stalls (e.g. the pre-round-3 TPU bf16
matmul default, VERDICT r2 item 1) reports value 0.0 instead of a
throughput number: uncertified iterations are not progress.

Extra fields (informational, not the driver metric):
  solved/batch      — certified-Optimal count; value is 0.0 unless all solve
  iters_per_s       — outer iterations/s across the batch
  solves_per_s      — certified solves/s (time-to-all-solved basis)
  statuses          — status histogram

Metric history: r01 reported 3127 fac/s and r02 1448 fac/s on the SAME
config — the drop was *efficiency*, not regression: round-2 refinement cut
factorizations/iteration from ~3.3 to ~1.1 while wall-clock/iteration
improved 27%.  Those runs also never converged on TPU (bf16 matmul stall).
From round 3 the number is computed over certified solves only, so it is
not comparable to r01/r02 (which measured 960 stalled iterations).

Baseline derivation (BASELINE.md): the reference spends 35.4% of a 10 h
238-problem CUTEst sweep factorizing at 1.9 factorizations/outer-iteration
(docs/one-phase.tex:901-931).  With ~100 outer iterations/problem that is
~238*100*1.9 / (0.354*36000 s) ~= 3.5 factorizations/s on its single core
at comparable (n ~ 10^2-10^3) problem sizes.  vs_baseline = value / 3.5.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FAC_PER_S = 3.5


def make_qp(n=256, m=128, seed=0):
    """Random strictly-convex QP with linear constraints and bounds."""
    import jax.numpy as jnp
    from onephase_tpu.nlp import NLPSpec
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)) / np.sqrt(n)
    b = rng.normal(size=n)
    C = rng.normal(size=(m, n)) / np.sqrt(n)
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)
    Cj = jnp.asarray(C)
    return NLPSpec(
        f=lambda x: 0.5 * jnp.sum((Aj @ x) ** 2) + jnp.dot(bj, x),
        c=lambda x: Cj @ x,
        lcon=np.full(m, -1.0), ucon=np.full(m, 1.0),
        lvar=np.full(n, -10.0), uvar=np.full(n, 10.0),
        x0=np.zeros(n), lin=tuple(range(m)),
        name=f"bench_qp_n{n}_m{m}",
        constant_jac=True, constant_hess=True)


def main():
    """Watchdog wrapper: run the measurement in a child process with a hard
    timeout (the tunneled TPU can wedge); fall back to CPU if the device
    hangs, so the driver always gets its JSON line."""
    if os.environ.get("ONEPHASE_BENCH_CHILD") == "1":
        return _bench()
    import subprocess
    args = [sys.executable, "-u", os.path.abspath(__file__)] + sys.argv[1:]
    env = dict(os.environ, ONEPHASE_BENCH_CHILD="1")
    try:
        out = subprocess.run(args, env=env, capture_output=True, text=True,
                             timeout=1500)
        line = _last_json(out.stdout)
        if line:
            print(line)
            return
        sys.stderr.write(out.stderr[-2000:] + "\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write("bench: device run timed out; falling back to CPU\n")
    env["JAX_PLATFORMS_OVERRIDE"] = "cpu"
    try:
        out = subprocess.run(args, env=env, capture_output=True, text=True,
                             timeout=1500)
        line = _last_json(out.stdout)
        if line:
            print(line)
            return
        sys.stderr.write(out.stderr[-2000:] + "\n")
    except subprocess.TimeoutExpired:
        pass
    print(json.dumps({"metric": "kkt_factorizations_per_s_per_chip",
                      "value": 0.0, "unit": "fac/s (bench failed to run)",
                      "vs_baseline": 0.0}))


def _last_json(text: str):
    for line in reversed(text.strip().splitlines()):
        if line.startswith("{"):
            return line
    return None


def _bench():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    lst = sys.argv[4] if len(sys.argv) > 4 else os.environ.get(
        "ONEPHASE_LST", "invchol")

    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS_OVERRIDE"):
        jax.config.update("jax_platforms",
                          os.environ["JAX_PLATFORMS_OVERRIDE"])

    from onephase_tpu.config import Params
    from onephase_tpu.ipm.state import OPTIMAL, RUNNING, STATUS_NAMES
    from onephase_tpu.nlp import canonicalize
    from onephase_tpu.parallel.batch import BatchSolver

    dtype = jnp.float32  # TPU-native precision
    pars = Params().with_overrides({
        "output_level": 0,
        "term.max_it": 60,
        "term.tol_opt": 1e-4,     # f32-appropriate tolerance
        "chunk_size": 20,
        "history_capacity": 2,
        "kkt.linear_solver_type": lst,
        # double-single residual refinement: better f32 directions cut
        # wasted line-search work in the mu ~ tol tail (+18% measured)
        "kkt.it_refine_highprec": True,
        # matmul_precision defaults to "highest": on TPU the bf16 matmul
        # default floors the KKT residual above tol and nothing certifies
        # (VERDICT r2 item 1); measured on-chip: default=16xMAX_IT/0.74s,
        # highest=16xOptimal in 11-14 its/0.16s.
    })
    nlp = canonicalize(make_qp(n, m), dtype=dtype)
    solver = BatchSolver(nlp, pars)

    rng = np.random.default_rng(1)
    x0s = rng.normal(size=(batch, nlp.n)) * 0.1

    # warmup/compile
    st = solver.init(x0s)
    st = solver.run_chunk(st)
    jax.block_until_ready(st)

    # timed run: fresh states, run until every instance terminates.
    # status check pulls to host via np (no jit compile in the timed loop)
    max_chunks = (pars.term.max_it + pars.chunk_size - 1) // pars.chunk_size
    st = solver.init(x0s)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(max_chunks):
        st = solver.run_chunk(st)
        if not (np.asarray(st.status) == RUNNING).any():
            break
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0

    statuses = [STATUS_NAMES[int(s)] for s in np.asarray(st.status)]
    solved = int(np.sum(np.asarray(st.status) == OPTIMAL))
    total_fac = int(jnp.sum(st.cum_fac))
    total_outer = int(jnp.sum(st.t - 1))
    fac_per_s = total_fac / dt
    certified = solved == batch
    res = {
        "metric": "kkt_factorizations_per_s_per_chip",
        "value": round(fac_per_s, 2) if certified else 0.0,
        "unit": (f"fac/s over certified solves (n={n}, m={m}, batch={batch}, "
                 f"{lst}, {solved}/{batch} Optimal, {total_outer} outer its "
                 f"in {dt:.3f}s)"),
        "vs_baseline": round(fac_per_s / BASELINE_FAC_PER_S, 2)
        if certified else 0.0,
        "solved": solved,
        "batch": batch,
        "iters_per_s": round(total_outer / dt, 1),
        "solves_per_s": round(solved / dt, 1),
        "statuses": {s: statuses.count(s) for s in sorted(set(statuses))},
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
