"""Batched (vmapped) solver instances.

TPU-first capability with no counterpart in the reference (SURVEY.md §2.4):
the reference scales out via SLURM job arrays over problems
(benchmark/CUTEst/*.sbatch); here a batch of same-structure instances is one
vmapped device program — the unit of TPU throughput.

Per-instance termination is automatic: `run_chunk`'s `lax.while_loop` under
`vmap` masks finished instances, so a batch runs until every instance's
status leaves RUNNING (or the chunk bound is hit).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..ipm.core import OnePhaseKernel
from ..ipm.state import RUNNING, State
from ..nlp import CanonNLP


class BatchSolver:
    """vmapped multistart / same-structure batch solver."""

    def __init__(self, nlp: CanonNLP, pars: Optional[Params] = None):
        pars = pars or Params()
        # batched-solver variants of history_capacity / max_step_attempts:
        # explicit, documented parameters (see config.py) — no silent fork.
        if pars.history_capacity == 0 and pars.batch_history_capacity > 0:
            pars = pars.with_overrides(
                {"history_capacity": pars.batch_history_capacity})
        if pars.batch_max_step_attempts > 0:
            pars = pars.with_overrides(
                {"max_step_attempts": pars.batch_max_step_attempts})
        from ..ipm.dual import make_kernel
        self.kernel = make_kernel(nlp, pars)
        self.pars = pars
        self._init_batch = jax.jit(jax.vmap(
            lambda x0: self.kernel._initial_state(x0)))
        self._init_batch_bvals = jax.jit(jax.vmap(self.kernel._initial_state))
        self._run_batch = jax.jit(jax.vmap(self.kernel._run_chunk))
        self._term64_batch = jax.jit(jax.vmap(
            lambda st: self.kernel.terminate_f64(st.p, st.cache, st.pdata,
                                                 st.bvals)))

    def init(self, x0s, bvals=None, pdata=None) -> State:
        """x0s: (B, n) starting points -> batched State.

        `bvals` optionally batches the bound VALUES (dict of (B, ...) arrays
        from nlp.default_bvals / nlp.shifted_bvals): instances may differ in
        constraint-range data while sharing one compiled solver — the
        on-device analogue of the reference's perturbed-problem campaigns.

        `pdata` optionally batches the full parametric problem data (see
        nlp.NLPSpec.pdata): per-instance constraint matrices / objective
        coefficients — one compiled solver over a shape-bucketed sweep.
        """
        x0s = jnp.asarray(x0s, self.kernel.dtype)
        if bvals is None and pdata is None:
            return self._init_batch(x0s)
        if bvals is None:
            bvals = jax.vmap(lambda _: self.kernel.nlp.default_bvals())(x0s)
        if pdata is None:
            return self._init_batch_bvals(x0s, bvals)
        return self._init_batch_bvals(x0s, bvals, pdata)

    def run_chunk(self, st: State) -> State:
        return self._run_batch(st)

    def solve(self, x0s, bvals=None, pdata=None,
              max_chunks: int = 10_000) -> State:
        """Run until every instance terminates, `max_chunks` chunks, or the
        wall-clock limit `pars.term.max_time` (still-running instances are
        marked MAX_TIME, matching the single-problem driver)."""
        import time as _time

        from ..ipm.state import MAX_TIME

        t0 = _time.time()
        # between-chunk f64 termination recheck: the in-loop f32
        # measurement is conservative (VJP/matmul noise sits ON TOP of the
        # true residuals, so it produces false NEGATIVES, never false
        # certificates); one exact f64 re-measurement of the still-RUNNING
        # iterates every chunk (~25 outer its) releases the instances the
        # noise floor is holding hostage, at ~1/25th the cost of measuring
        # f64 in-loop.  Engaged only when it can change anything.
        recheck = (jax.config.jax_enable_x64
                   and self.kernel.dtype != jnp.float64
                   and self.pars.kkt.residual_precision != "f64"
                   and self.pars.term.batch_f64_recheck)
        st = self.init(x0s, bvals, pdata)
        for _ in range(max_chunks):
            if not bool(jnp.any(st.status == RUNNING)):
                break
            if _time.time() - t0 > self.pars.term.max_time:
                st = st._replace(status=jnp.where(
                    st.status == RUNNING, MAX_TIME, st.status
                ).astype(jnp.int32))
                break
            st = self.run_chunk(st)
            # STALLED instances also get the exact recheck: a stall at the
            # f32 measurement floor may already satisfy the f64-measured
            # certificate, avoiding the escalation pass entirely
            from ..ipm.state import STALLED
            rc_mask = (st.status == RUNNING) | (st.status == STALLED)
            if recheck and bool(jnp.any(rc_mask)):
                codes = self._term64_batch(st)
                st = st._replace(status=jnp.where(
                    rc_mask & (codes != RUNNING),
                    codes, st.status).astype(jnp.int32))
        return st

    def statuses(self, st: State):
        from ..ipm.state import STATUS_NAMES
        return [STATUS_NAMES[int(s)] for s in np.asarray(st.status)]
