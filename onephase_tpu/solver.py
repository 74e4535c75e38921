"""User-facing driver: `one_phase_solve`.

Reference: src/IPM/one_phase.jl:7-89 (`one_phase_solve` overloads) — init
dispatch, interior assertion, main loop, timing.

The TPU driver runs the jitted kernel in chunks of outer iterations so that
wall-clock limits (`term.max_time`) and progressive console output live
host-side while the algorithm itself stays a single compiled program.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Params
from .ipm import history as hist_mod
from .ipm.core import OnePhaseKernel
from .ipm.state import RUNNING, MAX_TIME, STATUS_NAMES, State
from .nlp import CanonNLP, NLPSpec, canonicalize
from .utils.timer import Timer


class EvalNaNError(RuntimeError):
    """NaN/Inf escaped into the iterate (reference `Eval_NaN_error`,
    src/utils/eval.jl:21-51).  Raised between jitted chunks when
    `pars.throw_error_nans` is set; by default NaN is handled in-algorithm
    (rejected trial steps / delta escalation) and never raises."""


def _state_has_nan(st: State) -> bool:
    for v in (st.p.x, st.p.s, st.p.y, st.p.mu, st.cache.fval, st.cache.g):
        if not bool(jnp.all(jnp.isfinite(v))):
            return True
    return False


@dataclass
class Result:
    """Solve result (reference returns (iter, status, hist, t, err, timer))."""

    status: str
    status_code: int
    x: np.ndarray            # full-variable primal solution
    obj: float
    iterations: int
    history: List[dict]
    y: np.ndarray            # canonical duals
    constr_duals: np.ndarray  # per original constraint: y_l - y_u
    reduced_costs: np.ndarray  # per variable (reference get_reducedcosts)
    mu: float
    max_violation: float
    solve_time: float
    kernel: Any = field(repr=False, default=None)
    state: Any = field(repr=False, default=None)
    timer: Optional[Timer] = field(repr=False, default=None)


def one_phase_solve(problem, pars: Optional[Params] = None,
                    options: Optional[Dict[str, Any]] = None,
                    kernel: Optional[OnePhaseKernel] = None) -> Result:
    """Solve ``min f(x) s.t. lcon<=c(x)<=ucon, lvar<=x<=uvar``.

    `problem` is an `NLPSpec` or `CanonNLP`.  `options` are string-path
    overrides (`"term!max_it"` / `"term.max_it"` style).
    """
    pars = pars or Params()
    if options:
        pars = pars.with_overrides(options)

    timer = Timer()
    with timer.span("INIT"):
        if kernel is None:
            with timer.span("canonicalize"):
                canon = (problem if isinstance(problem, CanonNLP)
                         else canonicalize(problem))
            with timer.span("build_kernel"):
                from .ipm.dual import make_kernel
                kernel = make_kernel(canon, pars)
        with timer.span("initial_state"):
            st = kernel.initial_state()

    printed = 0
    if pars.output_level >= 1:
        print(hist_mod.HEADER)

    t_start = time.time()
    status = int(st.status)
    with timer.span("IPM"):
        first_chunk = True
        while status == RUNNING:
            # the first chunk includes the jit compile; time it separately
            # so campaign timer stats split compile from steady-state
            with timer.span("chunk_compile" if first_chunk else "chunk"):
                st = kernel.run_chunk(st)
                status = int(st.status)  # blocks on device completion
            first_chunk = False
            with timer.span("progress"):
                printed = _print_progress(kernel, st, printed, pars,
                                          final=status != RUNNING)
            if pars.throw_error_nans and _state_has_nan(st):
                raise EvalNaNError(
                    f"NaN in iterate at outer iteration {int(st.t)}")
            if pars.debug_mode >= 1 and status == RUNNING:
                # interior-invariant cross-check between chunks (the
                # reference's debug_mode re-evaluation, line_search.jl:133,
                # + the per-iteration assert at one_phase.jl:172)
                if not bool(kernel.is_feasible(st.p, pars.ls.comp_feas)):
                    raise AssertionError(
                        f"interior invariant violated at outer iteration "
                        f"{int(st.t)} (debug_mode check)")
            if status == RUNNING and time.time() - t_start > pars.term.max_time:
                st = st._replace(status=jnp.asarray(MAX_TIME, jnp.int32))
                status = MAX_TIME
                break

    if pars.output_level >= 1:
        print(f"Terminated with {STATUS_NAMES[status]}")

    with timer.span("FINALIZE"):
        res = finalize_result(kernel, st, time.time() - t_start, timer)
    if pars.output_level >= 3:
        # reference prints timer stats at output_level >= 3
        # (one_phase.jl:51-53 print_timer_stats)
        timer.print_stats()
    return res


def finalize_result(kernel: OnePhaseKernel, st: State, wall: float,
                    timer: Optional[Timer] = None) -> Result:
    nlp = kernel.nlp
    buf = np.asarray(st.hist.buf)
    count = int(st.hist.count)
    records = hist_mod.rows_to_records(buf, count)

    x_red = np.asarray(st.p.x)
    x_full = np.array(nlp._x_template)
    x_full[nlp.free_idx] = x_red
    y = np.asarray(st.p.y)

    # constraint duals: lambda_i = y_l(i) - y_u(i) on original constraints
    lam = np.zeros(nlp.m_orig)
    np.add.at(lam, nlp.li, y[:nlp.n_lcon])
    np.add.at(lam, nlp.ui, -y[nlp.n_lcon:nlp.n_lcon + nlp.n_ucon])
    # reduced costs (reference get_reducedcosts, Class_cutest.jl:515-538)
    rc = np.zeros(nlp.n)
    st_l = nlp.m_cons
    np.add.at(rc, nlp.lvi, y[st_l:st_l + nlp.n_lvar])
    np.add.at(rc, nlp.uvi, -y[st_l + nlp.n_lvar:])
    rc_full = np.zeros(nlp.n_full)
    rc_full[nlp.free_idx] = rc

    a = np.asarray(st.cache.a)
    status = int(st.status)
    return Result(
        status=STATUS_NAMES[status], status_code=status,
        x=x_full, obj=float(st.cache.fval),
        iterations=int(st.t) - 1, history=records,
        y=y, constr_duals=lam, reduced_costs=rc_full,
        mu=float(st.p.mu),
        max_violation=float(max(0.0, -a.min())) if a.size else 0.0,
        solve_time=wall, kernel=kernel, state=st, timer=timer)


def _print_progress(kernel, st, printed, pars, final=False):
    if pars.output_level < 1:
        return int(st.hist.count)
    count = int(st.hist.count)
    if count <= printed:
        return printed
    buf = np.asarray(st.hist.buf[printed:count])
    recs = hist_mod.rows_to_records(buf, count - printed)
    thr = pars.term.dual_scale_threshold
    last_t = None
    for i, r in enumerate(recs):
        y_n = r["y_norm"]
        scale = thr / max(y_n, thr)
        is_first_of_t = r["t"] != last_t
        last_t = r["t"]
        lvl = pars.output_level
        show = (lvl >= 4 or (lvl >= 3 and is_first_of_t)
                or (lvl == 2 and r["t"] % 10 == 1 and is_first_of_t)
                or (final and printed + i == count - 1))
        if show:
            print(hist_mod.format_row(r, scale))
    return count
