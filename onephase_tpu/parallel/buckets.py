"""Shape-class bucketing: a heterogeneous LP sweep as a few padded batches.

TPU-first capability with no counterpart in the reference (SURVEY.md §2.4):
the reference runs its Netlib/CUTEst campaigns as one process per problem
(SLURM arrays, benchmark/CUTEst/*.sbatch).  Here a directory of LPs with
different shapes is solved as a handful of vmapped batches:

1. eliminate fixed variables per instance (the reference's `_i_not_fixed`
   canonicalization step, Class_cutest.jl:37-48, done on the data here),
2. pad every instance to a shape-class (n, m rounded up) with neutral
   variables/rows and all-finite bounds (missing bound sides -> +-BIG),
   so the canonical row PATTERN is identical across a bucket,
3. per-instance (A, c, c0) become parametric pdata and per-instance bound
   values become bvals — one compiled solver per bucket (nlp.NLPSpec.pdata),
4. run each bucket through `BatchSolver` with masked per-instance
   termination, and de-pad the results.

Padding is exact: pad variables have zero objective and zero matrix columns
(bounds [-1, 1]), pad rows are 0^T x in [-1, 1]; the +-BIG bound rows are
never active for problems whose solutions are < BIG in norm.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..models.lp import LPData
from ..nlp import NLPSpec, canonicalize
from ..ipm.state import STATUS_NAMES
from .batch import BatchSolver

BIG = 1e8


def _round_up(x, m):
    return int(-(-x // m) * m)


@dataclass
class _Instance:
    """Bookkeeping for one problem inside a bucket."""

    name: str
    n_true: int            # free (post-elimination) variable count
    x_fixed: np.ndarray    # full-variable template with fixed values
    free_idx: np.ndarray
    c0: float


@dataclass
class BucketResult:
    status: str
    obj: float
    x: np.ndarray          # full-variable primal solution
    iterations: int
    max_violation: float
    name: str = ""
    # final-iterate metrics from the last history row (the ring keeps the
    # latest record even at batch_history_capacity=2)
    dual_feas: float = float("nan")
    comp: float = float("nan")
    # resolved by the f64 escalation pass (solve_bucketed escalate_f64)
    escalated: bool = False


def eliminate_fixed(d: LPData, tol: float = 0.0) -> Tuple[LPData, np.ndarray, np.ndarray]:
    """Fold variables with lvar == uvar into the constraint bounds / offset.

    Returns (reduced LPData, full template x with fixed values, free idx).
    """
    fixed = d.lvar == d.uvar
    if not fixed.any():
        return d, np.array(d.lvar, dtype=float) * 0.0, np.arange(d.n)
    free = ~fixed
    xf = np.zeros(d.n)
    xf[fixed] = d.lvar[fixed]
    shift = d.A[:, fixed] @ d.lvar[fixed]
    red = LPData(
        cvec=d.cvec[free], A=d.A[:, free],
        lcon=d.lcon - shift, ucon=d.ucon - shift,
        lvar=d.lvar[free], uvar=d.uvar[free],
        x0=None if d.x0 is None else d.x0[free],
        name=d.name, c0=d.c0 + float(d.cvec[fixed] @ d.lvar[fixed]))
    return red, xf, np.nonzero(free)[0]


def _finite(lo, hi):
    lo = np.where(np.isfinite(lo), lo, -BIG)
    hi = np.where(np.isfinite(hi), hi, BIG)
    return lo, hi


def equilibrate_rows(d: LPData) -> LPData:
    """Scale every constraint row to unit inf-norm (row equilibration —
    the standard LP-preprocessing step every industrial solver applies
    internally; HiGHS scales inside, so the f32 lane must too or it pays
    the raw row conditioning).  The primal solution and feasibility SET
    are unchanged (each row and its bounds divide by the same positive
    constant); only constraint duals change units, which BucketResult
    does not expose."""
    if d.m == 0:
        return d
    r = np.max(np.abs(d.A), axis=1)
    r = np.where(r > 0.0, r, 1.0)
    return LPData(cvec=d.cvec, A=d.A / r[:, None],
                  lcon=d.lcon / r, ucon=d.ucon / r,
                  lvar=d.lvar, uvar=d.uvar, x0=d.x0,
                  name=d.name, c0=d.c0)


def pad_lp(d: LPData, n_pad: int, m_pad: int) -> LPData:
    """Pad to (n_pad vars, m_pad rows) with neutral data; all bounds finite."""
    n, m = d.n, d.m
    A = np.zeros((m_pad, n_pad))
    A[:m, :n] = d.A
    cvec = np.zeros(n_pad)
    cvec[:n] = d.cvec
    lcon = np.full(m_pad, -1.0)
    ucon = np.full(m_pad, 1.0)
    lcon[:m], ucon[:m] = _finite(d.lcon, d.ucon)
    lvar = np.full(n_pad, -1.0)
    uvar = np.full(n_pad, 1.0)
    lvar[:n], uvar[:n] = _finite(d.lvar, d.uvar)
    x0 = np.zeros(n_pad)
    if d.x0 is not None:
        x0[:n] = d.x0
    return LPData(cvec=cvec, A=A, lcon=lcon, ucon=ucon, lvar=lvar, uvar=uvar,
                  x0=x0, name=d.name, c0=d.c0)


def bucket_template(n_pad: int, m_pad: int) -> NLPSpec:
    """Parametric LP template for one shape class.

    All bounds finite (values are per-instance bvals; the [-1, 1] template
    values only fix the static canonical row pattern), data in pdata.
    """
    pdata = {"A": np.zeros((m_pad, n_pad)), "c": np.zeros(n_pad),
             "c0": np.zeros(())}
    return NLPSpec(
        f=lambda x, pd: jnp.dot(pd["c"], x) + pd["c0"],
        c=lambda x, pd: pd["A"] @ x,
        jac=lambda x, pd: pd["A"],
        lcon=np.full(m_pad, -1.0), ucon=np.full(m_pad, 1.0),
        lvar=np.full(n_pad, -1.0), uvar=np.full(n_pad, 1.0),
        x0=np.zeros(n_pad), lin=tuple(range(m_pad)),
        name=f"lp_bucket_{n_pad}x{m_pad}",
        constant_jac=True, constant_hess=True, zero_hess=True, pdata=pdata)


def bucket_shapes(datas: Sequence[LPData], round_to: int = 64) -> Dict[Tuple[int, int], List[int]]:
    """Group instance indices by padded shape class."""
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, d in enumerate(datas):
        fixed = d.lvar == d.uvar
        n_eff = int((~fixed).sum())
        key = (_round_up(max(n_eff, 1), round_to), _round_up(max(d.m, 1), round_to))
        buckets.setdefault(key, []).append(i)
    return buckets


_SOLVER_CACHE: Dict[tuple, tuple] = {}


def solve_bucketed(problems: Dict[str, LPData],
                   pars: Optional[Params] = None,
                   round_to: int = 64,
                   max_batch: int = 256,
                   dtype=None,
                   escalate_f64: bool = False,
                   scale_rows: bool = True) -> Dict[str, BucketResult]:
    """Solve a heterogeneous dict of LPs as shape-bucketed vmapped batches.

    Compiled solvers are cached per (shape-class, pars, dtype) for the
    process lifetime, so repeat campaigns over the same shape classes are
    compile-free (the Params tree is frozen/hashable).

    `escalate_f64`: precision escalation on unresolved statuses — instances
    that end MAX_IT/MAX_DELTA under an f32 solve get ONE f64 re-solve pass
    (as a second set of buckets).  The batch-campaign analogue of the
    per-factorization kkt.factor_precision="f32_fallback" escape: the f32
    MXU lane resolves the bulk at full throughput, the handful of
    endgame-limited instances (ill-conditioned certificate races where the
    f32 iterates plateau marginally above the Farkas threshold) pay f64
    exactly once.  Requires jax_enable_x64."""
    pars = pars or Params()
    names = list(problems.keys())
    raw = [problems[k] for k in names]

    reduced, insts = [], []
    for name, d in zip(names, raw):
        red, xf, free = eliminate_fixed(d)
        if scale_rows:
            red = equilibrate_rows(red)
        reduced.append(red)
        insts.append(_Instance(name=name, n_true=red.n, x_fixed=xf,
                               free_idx=free, c0=red.c0))

    out: Dict[str, BucketResult] = {}
    for (n_pad, m_pad), idxs in bucket_shapes(reduced, round_to).items():
        key = (n_pad, m_pad, pars, str(dtype))
        if key in _SOLVER_CACHE:
            nlp, solver = _SOLVER_CACHE[key]
        else:
            spec = bucket_template(n_pad, m_pad)
            nlp = canonicalize(spec, dtype=dtype)
            solver = BatchSolver(nlp, pars)
            _SOLVER_CACHE[key] = (nlp, solver)
        for lo in range(0, len(idxs), max_batch):
            chunk = idxs[lo:lo + max_batch]
            padded = [pad_lp(reduced[i], n_pad, m_pad) for i in chunk]
            pdata = {
                "A": jnp.asarray(np.stack([p.A for p in padded]), nlp.dtype),
                "c": jnp.asarray(np.stack([p.cvec for p in padded]), nlp.dtype),
                "c0": jnp.asarray(np.array([p.c0 for p in padded]), nlp.dtype),
            }
            bvals = {
                "l": jnp.asarray(np.stack([p.lcon for p in padded]), nlp.dtype),
                "u": jnp.asarray(np.stack([p.ucon for p in padded]), nlp.dtype),
                "lv": jnp.asarray(np.stack([p.lvar for p in padded]), nlp.dtype),
                "uv": jnp.asarray(np.stack([p.uvar for p in padded]), nlp.dtype),
            }
            x0s = np.stack([p.x0 for p in padded])
            st = solver.solve(x0s, bvals=bvals, pdata=pdata)

            xs = np.asarray(st.p.x)
            objs = np.asarray(st.cache.fval)
            its = np.asarray(st.t) - 1
            a = np.asarray(st.cache.a)
            statuses = np.asarray(st.status)
            # last history row per instance (final-iterate metrics)
            from ..ipm.history import IDX
            buf = np.asarray(st.hist.buf)          # (B, cap, NCOLS)
            cnt = np.asarray(st.hist.count)
            last = np.clip(cnt - 1, 0, buf.shape[1] - 1)
            rows = buf[np.arange(buf.shape[0]), last]
            for bi, i in enumerate(chunk):
                inst = insts[i]
                x_full = np.array(inst.x_fixed)
                x_full[inst.free_idx] = xs[bi, :inst.n_true]
                out[inst.name] = BucketResult(
                    status=STATUS_NAMES[int(statuses[bi])],
                    obj=float(objs[bi]),
                    x=x_full, iterations=int(its[bi]),
                    max_violation=float(max(0.0, -a[bi].min())),
                    name=inst.name,
                    dual_feas=float(rows[bi, IDX["dual_scaled"]]),
                    comp=float(rows[bi, IDX["comp"]]))

    if escalate_f64 and dtype != jnp.float64:
        import jax
        unresolved = sorted(name for name, r in out.items()
                            if r.status in ("MAX_IT", "MAX_DELTA", "STALLED"))
        if unresolved:
            if not jax.config.jax_enable_x64:
                raise ValueError("escalate_f64 requires jax_enable_x64")
            # run the escalation pass on the HOST CPU when the default
            # backend emulates f64 (TPU): native f64 on a handful of
            # endgame-limited instances keeps the accelerator free for
            # the f32 bulk — a heterogeneous two-tier solve.  (Running
            # the emulated-f64 bucket on the chip was tried and CRASHES
            # the axon TPU worker at n>=1024 — the same f64+large-program
            # signature as the ECON250 chunk-size crash; see
            # results/chunk_crash_bisect.md.)  The f64 lane certifies in
            # well under half the f32 budget (diag_infeas.py: <=40 its vs
            # 120), so the escalation budget is capped to bound host cost.
            esc_pars = pars.with_overrides({
                "term.max_it": min(pars.term.max_it, 80)})
            try:
                esc_dev = (jax.devices("cpu")[0]
                           if jax.default_backend() != "cpu" else None)
            except RuntimeError:
                esc_dev = None
            ctx = (jax.default_device(esc_dev) if esc_dev is not None
                   else contextlib.nullcontext())
            with ctx:
                res64 = solve_bucketed({k: problems[k] for k in unresolved},
                                       esc_pars, round_to=round_to,
                                       max_batch=max_batch, dtype=jnp.float64,
                                       escalate_f64=False)
            for k, r in res64.items():
                r.escalated = True
                out[k] = r
    return out
