"""One-phase IPM core: the complete algorithm as jittable pure functions.

TPU-native redesign of the reference's L3-L5 layers:

- KKT solve: primal Schur complement + Cholesky with fixed-count iterative
  refinement (reference: src/kkt_system_solver/schur.jl, system_rhs.jl)
- inertia-correcting delta search (reference: src/IPM/delta_strategy.jl:37-114)
- aggressive/stabilization switching + Mehrotra gamma probe
  (reference: src/IPM/one_phase.jl:91-108, take_step.jl:2-75)
- fraction-to-boundary backtracking line search with the one-phase nonlinear
  slack update ``s = a(x+) - beta * r0`` and dual-interval least-squares dual
  step (reference: src/line_search/*.jl)
- four-certificate termination (reference: src/IPM/terminate.jl:3-23)
- Gertz-style initialization (reference: src/init/gertz_init.jl)

Everything is traced once: the main loop is a `lax.while_loop` over outer
iterations; all inner loops (delta search, step attempts, backtracking) are
bounded `lax.while_loop`s, mirroring the reference's explicit bounds
(500 factorizations, 100 step attempts, 60 backtracks).

Deliberate deviations from the reference (documented where they occur):
- NaN in a Newton direction is handled as a failed step attempt (delta
  escalation) instead of a hard error.
- wall-clock (`max_time`) is enforced by the Python driver between jitted
  chunks of outer iterations, keeping the compiled region pure.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Params
from ..nlp import CanonNLP
from . import history as hist_mod
from ..ops import ldlt as ldlt_mod
from .state import (Cache, Dir, Factor, Filter, History, LSInfo, Point, State,
                    DUAL_INFEASIBLE, LS_DUAL_INFEASIBLE, LS_MAX_LS_IT,
                    LS_MIN_ALPHA, LS_NAN_DIR, LS_NAN_ERR, LS_NONE,
                    LS_NOT_ENOUGH_PROGRESS, LS_PREDICT_RED_NON_NEG, LS_S_BOUND,
                    LS_SUCCESS, MAX_DELTA, MAX_GRADIENT, MAX_IT, OPTIMAL,
                    PRIMAL_INFEASIBLE, RUNNING, STALLED)

# step-type codes for history
STEP_IT0 = 0
STEP_AGG = 1
STEP_STB = 2


def _norm_inf(v):
    return jnp.max(jnp.abs(v)) if v.size else jnp.asarray(0.0, v.dtype)


def _norm1(v):
    return jnp.sum(jnp.abs(v))


def _isbad(v):
    return jnp.any(~jnp.isfinite(v))


def _mm_precision_ctx(name: str):
    """Matmul-precision scope for the solver's traced entry points
    (config.py Params.matmul_precision).  Applied at trace time, so it
    covers every consumer of `_run_chunk`/`_initial_state` — the plain jit
    (solver.py), vmapped batches (parallel/batch.py), mesh-sharded runs,
    and the structured-KKT subclasses."""
    import contextlib
    if name in (None, "", "default"):
        return contextlib.nullcontext()
    return jax.default_matmul_precision(name)


_CACHE_ENABLED = False


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat campaigns over the same
    problem structure skip the (multi-second) solver compile entirely.
    Opt out with ONEPHASE_NO_COMPILE_CACHE=1."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    _CACHE_ENABLED = True
    import os
    if os.environ.get("ONEPHASE_NO_COMPILE_CACHE"):
        return
    try:
        cache_dir = os.environ.get(
            "ONEPHASE_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "onephase_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


class OnePhaseKernel:
    """Pure-function solver kernel for one canonical problem + parameter set."""

    def __init__(self, nlp: CanonNLP, pars: Params):
        _enable_compilation_cache()
        self.nlp = nlp
        self.pars = pars
        self.dtype = nlp.dtype
        n, m = nlp.n, nlp.m
        self.n, self.m = n, m

        # per-row fraction-to-boundary vectors (Class_iterate.jl:66-67;
        # linear rows relaxed in mehrotra_init, init.jl:78-79)
        import numpy as np
        fb = np.full(m, pars.ls.fraction_to_boundary)
        fbp = np.full(m, pars.ls.fraction_to_boundary_predict)
        if pars.init.init_style == "mehrotra":
            fb[nlp.lin_mask] = pars.ls.fraction_to_boundary_linear
            fbp[nlp.lin_mask] = pars.ls.fraction_to_boundary_linear
        self.frac_bd = jnp.asarray(fb, self.dtype)
        self.frac_bd_predict = jnp.asarray(fbp, self.dtype)

        cap_hint = pars.history_capacity
        self.hist_cap = cap_hint if cap_hint > 0 else (
            pars.term.max_it * pars.max_it_corrections + 2)
        self.filt_cap = pars.term.max_it * pars.max_it_corrections + 2

        # the reference's delta.max = 1e50 overflows f32; clamp to the dtype
        finfo_max = float(jnp.finfo(self.dtype).max)
        self.delta_max = min(pars.delta.max, finfo_max / 64.0)
        # mixed-precision factorization (config.py kkt.factor_precision):
        # only meaningful for an f64 solve dtype, and schur-only — the
        # symmetric paths refine against the stored K, which would then be
        # f32-quality; the schur refinement residual uses the separately
        # stored f64 H and Jc, so Q/L can be pure preconditioners.
        fp = pars.kkt.factor_precision
        mixed = fp in ("f32", "f32_fallback") and self.dtype == jnp.float64
        if mixed and pars.kkt.kkt_solver_type != "schur":
            raise ValueError(
                "kkt.factor_precision requires kkt_solver_type='schur'")
        self.factor_dtype = jnp.float32 if mixed else self.dtype
        # dtype the factor is CARRIED in (pure f32 mode keeps L/Q f32;
        # fallback mode stores f64 so both branches of the lax.cond agree)
        self.factor_store_dtype = (jnp.float32 if (mixed and fp == "f32")
                                   else self.dtype)
        # kkt.fallback_form_f32: under f32_fallback, Q is formed/carried in
        # f32 (MXU) and the exact f64 Q is re-formed lazily inside the
        # fallback branch (factor()); L stays carried in f64.
        self._fb_form_f32 = (mixed and fp == "f32_fallback"
                             and pars.kkt.fallback_form_f32)
        self.q_store_dtype = (jnp.float32 if self._fb_form_f32
                              else self.factor_store_dtype)
        # kkt.hi_matvec_f32pair: direction/refinement J-matvecs of f64
        # solves run as f32 double-single pairs (ops/refine) — native f32
        # vector/MXU ops instead of TPU-emulated f64, ~1e-13 accuracy.
        hip = pars.kkt.hi_matvec_f32pair
        self._hi_pair = (hip in ("all", "refine")
                         and self.dtype == jnp.float64
                         and pars.kkt.kkt_solver_type == "schur")
        # "all" also routes the direction-level products (schur_rhs, jdx,
        # a-posteriori KKT-error) through pairs; "refine" keeps those in
        # exact f64 — the KKT-ratio guard is noise-sensitive at the
        # endgame (measured +15 ECON50 iterations under "all")
        self._hi_pair_dir = self._hi_pair and hip == "all"
        # kkt.precond_f32: the finalized solve operator M is carried f32
        # (invchol/pallas only — those carry M, not a triangular L).
        self._precond_f32 = (pars.kkt.precond_f32
                             and self.dtype == jnp.float64
                             and pars.kkt.kkt_solver_type == "schur"
                             and pars.kkt.linear_solver_type
                             in ("invchol", "pallas"))
        self.L_store_dtype = (jnp.float32 if self._precond_f32
                              else self.factor_store_dtype)

        # constant-structure fast paths (nlp.NLPSpec.constant_jac/hess):
        # evaluate once here; they fold into the compiled program as
        # constants instead of being re-derived every outer iteration.
        # Parametric problems cannot fold (data varies per instance); they
        # instead evaluate once per solve in _initial_state and reuse the
        # value carried in Factor (form_factor).
        x0j = jnp.asarray(nlp.x0, self.dtype)
        cjac = getattr(nlp.spec, "constant_jac", False)
        chess = getattr(nlp.spec, "constant_hess", False)
        if getattr(self, "_skip_const_fold", False):
            # matrix-free structured kernels never materialize J/H, even
            # as folded constants (BandedKernel matrix_free mode)
            cjac = chess = False
        # declared-zero Hessian (NLPSpec.zero_hess — LPs): no (n, n) H is
        # evaluated, stored or multiplied anywhere (schur path only; the
        # symmetric paths block H into K and keep the materialized form)
        self._H_zero = (getattr(nlp.spec, "zero_hess", False)
                        and pars.kkt.kkt_solver_type == "schur")
        if self._H_zero:
            chess = False
        self._param_const_jac = cjac and nlp.parametric
        self._param_const_hess = chess and nlp.parametric
        self._Jc_const = (nlp.jac_orig(x0j)
                          if cjac and not nlp.parametric else None)
        self._H_const = (nlp.lag_hess(x0j, jnp.zeros(m, self.dtype))
                         if chess and not nlp.parametric else None)

        # clever_symmetric: parallel-row groups detected once at the initial
        # point (reference initialize!, clever_symmetric.jl:54-62) via the
        # native structure library
        self.kkt_type = pars.kkt.kkt_solver_type
        if self.kkt_type == "clever_symmetric":
            from ..native import detect_parallel_rows
            x_init = self.project_bounds(jnp.asarray(nlp.x0, self.dtype))
            Jcan0 = np.asarray(nlp.jac_canonical(nlp.jac_orig(x_init)))
            group_id, ratio, _ = detect_parallel_rows(Jcan0)
            roots = np.unique(group_id)
            root_pos = {r: i for i, r in enumerate(roots)}
            self.clever_roots = roots                      # (mr,)
            self.clever_row2group = np.asarray(
                [root_pos[g] for g in group_id], dtype=np.int32)   # (m,)
            self.clever_ratio = jnp.asarray(ratio, self.dtype)     # (m,)
            self.mr = len(roots)
        else:
            self.mr = m

        # HBM: for the dense schur path the carried state does NOT store Q.
        # Q is cheap to rebuild from the J/H at the factor point (one fused
        # jtdj), and carrying it doubles the double-buffered factor-state
        # footprint under lax.while_loop — the n=2048/batch=64 invchol OOM
        # (VERDICT r3 item 3).  The freshly-formed Q is used as a temporary
        # for the factor search; the stored Factor gets a (0,0) placeholder
        # and the rare re-factor branches rebuild via _fact_q.  Structured
        # subclasses (Chain/Banded/Scenario) keep their own Q representation.
        self._q_store_placeholder = (
            self.kkt_type == "schur"
            and type(self).form_factor is OnePhaseKernel.form_factor
            and type(self).factor is OnePhaseKernel.factor)

        self.run_chunk = jax.jit(self._run_chunk)
        self.initial_state_from = jax.jit(self._initial_state)

    def initial_state(self):
        return self.initial_state_from(jnp.asarray(self.nlp.x0, self.dtype))

    # ==================================================================
    # residual / merit evaluations (reference: src/utils/eval.jl)
    # ==================================================================
    def grad_lag(self, cache: Cache, y_unused, mu):
        """∇L(x, y, mu) = g - J^T y + mu * theta * J^T 1 (eval.jl:136-142)."""
        th = self.pars.a_norm_penalty
        return cache.g - cache.jt_y + mu * th * cache.jt_ones

    def dual_scale(self, y, s=None):
        """(IPM_tools.jl:8-22), default :max_dual mode.

        `s` (slacks of the same iterate) is only consumed by the
        :primal_dual mode (IPM_tools.jl:17-18); other modes ignore it.
        """
        mode = self.pars.term.dual_scale_mode
        thr = self.pars.term.dual_scale_threshold
        ninf = _norm_inf(y)
        if mode == "max_dual":
            return thr / jnp.maximum(ninf, thr)
        if mode == "ipopt":
            return thr / jnp.maximum(jnp.mean(y), thr)
        if mode == "sqrt":
            return thr / jnp.maximum(jnp.sqrt(ninf), thr)
        if mode == "exact":
            return jnp.asarray(1.0, self.dtype)
        if mode == "primal_dual":
            if s is None:
                raise ValueError("primal_dual dual scale needs slacks")
            return thr / jnp.maximum(jnp.sqrt(ninf * _norm_inf(s)), thr)
        raise ValueError(f"dual_scale_mode {mode}")

    def comp(self, p: Point):
        return p.s * p.y - p.mu

    def is_feasible(self, p: Point, comp_feas):
        """Interior invariant (IPM_tools.jl:51-64). NaN-safe (False on NaN)."""
        sy = p.s * p.y
        ok = (jnp.all(p.s > 0.0) & jnp.all(p.y > 0.0)
              & (jnp.max(sy) / p.mu <= 1.0 / comp_feas)
              & (jnp.min(sy) / p.mu >= comp_feas))
        finite = jnp.isfinite(p.mu) & ~_isbad(p.s) & ~_isbad(p.y) & ~_isbad(p.x)
        return ok & finite

    def eval_phi(self, p: Point, cache: Cache, mu):
        """Shifted log barrier phi_mu (eval.jl:118-124)."""
        th = self.pars.a_norm_penalty
        safe_s = jnp.where(p.s > 0.0, p.s, 1.0)
        val = cache.fval - mu * jnp.sum(jnp.log(safe_s)) + mu * th * jnp.sum(cache.a)
        return jnp.where(jnp.all(p.s > 0.0), val, jnp.inf)

    def eval_merit(self, p: Point, cache: Cache):
        """phi + ||comp||_inf^3 / mu^2, Inf outside interior (eval.jl:172-184)."""
        pen = _norm_inf(self.comp(p)) ** 3 / p.mu ** 2
        val = self.eval_phi(p, cache, p.mu) + pen
        return jnp.where(self.is_feasible(p, self.pars.ls.comp_feas), val, jnp.inf)

    def merit_diff(self, p, cache, pc: Point, cc: Cache):
        """eval_merit_function_difference (eval.jl:192-208): uses candidate mu
        for the phi terms and current mu^2 for the comp penalty."""
        mu_c = pc.mu
        th = self.pars.a_norm_penalty
        fdiff = cc.fval - cache.fval
        rdiff = mu_c * th * (jnp.sum(cc.a) - jnp.sum(cache.a))
        safe = jnp.where((pc.s > 0) & (p.s > 0), pc.s / p.s, 1.0)
        logdiff = -mu_c * jnp.sum(jnp.log(safe))
        comp_pen = (_norm_inf(self.comp(pc)) ** 3 - _norm_inf(self.comp(p)) ** 3) / p.mu ** 2
        val = fdiff + rdiff + logdiff + comp_pen
        feas = self.is_feasible(pc, self.pars.ls.comp_feas) & jnp.all(pc.s > 0)
        return jnp.where(feas, val, jnp.inf)

    def scaled_dual_feas(self, p: Point, cache: Cache, mu):
        return _norm_inf(self.grad_lag(cache, p.y, mu)) * self.dual_scale(p.y, p.s)

    def kkt_err(self, p: Point, cache: Cache):
        """scaled_dual_feas + ||comp||_inf (eval.jl:274-277)."""
        return self.scaled_dual_feas(p, cache, p.mu) + _norm_inf(self.comp(p))

    # ==================================================================
    # cache construction
    # ==================================================================
    def make_cache(self, x, y, bvals=None, pdata=None):
        nlp = self.nlp
        cons = nlp.c(x, pdata)
        a = nlp.a_of(x, cons, bvals)
        fval = nlp.f(x, pdata)
        g = nlp.grad_f(x, pdata)
        jt_y = nlp.jtprod(x, y, pdata)
        jt_ones = nlp.jtprod_ones(x, pdata)
        return Cache(fval=fval, cons=cons, a=a, g=g, jt_y=jt_y, jt_ones=jt_ones)

    # ==================================================================
    # linear algebra: factor + solve (reference: julia.jl:21-97 via CHOLMOD)
    # ==================================================================
    def factor(self, Q, delta, rescale=None, fact=None):
        """Factor the KKT matrix with perturbation delta on the x-diagonal;
        returns ((L, D), inertia_ok).

        `rescale` (clever-symmetric only): Q is the rescaled system R K R, so
        the delta shift on the x-diagonal becomes delta * r^2 — factoring
        R (K + delta E) R consistently.  (The reference instead writes the
        UNSCALED diagonal + delta into the scaled matrix,
        clever_symmetric.jl:505-517 — an inconsistency under :u_and_x; we
        keep the scaling exact, see PARITY.md.)

        Schur path: Cholesky of Q + delta*I; inertia == Cholesky success
        (reference: julia.jl:28-46 — CHOLMOD PosDefException => wrong
        inertia).  Dense LAPACK Cholesky "succeeds" on numerically singular
        matrices where sparse CHOLMOD throws (a pivot that rounds to ~eps
        instead of <= 0); a relative pivot tolerance reproduces the sparse
        behavior — reject when the smallest pivot is machine-noise relative
        to the largest, since the direction would be noise.

        Symmetric path: unpivoted LDL^T of the quasi-definite augmented
        system (delta added to the first n diagonal entries only,
        symmetric.jl:85-102); inertia from D's sign pattern must be (n, m)
        (julia.jl:70-90, linear_system_solvers.jl:48-91).
        """
        n, m = self.n, self.m
        if self.kkt_type in ("symmetric", "clever_symmetric"):
            mr = self.mr
            rx2 = jnp.ones(n, Q.dtype) if rescale is None else rescale[:n] ** 2
            shift = jnp.concatenate([delta * rx2, jnp.zeros(mr, Q.dtype)])
            Kd = Q + jnp.diag(shift)
            if self.pars.kkt.linear_solver_type == "eigh":
                # spectral backend: exact inertia from eigenvalue signs —
                # the robust-alternative role of the reference's MA97
                # (hsl.jl:28-51 inertia from info.num_neg)
                V, w = ldlt_mod.eigh_inertia(Kd)
                ok = ldlt_mod.inertia_status(w, n, mr)
                return (V, w), ok
            L, d = ldlt_mod.ldlt(Kd)
            ok = ldlt_mod.inertia_status(d, n, mr)
            return (L, d), ok
        Qd = Q + jnp.asarray(delta).astype(Q.dtype) * jnp.eye(n, dtype=Q.dtype)
        if self._fb_form_f32 and Q.dtype == jnp.float32:
            # f32-carried Q (kkt.fallback_form_f32): the f32 attempt
            # factors Qd directly; the fallback branch re-forms the EXACT
            # f64 Q from the stored f64 J/H — lazily, only when the pivot
            # screen rejects (lax.cond branches execute on demand for
            # unbatched solves).
            assert fact is not None, "fallback_form_f32 factor() needs fact"
            L32, ok32 = self._chol_ok(Qd, strict=True)

            def use32(_):
                return L32.astype(self.dtype), ok32

            def use64(_):
                Qhi = self.nlp.jtdj_fused(self._fact_jc(fact),
                                          fact.y_f / fact.s_f,
                                          self._fact_h(fact))
                Qhi = Qhi + (jnp.asarray(delta, self.dtype)
                             * jnp.eye(n, dtype=self.dtype))
                return self._chol_ok(Qhi)

            L, ok = lax.cond(ok32, use32, use64, None)
            return (L, jnp.ones(n, self.dtype)), ok
        if (self.pars.kkt.factor_precision == "f32_fallback"
                and Q.dtype == jnp.float64):
            # mixed-precision with codified fallback: try the f32 MXU
            # factorization; when its pivot check rejects (cond(Q) beyond
            # ~1/eps32 — e.g. the race to ||x|| -> 1/tol_unbounded for an
            # unboundedness certificate) redo that one factorization in
            # f64.  Both branches carry f64 L so the lax.cond is jittable.
            # NOTE under vmap the cond lowers to a select and BOTH branches
            # run for the whole batch; batched solves should prefer
            # factor_precision="f32" (pure) or "same".
            # strict=True: near the edge of f32's range the factorization
            # passes the plain pivot check but refinement against it
            # diverges (contraction ~ eps32*cond(Q) > 1); with an exact f64
            # fallback available, reject early with a safety margin.
            L32, ok32 = self._chol_ok(Qd.astype(jnp.float32), strict=True)

            def use32(_):
                return L32.astype(Q.dtype), ok32

            def use64(_):
                return self._chol_ok(Qd)

            L, ok = lax.cond(ok32, use32, use64, None)
            return (L, jnp.ones(n, Q.dtype)), ok
        L, ok = self._chol_ok(Qd)
        return (L, jnp.ones(n, Qd.dtype)), ok

    def _chol_ok(self, Qd, strict=False):
        """Cholesky + inertia/pivot screening in Qd's own dtype.

        The relative pivot tolerance scales with machine epsilon OF THE
        FACTOR dtype: reject factorizations with cond(Q) beyond what that
        dtype can solve (~1e15 in f64, ~3e6 in f32).  Mirrors sparse
        CHOLMOD's PosDefException semantics (julia.jl:28-46) for dense
        LAPACK, which "succeeds" on numerically singular matrices.
        `strict` adds a 64x margin so iterative refinement against the
        factor is guaranteed to contract, not merely the solve to exist.
        """
        n = Qd.shape[-1]
        eps = float(jnp.finfo(Qd.dtype).eps)
        tol = max(self.pars.kkt.chol_pivot_tol,
                  64.0 * eps if strict else eps / 2.0)
        if self.pars.kkt.linear_solver_type == "pallas":
            # blocked VMEM-resident factorization (ops/cholesky.py); under
            # vmap the custom-vmap rule swaps in the batch-vectorized kernel
            from ..ops.cholesky import chol_auto
            L, d, pok = chol_auto(Qd)
            finite = jnp.all(jnp.isfinite(d)) & pok
        else:
            L = jnp.linalg.cholesky(Qd)
            d = jnp.diagonal(L)
            finite = jnp.all(jnp.isfinite(d))
        pos = jnp.all(d > 0)
        rel_ok = jnp.min(d) ** 2 > tol * jnp.max(d) ** 2
        return L, finite & pos & rel_ok

    # ------------------------------------------------------------------
    # factor-point product hooks.  All consumers of the factorization-point
    # Jacobian/Hessian go through these, so (a) constant-structure problems
    # never carry per-instance copies of folded constants in the state
    # pytree (the batched n=2048 OOM fix: Factor stores (0,0) placeholders
    # and the compile-time constant is read here), and (b) structured
    # kernels (BandedKernel matrix-free mode) can substitute linearized
    # oracle products without any dense J/H existing at all.
    def _fact_jc(self, fact: Factor):
        return self._Jc_const if self._Jc_const is not None else fact.Jc

    def _fact_h(self, fact: Factor):
        if self._H_zero:
            return None         # declared-zero Hessian: no H exists
        return self._H_const if self._H_const is not None else fact.H

    def fact_jprod(self, fact: Factor, v):
        """Canonical J @ v at the factorization point."""
        if self._hi_pair_dir and self.nlp.m_orig > 0:
            from ..ops.refine import pair_matvec64
            jc_v = pair_matvec64(self._fact_jc(fact), v)
            return self.nlp.jprod_from(jc_v, v)
        return self.nlp.jprod_mat(self._fact_jc(fact), v)

    def fact_jtprod(self, fact: Factor, w):
        """Canonical J^T @ w at the factorization point."""
        if self._hi_pair_dir and self.nlp.m_orig > 0:
            from ..ops.refine import pair_matvec64_t
            wc, bnd = self.nlp.split_canonical(w)
            return pair_matvec64_t(self._fact_jc(fact), wc) + bnd
        return self.nlp.jtprod_mat(self._fact_jc(fact), w)

    def fact_hmul(self, fact: Factor, v):
        """Lagrangian-Hessian product H @ v at the factorization point."""
        if self._H_zero:
            return jnp.zeros_like(v)
        return self._fact_h(fact) @ v

    def _store_jc(self, Jc):
        """Value stored in Factor.Jc: a (0, 0) placeholder when the true
        Jacobian is a folded compile-time constant (constant_jac and not
        parametric) — carrying it per instance would duplicate it across
        the batch and the while-loop double buffer."""
        if self._Jc_const is not None:
            return jnp.zeros((0, 0), self.dtype)
        return Jc

    def _store_h(self, H):
        if self._H_zero or self._H_const is not None:
            return jnp.zeros((0, 0), self.dtype)
        return H

    def _store_q(self, Q):
        """Value stored in the carried Factor.Q: a (0, 0) placeholder on the
        dense schur path (Q is rebuilt on demand by _fact_q; see __init__)."""
        if self._q_store_placeholder:
            return jnp.zeros((0, 0), self.q_store_dtype)
        return Q

    def _fact_q(self, fact: Factor):
        """The Schur complement at the factorization point.  Rebuilds
        Q = H + J^T diag(y_f/s_f) J from the factor-point J/H when the
        carried Factor holds the placeholder (re-factor branches only:
        the LS-failure delta escalation, one_phase.jl:221-258)."""
        if not self._q_store_placeholder:
            return fact.Q
        return self._form_q(self._fact_jc(fact), self._fact_h(fact),
                            fact.y_f / fact.s_f)

    def _form_q(self, Jc, H, d):
        """Fused Q = H + J^T diag(d) J in the factor dtype (the 42.1% cost
        item, docs/one-phase.tex:901-912)."""
        use_pallas = self.pars.kkt.linear_solver_type == "pallas"
        mxu = (jnp.bfloat16 if self.pars.kkt.q_form_dtype == "bf16" else None)
        fdt = self.q_store_dtype
        if fdt != self.dtype:
            # pure mixed mode (kkt.factor_precision="f32"): form Q itself in
            # f32 — the factor is only a preconditioner; refine_solve's
            # residual uses the f64 H/Jc stored alongside.
            return self.nlp.jtdj_fused(Jc.astype(fdt), d.astype(fdt),
                                       H.astype(fdt), use_pallas=use_pallas,
                                       mxu_dtype=mxu)
        return self.nlp.jtdj_fused(Jc, d, H, use_pallas=use_pallas,
                                   mxu_dtype=mxu)

    def finalize_solver(self, L):
        """Turn a successful Cholesky factor into the solve operator.

        TPU-native design: for the `pallas`/`invchol` backends the operator
        is the explicit inverse M = L^-T L^-1 (ops/cholesky.py) so every
        backsolve — ~10 per outer iteration plus refinement passes
        (docs/one-phase.tex:908) — is a single MXU matvec instead of two
        latency-bound triangular solves.  Called once per accepted
        factorization; the delta-search attempts stay chol-only.
        """
        if self.kkt_type != "schur":
            return L
        lst = self.pars.kkt.linear_solver_type
        if self._precond_f32:
            # M is only ever a preconditioner (refinement supplies the
            # accuracy): build and carry it in f32 so the inverse gram and
            # every backsolve matvec run native instead of emulated f64.
            L = L.astype(jnp.float32)
        if lst == "pallas":
            from ..ops.cholesky import tri_inv_gram_auto
            return tri_inv_gram_auto(L)
        if lst == "invchol":
            from ..ops.cholesky import xla_chol_inv_from_L
            return xla_chol_inv_from_L(L)
        return L

    def chol_solve(self, L, b):
        """Apply the solve operator produced by factor+finalize_solver.
        Under factor_precision="f32" the solve runs in the factor dtype and
        the correction is cast back — the refinement loop supplies the
        missing accuracy."""
        out_dt = b.dtype
        b = b.astype(L.dtype)
        if self.pars.kkt.linear_solver_type in ("pallas", "invchol"):
            return (L @ b).astype(out_dt)  # L slot holds M = Q^-1
        z = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(
            L.T, z, lower=False).astype(out_dt)

    def sym_backsolve(self, fact: Factor, b):
        """Backsolve for the symmetric/clever augmented system: LDL^T by
        default, spectral (eigh) when linear_solver_type == "eigh"."""
        out_dt = b.dtype
        b = b.astype(fact.L.dtype)
        if self.pars.kkt.linear_solver_type == "eigh":
            return ldlt_mod.eigh_solve(fact.L, fact.D, b).astype(out_dt)
        return ldlt_mod.ldlt_solve(fact.L, fact.D, b).astype(out_dt)

    # ==================================================================
    # KKT system (reference: schur.jl)
    # ==================================================================
    def form_factor(self, p: Point, cache: Cache, prev: Factor,
                    pdata=None) -> Factor:
        """form_system!.

        Schur path (default): Q = H_L + J^T diag(y/s) J (schur.jl:47-62).
        Symmetric path: K = [[H_L, J^T], [J, -S/Y]] (symmetric.jl:35-53);
        `schur_diag` still carries the Schur diagonal for the tau test
        (compute_schur_diag, kkt_system_solver.jl:296-300).

        H uses shifted duals y + mu*theta (update_H!, Class_iterate.jl:279-311).
        """
        nlp = self.nlp
        y_eff = p.y + p.mu * self.pars.a_norm_penalty
        if self._H_zero:
            H = None            # declared-zero Hessian (LP): never built
        elif self._H_const is not None:
            H = self._H_const
        elif self._param_const_hess:
            H = prev.H          # evaluated once per solve in _initial_state
        else:
            H = nlp.lag_hess(p.x, y_eff, pdata)
        if self._Jc_const is not None:
            Jc = self._Jc_const
        elif self._param_const_jac:
            Jc = prev.Jc        # evaluated once per solve in _initial_state
        else:
            Jc = nlp.jac_orig(p.x, pdata)
        if self.kkt_type == "symmetric":
            Jcan = nlp.jac_canonical(Jc)
            K = jnp.block([[H, Jcan.T],
                           [Jcan, -jnp.diag(p.s / p.y)]])
            schur_diag = jnp.diagonal(H) + nlp.jtdj_diag(Jc, p.y / p.s)
            return Factor(Jc=self._store_jc(Jc), H=self._store_h(H), Q=K,
                          schur_diag=schur_diag,
                          L=prev.L, D=prev.D, delta=prev.delta,
                          s_f=p.s, y_f=p.y, ok=jnp.asarray(False))
        if self.kkt_type == "clever_symmetric":
            # merged-diagonal reduced system (clever_symmetric.jl:271-293,
            # form_system! :340-393): group_u = 1 / sum(ratio^2 / u)
            Jcan = nlp.jac_canonical(Jc)
            u = p.s / p.y
            seg = jnp.asarray(self.clever_row2group)
            u_inv_g = jax.ops.segment_sum(self.clever_ratio ** 2 / u, seg,
                                          num_segments=self.mr)
            group_u = 1.0 / u_inv_g
            J_root = Jcan[jnp.asarray(self.clever_roots)]
            K = jnp.block([[H, J_root.T],
                           [J_root, -jnp.diag(group_u)]])
            # diagonal system rescaling (kkt_system_rescale, create_diag_
            # rescale_*, clever_symmetric.jl:310-338): Q stores R K R
            rmode = self.pars.kkt.kkt_system_rescale
            if rmode == "none":
                r = None
            elif rmode == "u_only":
                r = jnp.concatenate([jnp.ones(self.n, K.dtype),
                                     p.mu / jnp.sqrt(group_u)])
            elif rmode == "u_and_x":
                r = jnp.concatenate(
                    [jnp.ones(self.n, K.dtype)
                     / jnp.sqrt(1.0 + _norm_inf(p.x)),
                     p.mu / jnp.sqrt(group_u)])
            else:
                raise ValueError(f"kkt_system_rescale {rmode}")
            if r is not None:
                K = r[:, None] * K * r[None, :]
            schur_diag = jnp.diagonal(H) + nlp.jtdj_diag(Jc, p.y / p.s)
            return Factor(Jc=self._store_jc(Jc), H=self._store_h(H), Q=K,
                          schur_diag=schur_diag,
                          L=prev.L, D=prev.D, delta=prev.delta,
                          s_f=p.s, y_f=p.y, ok=jnp.asarray(False), rescale=r)
        Q = self._form_q(Jc, H, p.y / p.s)
        return Factor(Jc=self._store_jc(Jc), H=self._store_h(H), Q=Q,
                      schur_diag=jnp.diagonal(Q).astype(self.dtype),
                      L=prev.L, D=prev.D, delta=prev.delta, s_f=p.s, y_f=p.y,
                      ok=jnp.asarray(False))

    def refine_solve(self, fact: Factor, schur_rhs):
        """Fixed-count iterative refinement (schur.jl:131-182).

        With `kkt.it_refine_highprec` the residual matvecs run in
        double-single arithmetic (ops/refine.py) — the TPU-native stand-in
        for the reference's f64/BigFloat accumulators (schur.jl:154-156).

        With `kkt.it_refine_adaptive` the pass count is driven by the
        residual itself: refine until ||res||_inf <= tol * ||rhs||_inf or
        it_refine_max passes — a bounded lax.while_loop, so it stays jittable
        and saves matvecs whenever the factorization is already accurate.
        """
        nlp = self.nlp
        S_vec = fact.y_f / fact.s_f
        if self.pars.kkt.it_refine_highprec:
            return self._refine_solve_hp(fact, schur_rhs, S_vec)

        def residual(dx):
            jac_res = self.fact_jtprod(fact, S_vec * self.fact_jprod(fact, dx))
            hess_res = self.fact_hmul(fact, dx) + fact.delta * dx
            return schur_rhs - (jac_res + hess_res)

        if not self.pars.kkt.it_refine_adaptive:
            dx = jnp.zeros_like(schur_rhs)
            res = schur_rhs
            for _ in range(self.pars.kkt.it_refine_num):
                dx = dx + self.chol_solve(fact.L, res)
                res = residual(dx)
            return dx

        tol = self.pars.kkt.it_refine_tol or 10.0 * float(
            jnp.finfo(self.dtype).eps)
        rhs_norm = _norm_inf(schur_rhs)

        def cond(c):
            dx, res, i = c
            return (i < self.pars.kkt.it_refine_max) & (
                _norm_inf(res) > tol * rhs_norm)

        def body(c):
            dx, res, i = c
            dx = dx + self.chol_solve(fact.L, res)
            return dx, residual(dx), i + 1

        dx, _, _ = lax.while_loop(
            cond, body,
            (jnp.zeros_like(schur_rhs), schur_rhs, jnp.asarray(0, jnp.int32)))
        return dx

    def _refine_solve_hp(self, fact: Factor, schur_rhs, S_vec):
        from ..ops import refine as dsr
        nlp = self.nlp
        if self._hi_pair:
            # f64 solve on TPU: the carry (dx, res) stays plain f64
            # (eps64 << the 1e-12 target), but the residual matvecs run as
            # f32 double-single pairs (~1e-13 relative) instead of
            # emulated f64 — the profile's dominant cost
            # (results/profile_econ_250.md: direction 3 x 143 ms of a
            # 524 ms outer).
            wc, bnd = nlp.split_canonical_sq(S_vec)
            diag_term = bnd + fact.delta

            def one_pass64(dx, res):
                dx = dx + self.chol_solve(fact.L, res)
                if nlp.m_orig > 0:
                    u = dsr.pair_matvec64(self._fact_jc(fact), dx)
                    w = dsr.pair_matvec64_t(self._fact_jc(fact), wc * u)
                else:
                    w = jnp.zeros_like(dx)
                h = self.fact_hmul(fact, dx)
                res = schur_rhs - (w + h + diag_term * dx)
                return dx, res

            tol = self.pars.kkt.it_refine_tol or 10.0 * float(
                jnp.finfo(self.dtype).eps)
            rhs_norm = _norm_inf(schur_rhs)
            if not self.pars.kkt.it_refine_adaptive:
                dx, res = jnp.zeros_like(schur_rhs), schur_rhs
                for _ in range(self.pars.kkt.it_refine_num):
                    dx, res = one_pass64(dx, res)
                return dx

            def cond(c):
                dx, res, i = c
                return (i < self.pars.kkt.it_refine_max) & (
                    _norm_inf(res) > tol * rhs_norm)

            def body(c):
                dx, res, i = c
                dx, res = one_pass64(dx, res)
                return dx, res, i + 1

            dx, _, _ = lax.while_loop(
                cond, body, (jnp.zeros_like(schur_rhs), schur_rhs,
                             jnp.asarray(0, jnp.int32)))
            return dx
        wc, bnd = nlp.split_canonical_sq(S_vec)
        diag_term = bnd + fact.delta          # bound rows of J^T D J + delta
        zeros = jnp.zeros_like(schur_rhs)

        def one_pass(dx_hi, dx_lo, res_hi, res_lo):
            e = self.chol_solve(fact.L, res_hi + res_lo)
            dx_hi, dx_lo = dsr.ds_add(dx_hi, dx_lo, e, jnp.zeros_like(e))
            # A dx = Jc^T (wc * (Jc dx)) + (bnd + delta) dx + H dx, all ds
            if nlp.m_orig > 0:
                u_hi, u_lo = dsr.ds_matvec(self._fact_jc(fact), dx_hi, dx_lo)
                v_hi, v_e = dsr.two_prod(wc, u_hi)
                v_lo = v_e + wc * u_lo
                w_hi, w_lo = dsr.ds_matvec(self._fact_jc(fact).T, v_hi,
                                           v_lo)
            else:
                w_hi, w_lo = zeros, zeros
            if self._H_zero:
                h_hi, h_lo = zeros, zeros
            else:
                h_hi, h_lo = dsr.ds_matvec(self._fact_h(fact), dx_hi, dx_lo)
            d_hi, d_e = dsr.two_prod(diag_term, dx_hi)
            d_lo = d_e + diag_term * dx_lo
            a_hi, a_lo = dsr.ds_add(w_hi, w_lo, h_hi, h_lo)
            a_hi, a_lo = dsr.ds_add(a_hi, a_lo, d_hi, d_lo)
            res_hi, res_lo = dsr.ds_add(schur_rhs, zeros, -a_hi, -a_lo)
            return dx_hi, dx_lo, res_hi, res_lo

        if not self.pars.kkt.it_refine_adaptive:
            dx_hi, dx_lo = zeros, zeros
            res_hi, res_lo = schur_rhs, zeros
            for _ in range(self.pars.kkt.it_refine_num):
                dx_hi, dx_lo, res_hi, res_lo = one_pass(dx_hi, dx_lo,
                                                        res_hi, res_lo)
            return dx_hi + dx_lo

        # adaptive + highprec: early-exit on the double-single residual.
        # Easy iterations pay ~1-2 passes; the ill-conditioned endgame
        # (where the f32 preconditioner's contraction is weakest and the
        # direction quality decides whether a certificate is reachable at
        # all) gets up to it_refine_max.  Measured on the n=512 dense
        # mixed pool on-chip: fixed-3 resolves 52/64 at f32, fixed-6
        # 63/64 at ~2x wall; adaptive-8 matches fixed-6 resolution at
        # near fixed-3 wall.
        tol = self.pars.kkt.it_refine_tol or 10.0 * float(
            jnp.finfo(self.dtype).eps)
        rhs_norm = _norm_inf(schur_rhs)

        def cond(c):
            dx_hi, dx_lo, res_hi, res_lo, i = c
            return (i < self.pars.kkt.it_refine_max) & (
                _norm_inf(res_hi + res_lo) > tol * rhs_norm)

        def body(c):
            dx_hi, dx_lo, res_hi, res_lo, i = c
            dx_hi, dx_lo, res_hi, res_lo = one_pass(dx_hi, dx_lo,
                                                    res_hi, res_lo)
            return dx_hi, dx_lo, res_hi, res_lo, i + 1

        dx_hi, dx_lo, _, _, _ = lax.while_loop(
            cond, body, (zeros, zeros, schur_rhs, zeros,
                         jnp.asarray(0, jnp.int32)))
        return dx_hi + dx_lo

    def build_rhs(self, p: Point, cache: Cache, eta_P, eta_D, eta_mu,
                  pdata=None):
        """System_rhs (system_rhs.jl:39-74)."""
        if self.pars.kkt.residual_precision == "f64":
            # mixed-precision Newton: the dual residual is where f32
            # cancellation noise floors convergence; one f64 oracle pass per
            # direction restores it (the residual itself is small, so the
            # f32 cast of the RESULT loses nothing).  Factorization and all
            # line-search work stay in the solve dtype.
            th = self.pars.a_norm_penalty
            gl = self.nlp.grad_lag_hi(
                p.x, p.y, (p.mu * eta_mu * th).astype(jnp.float64),
                pdata).astype(self.dtype)
        else:
            gl = self.grad_lag(cache, p.y, p.mu * eta_mu)
        dual_r = -(1.0 - eta_D) * gl
        primal_r = -(1.0 - eta_P) * (cache.a - p.s)
        comp_r = p.mu * eta_mu - p.s * p.y
        return dual_r, primal_r, comp_r

    def compute_direction(self, fact: Factor, p: Point, cache: Cache,
                          eta_P, eta_D, eta_mu,
                          pdata=None) -> Tuple[Dir, jnp.ndarray]:
        """compute_direction_implementation! (schur.jl:89-128) + KKT error."""
        nlp = self.nlp
        dual_r, primal_r, comp_r = self.build_rhs(p, cache, eta_P, eta_D,
                                                  eta_mu, pdata)
        y_f, s_f = fact.y_f, fact.s_f
        S_vec = y_f / s_f
        sym_primal = primal_r + comp_r / y_f
        if self.kkt_type == "clever_symmetric":
            # reduced joint solve + per-row dual reconstitution
            # (clever_symmetric.jl:425-493)
            u = s_f / y_f
            seg = jnp.asarray(self.clever_row2group)
            ratio = self.clever_ratio
            u_inv_g = jax.ops.segment_sum(ratio ** 2 / u, seg,
                                          num_segments=self.mr)
            group_u = 1.0 / u_inv_g
            g_row = group_u[seg] * ratio / u
            rhs_red = jax.ops.segment_sum(g_row * sym_primal, seg,
                                          num_segments=self.mr)
            rhs_full = jnp.concatenate([dual_r, rhs_red])
            # rescaled system (apply_rescale_to_rhs / unscale_directions,
            # clever_symmetric.jl:432-443,460): solve (RKR + delta*RER) w =
            # R rhs, then dir = R w
            rx2 = (jnp.ones(self.n, rhs_full.dtype) if fact.rescale is None
                   else fact.rescale[:self.n] ** 2)
            if fact.rescale is not None:
                rhs_full = rhs_full * fact.rescale
            shift = jnp.concatenate(
                [fact.delta * rx2,
                 jnp.zeros(self.mr, rhs_full.dtype)])

            def k_mv(v):
                return fact.Q @ v + shift * v

            sol = jnp.zeros_like(rhs_full)
            res = rhs_full
            for _ in range(self.pars.kkt.it_refine_num):
                sol = sol + self.sym_backsolve(fact, res)
                res = rhs_full - k_mv(sol)
            if fact.rescale is not None:
                sol = sol * fact.rescale
            dx = sol[:self.n]
            v = sol[self.n:]
            tmp = -(rhs_red + group_u * v)
            dy = sym_primal / u + (ratio / u) * tmp[seg]
            jdx = self.fact_jprod(fact, dx)
            ds = jdx - primal_r
        elif self.kkt_type == "symmetric":
            # joint solve (symmetric.jl:59-83): K [dx; -dy] = [dual_r; sym_p]
            # plus fixed-count refinement (the unpivoted LDL^T loses digits
            # the reference's pivoted CHOLMOD keeps; refinement restores them)
            rhs_full = jnp.concatenate([dual_r, sym_primal])
            shift = jnp.concatenate([jnp.full(self.n, fact.delta, rhs_full.dtype),
                                     jnp.zeros(self.m, rhs_full.dtype)])

            def k_mv(v):
                return fact.Q @ v + shift * v

            sol = jnp.zeros_like(rhs_full)
            res = rhs_full
            for _ in range(self.pars.kkt.it_refine_num):
                sol = sol + self.sym_backsolve(fact, res)
                res = rhs_full - k_mv(sol)
            dx = sol[:self.n]
            dy = -sol[self.n:]
            jdx = self.fact_jprod(fact, dx)
            ds = jdx - primal_r
        else:
            schur_rhs = dual_r + self.fact_jtprod(
                fact, primal_r * S_vec + comp_r / s_f)
            dx = self.refine_solve(fact, schur_rhs)
            jdx = self.fact_jprod(fact, dx)
            dy = -(jdx - sym_primal) * S_vec
            ds = jdx - primal_r
        dmu = -(1.0 - eta_mu) * p.mu
        dbeta = -(1.0 - eta_P) * p.beta
        direction = Dir(x=dx, y=dy, s=ds, mu=dmu, beta=dbeta)

        # a-posteriori KKT error ratio (kkt_system_solver.jl:49-96)
        pred_lag = (fact.delta * dx + self.fact_hmul(fact, dx)
                    - self.fact_jtprod(fact, dy))
        err_D = pred_lag - dual_r
        err_P = jdx - ds - primal_r
        err_mu = s_f * dy + y_f * ds - comp_r
        overall = _norm_inf(jnp.concatenate([err_D, err_P, err_mu]))
        rhs_norm = _norm_inf(jnp.concatenate([dual_r, primal_r, comp_r]))
        ratio = overall / rhs_norm
        return direction, ratio

    # ==================================================================
    # delta / inertia strategy (reference: delta_strategy.jl:37-121)
    # ==================================================================
    def ipopt_strategy(self, fact: Factor, iter_delta):
        """Returns (success, num_fac, new_delta, (L, D))."""
        pars = self.pars
        DELTA_MIN = pars.delta.min
        DELTA_MAX = self.delta_max
        dt = self.dtype

        tau = 1.5 * jnp.min(fact.schur_diag)
        try_zero = tau > 0.0

        def do_zero(_):
            LD0, ok0 = self.factor(fact.Q, jnp.asarray(pars.delta.zero, dt),
                                   fact.rescale, fact=fact)
            if pars.output_level >= 4:
                jax.debug.print(
                    "  dsearch zero-try: inertia_ok={ok}", ok=ok0)
            return LD0, ok0, jnp.asarray(1, jnp.int32)

        def no_zero(_):
            # stale-factor placeholder; fact.L carries the FINALIZED M,
            # which under kkt.precond_f32 is f32 — cast to the raw-factor
            # dtype so both cond branches agree (the value is only ever
            # used if every subsequent factorization attempt fails).
            # fact.L is a pytree for structured kernels (block factors),
            # so cast leaf-wise, floats only.
            L_cast = jax.tree_util.tree_map(
                lambda a: a.astype(self.factor_store_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, fact.L)
            return ((L_cast, fact.D),
                    jnp.asarray(False), jnp.asarray(0, jnp.int32))

        LD, ok0, nfac = lax.cond(try_zero, do_zero, no_zero, None)
        tau_eff = jnp.where(try_zero, 0.0, tau)

        delta_first = jnp.where(
            iter_delta != 0.0,
            jnp.maximum(DELTA_MIN - tau_eff, iter_delta * pars.delta.dec),
            pars.delta.start - tau_eff)

        def cond(c):
            delta, LD, ok, nfac, i = c
            return (~ok) & (i < pars.delta.max_it) & (delta <= DELTA_MAX)

        def body(c):
            delta, LD, ok, nfac, i = c
            LDc, okc = self.factor(fact.Q, delta, fact.rescale, fact=fact)
            if pars.output_level >= 4:
                # delta-search trace (delta_strategy.jl:70-76)
                jax.debug.print(
                    "  dsearch fac {i}: delta={d:.2e} inertia_ok={ok}",
                    i=nfac + 1, d=delta, ok=okc)
            # keep stale factor on failure (matches the Julia object semantics:
            # a thrown PosDefException leaves the previous factor in place)
            LD = jax.tree_util.tree_map(
                lambda new, old: jnp.where(okc, new, old), LDc, LD)
            next_delta = jnp.where(okc, delta, delta * pars.delta.inc)
            return (next_delta, LD, okc, nfac + 1, i + 1)

        init = (delta_first, LD, ok0, nfac, jnp.asarray(0, jnp.int32))
        delta, LD, ok, nfac, _ = lax.while_loop(cond, body, init)

        # zero-delta attempt succeeded -> loop never ran -> delta is delta.zero
        final_delta = jnp.where(ok0, jnp.asarray(pars.delta.zero, dt), delta)
        return ok, nfac, final_delta, LD

    # ==================================================================
    # fraction-to-boundary helpers (reference: frac_boundary.jl)
    # ==================================================================
    def lb_s_thres(self, s, dx):
        ex = self.pars.ls.fraction_to_boundary_predict_exp
        nx = _norm_inf(dx)
        return jnp.minimum(s, nx * nx ** ex)

    def lb_s_predict(self, s, dx):
        return self.frac_bd_predict * self.lb_s_thres(s, dx)

    def lb_s(self, s, dx):
        return self.frac_bd * self.lb_s_thres(s, dx)

    def lb_y(self, y, dx):
        return self.frac_bd * y * jnp.minimum(1.0, _norm_inf(dx))

    @staticmethod
    def simple_max_step(val, d, lb):
        gap = val - lb
        r = jnp.where(gap > 0, -d / jnp.where(gap > 0, gap, 1.0), jnp.inf)
        ratio = jnp.maximum(1.0, jnp.max(r) if r.size else 0.0)
        return 1.0 / ratio

    # ==================================================================
    # dual step machinery (reference: move.jl)
    # ==================================================================
    def dual_bounds(self, s_new, mu_new, y, dy):
        """Interval [lb, ub] of dual step sizes keeping s.y/mu in
        [comp_feas, 1/comp_feas] (move.jl:25-79), safety factor 1.001."""
        cf = self.pars.ls.comp_feas
        sf = 1.001
        dy_safe = jnp.where(dy == 0, 1.0, dy)
        ub_dyi = (mu_new / (cf * s_new) - y) / dy_safe
        lb_dyi = (mu_new * cf / s_new - y) / dy_safe
        pos = dy > 0
        neg = dy < 0
        lo_c = jnp.where(pos, lb_dyi * sf, jnp.where(neg, ub_dyi * sf, -jnp.inf))
        hi_c = jnp.where(pos, ub_dyi / sf, jnp.where(neg, lb_dyi / sf, jnp.inf))
        zero_bad = (dy == 0) & ((mu_new * cf / s_new - y >= 0.0)
                                | (mu_new / (cf * s_new) - y <= 0.0))
        lb = jnp.maximum(0.0, jnp.max(lo_c))
        ub = jnp.minimum(1.0, jnp.min(hi_c))
        bad = jnp.any(zero_bad) | ~jnp.isfinite(lb) | ~jnp.isfinite(ub)
        lb = jnp.where(bad, 0.0, lb)
        ub = jnp.where(bad, -1.0, ub)
        return lb, ub

    def _trial_tail(self, st, direction, be_agg, alpha, x_new, cons_new,
                    pull, a_new, beta_new, s_new, mu_new, nan_move, lb_y_vec,
                    predict_red):
        """Dual step + acceptance for one line-search trial whose slack
        fraction-to-boundary check already passed (called under lax.cond from
        line_search.trial; reference: line_search.jl:100-126 + move.jl:81-133
        + the acceptance rules of stable/agg/filter/kkt_ls.jl).

        `predict_red` is the stabilization-mode predicted reduction: the
        filter-LS form for ls_mode_stable in (accept_filter, accept_comp),
        the merit_function_predicted_reduction form for accept_stable /
        accept_kkt (see line_search)."""
        nlp = self.nlp
        pars = self.pars
        p, cache = st.p, st.cache
        dt = self.dtype
        s_ok = jnp.asarray(True)

        # --- dual bounds (line_search.jl:100-118) ----------------
        lb, ub = self.dual_bounds(s_new, mu_new, p.y, direction.y)
        ub = jnp.minimum(ub, self.simple_max_step(p.y, direction.y, lb_y_vec))
        dual_ok = lb < ub
        if not pars.ls.move_primal_seperate_to_dual:
            # coupled primal/dual steps: the primal step size itself must lie
            # in the dual-feasible interval (line_search.jl:100-104)
            dual_ok = dual_ok & (lb <= alpha) & (alpha <= ub)

        # --- move_dual (move.jl:81-133), dual_ls default 1 -------
        g_new = nlp.grad_f(x_new, st.pdata)

        def jt(w):
            wc, bnd = nlp.split_canonical(w)
            if pull is not None:
                return pull(wc)[0] + bnd
            return bnd

        jt_y_old = jt(p.y)
        jt_dy = jt(direction.y)
        jt_ones_new = (nlp.jtprod_ones(x_new, st.pdata)
                       if nlp.m_orig > 0 else nlp._bnd_ones)
        th = pars.a_norm_penalty
        dual_res = g_new - jt_y_old + mu_new * th * jt_ones_new
        comp_new_old_y = s_new * p.y - mu_new
        # dual_scale of the candidate iterate: y unchanged yet, s already moved
        scale = self.dual_scale(p.y, s_new)
        small_step = jnp.maximum(lb, jnp.minimum(ub, alpha))
        if pars.ls.dual_ls in (1, 3):
            # least-squares dual step (move.jl:100-117); dual_ls=3 adds
            # the proximal term delta*dx*alpha to the dual residual
            qv = jnp.concatenate([scale * jt_dy, scale * s_new * direction.y])
            prox = dual_res
            if pars.ls.dual_ls == 3:
                prox = dual_res + st.delta * direction.x * alpha
            res = jnp.concatenate([scale * prox, -scale * comp_new_old_y])
            denom = jnp.sum(qv * qv)
            alpha_D = jnp.where(denom > 0, jnp.sum(res * qv) / denom, ub)
            alpha_D = jnp.clip(alpha_D, small_step, ub)
        elif pars.ls.dual_ls == 2:
            # try full step ub vs small_step, keep ub if it cuts the kkt
            # error by kkt_reduction_factor (move.jl:84-99)
            comp_term = jnp.max(jnp.abs(comp_new_old_y))
            initial_err = (jnp.max(jnp.abs(dual_res)) * scale + comp_term)
            y_big = p.y + ub * direction.y
            big_err = (jnp.max(jnp.abs(dual_res - ub * jt_dy))
                       * self.dual_scale(y_big, s_new)
                       + jnp.max(jnp.abs(s_new * y_big - mu_new)))
            take_big = big_err < initial_err * (1.0 - pars.ls.kkt_reduction_factor)
            alpha_D = jnp.where(take_big, ub, small_step)
        else:  # dual_ls == 0
            alpha_D = ub
        y_new = p.y + direction.y * alpha_D
        cand_p = Point(x=x_new, y=y_new, s=s_new, mu=mu_new, beta=beta_new)
        feas_after = self.is_feasible(cand_p, pars.ls.comp_feas)

        # --- candidate cache -------------------------------------
        jt_y_new = jt_y_old + alpha_D * jt_dy
        fval_new = nlp.f(x_new, st.pdata)
        cand_c = Cache(fval=fval_new, cons=cons_new, a=a_new, g=g_new,
                       jt_y=jt_y_new, jt_ones=jt_ones_new)
        nan_any = nan_move | _isbad(g_new) | _isbad(fval_new)

        # --- acceptance ------------------------------------------
        ls_mode = pars.ls.ls_mode_stable
        # stable part (accept_func_stable!, stable_ls.jl:34-64)
        actual_red = self.merit_diff(p, cache, cand_p, cand_c)
        frac = actual_red / (predict_red * alpha)
        stable_ok = ((predict_red < 0.0) & (actual_red <= 0.0)
                     & (frac > pars.ls.predict_reduction_factor))
        if ls_mode in ("accept_filter", "accept_kkt"):
            # filter acceptance (accept_func_kkt!, satisfies_filter!)
            cand_merit = self.eval_merit(cand_p, cand_c)
            cand_kkt = _norm_inf(self.grad_lag(cand_c, y_new, mu_new))
            if pars.ls.kkt_include_comp:
                cand_kkt = cand_kkt + _norm_inf(self.comp(cand_p))
            cand_kkt = cand_kkt * self.dual_scale(y_new, s_new)
            filt = st.filt
            idx = jnp.arange(self.filt_cap)
            live = idx < filt.count
            kkt_red = cand_kkt / filt.kkt < (1.0 - pars.ls.kkt_reduction_factor * alpha)
            fval_no_inc = cand_merit < filt.merit + jnp.sqrt(cand_kkt)
            beta_dec = cand_p.beta < filt.beta
            if pars.ls.filter_type == "test2":
                entry_ok = beta_dec | (kkt_red & fval_no_inc)
            elif pars.ls.filter_type == "default":
                entry_ok = beta_dec | kkt_red
            elif pars.ls.filter_type == "test1":
                fval_red = cand_merit < filt.merit - cand_kkt ** 2
                entry_ok = beta_dec | kkt_red | fval_red
            else:  # test3
                net = cand_kkt + cand_merit < filt.merit + filt.kkt - cand_kkt ** 2
                entry_ok = beta_dec | net
            filter_ok = jnp.all(entry_ok | ~live)
        if ls_mode == "accept_filter":
            # stable-then-filter chain (accept_func!, filter_ls.jl:107-115)
            stb_accept = stable_ok | filter_ok
        elif ls_mode == "accept_stable":
            # Armijo on predicted merit reduction only (stable_ls.jl:34-64)
            stb_accept = stable_ok
        elif ls_mode == "accept_kkt":
            # filter-only acceptance (accept_func_kkt!, kkt_ls.jl:33-40)
            stb_accept = filter_ok
        elif ls_mode == "accept_comp":
            # predicted-complementarity accuracy (basic_checks,
            # line_search.jl:26-34): ||comp_predicted(alpha)||_inf < 50 mu
            comp_pred = (p.s * p.y
                         + alpha * (direction.y * p.s + direction.s * p.y)
                         - mu_new)
            stb_accept = _norm_inf(comp_pred) < 50.0 * p.mu
        else:
            raise ValueError(f"ls_mode_stable {ls_mode}")

        # f32-endgame precision guard (config.py ls.precision_guard): when
        # the predicted merit reduction is below the dtype's merit
        # resolution, the Armijo/filter comparisons are pure rounding noise
        # — accept instead on non-increase of the scaled KKT error (grad_lag
        # differences stay resolvable; merit differences do not).
        pg = pars.ls.precision_guard
        if pg == "on" or (pg == "auto" and self.dtype != jnp.float64):
            eps_dt = jnp.asarray(jnp.finfo(self.dtype).eps, self.dtype)
            cur_merit_pg = self.eval_merit(p, cache)
            noise = (pars.ls.precision_guard_factor * eps_dt
                     * (1.0 + jnp.abs(cur_merit_pg)))
            below_noise = jnp.abs(predict_red) * alpha < noise
            kkt_cur = _norm_inf(self.grad_lag(cache, p.y, p.mu))
            kkt_cand_pg = _norm_inf(self.grad_lag(cand_c, y_new, mu_new))
            if pars.ls.kkt_include_comp:
                kkt_cur = kkt_cur + _norm_inf(self.comp(p))
                kkt_cand_pg = kkt_cand_pg + _norm_inf(self.comp(cand_p))
            guard_ok = below_noise & (kkt_cand_pg <= kkt_cur * (1.0 + 1e-3))
            stb_accept = stb_accept | guard_ok

        # aggressive acceptance (agg_ls.jl:36-48)
        sdf_cand = self.scaled_dual_feas(cand_p, cand_c, mu_new)
        apf = pars.agg_protection_factor
        tau = mu_new / (sdf_cand * (1.0 - apf))
        agg_accept = (mu_new / p.mu >= 1.0 - apf) | (tau >= 1.0)
        agg_suggest = jnp.maximum(apf ** 2, alpha * tau ** 2)

        accept = jnp.where(be_agg, agg_accept, stb_accept)
        accept = accept & s_ok & dual_ok & feas_after & ~nan_any

        status = jnp.where(
            accept, LS_SUCCESS,
            jnp.where(nan_any, LS_NAN_ERR,
                      jnp.where(~s_ok, LS_S_BOUND,
                                jnp.where(~dual_ok | ~feas_after,
                                          LS_DUAL_INFEASIBLE,
                                          LS_NOT_ENOUGH_PROGRESS))))
        bt = alpha * pars.ls.backtracking_factor
        suggested = jnp.where(be_agg & (status == LS_NOT_ENOUGH_PROGRESS),
                              agg_suggest, bt)
        return (status.astype(jnp.int32), suggested.astype(dt),
                cand_p, cand_c, alpha_D.astype(dt))


    # ==================================================================
    # line search (reference: line_search.jl:36-199)
    # ==================================================================
    def line_search(self, st: State, direction: Dir, be_agg, min_step_size):
        """Backtracking LS with nonlinear slack update and dual LS.

        Returns (accepted: bool, new Point, new Cache, LSInfo).
        """
        nlp = self.nlp
        pars = self.pars
        p, cache = st.p, st.cache
        dt = self.dtype

        lb_sp = self.lb_s_predict(p.s, direction.x)
        alpha0 = self.simple_max_step(p.s, direction.s, lb_sp)
        lb_s_vec = self.lb_s(p.s, direction.x)
        lb_y_vec = self.lb_y(p.y, direction.x)

        # --- do_ls preconditions -------------------------------------
        # filter/stable (Class_filter_ls, filter_ls.jl:14-42):
        #   grad phi = grad_lag with y_tilde = mu/s
        jt_mus = nlp.jtprod(p.x, p.mu / p.s, st.pdata)
        grad_phi = cache.g - jt_mus + p.mu * pars.a_norm_penalty * cache.jt_ones
        gdx = jnp.dot(grad_phi, direction.x)
        ls_mode = pars.ls.ls_mode_stable
        comp_merit = _norm_inf(self.comp(p)) ** 3 / p.mu ** 2
        if ls_mode in ("accept_stable", "accept_kkt"):
            # merit_function_predicted_reduction(iter, dir, 1.0)
            # (eval.jl:236-273 + phi_predicted_reduction_primal_dual):
            # gdx + 0.5 (dx^T H dx + sum (J dx)^2 y/s) + comp-penalty diff
            jdx_c = nlp.jprod(p.x, direction.x, st.pdata)
            j_gain = jnp.dot(jdx_c ** 2, p.y / p.s)
            hdx = self.fact_hmul(st.fact, direction.x)
            phi_red = gdx + 0.5 * (jnp.dot(direction.x, hdx) + j_gain)
            comp_pred1 = (p.s * p.y + direction.y * p.s + direction.s * p.y
                          - (p.mu + direction.mu))
            predict_red = phi_red + (_norm_inf(comp_pred1) ** 3
                                     - _norm_inf(self.comp(p)) ** 3) / p.mu ** 2
        else:
            # filter-LS form (Class_filter_ls, filter_ls.jl:22-23)
            predict_red = (-comp_merit
                           + 0.5 * (gdx - st.delta * jnp.sum(direction.x ** 2)))
        if ls_mode == "accept_filter":
            do_ls_stb = gdx < 0.0          # sufficient_descent, filter_ls.jl:27
        elif ls_mode == "accept_stable":
            # NOTE the reference's Class_stable_ls sets do_ls =
            # predict_red >= 0 (stable_ls.jl:21) while its acceptance needs
            # predict_red < 0 — the combination can never accept.  We use the
            # working sign (see PARITY.md).
            do_ls_stb = predict_red < 0.0
        else:
            # accept_kkt / accept_comp: no descent precondition — the
            # acceptance rule itself filters (kkt_ls.jl:18 sets do_ls from
            # predict_red but never consumes it)
            do_ls_stb = jnp.asarray(True)

        # aggressive (Class_agg_ls, agg_ls.jl:9-33)
        eta_probe = -direction.mu / p.mu
        gam = 1.0 - eta_probe
        r_P = cache.a - p.s
        y_tilde = (gam * p.mu - eta_probe * p.y * r_P) / p.s
        jt_yt = nlp.jtprod(p.x, y_tilde, st.pdata)
        grad_lag_t = cache.g - jt_yt + p.mu * gam * pars.a_norm_penalty * cache.jt_ones
        do_ls_agg = jnp.dot(grad_lag_t, direction.x) < 0.0

        do_ls = jnp.where(be_agg, do_ls_agg, do_ls_stb)
        # NaN direction: the reference errors (check_for_nan); we treat it as
        # a failed step so the delta-escalation loop recovers.
        dir_bad = _isbad(direction.x) | _isbad(direction.y) | _isbad(direction.s)
        do_ls = do_ls & ~dir_bad

        # carry: (alpha, i, status, alpha_D, cand_point, cand_cache)
        zero_pt = p
        zero_cache = cache

        def trial(alpha):
            """One backtracking trial. Returns (trial_status, suggested_alpha,
            cand_point, cand_cache, alpha_D)."""
            x_new = p.x + direction.x * alpha
            # --- move_primal (move.jl:2-22) --------------------------
            if nlp.m_orig > 0:
                cons_new, pull = jax.vjp(
                    lambda xx: nlp.c(xx, st.pdata), x_new)
            else:
                cons_new = jnp.zeros((0,), dt)
                pull = None
            a_new = nlp.a_of(x_new, cons_new, st.bvals)
            beta_new = p.beta + direction.beta * alpha
            s_new = a_new - beta_new * st.r0
            mu_new = p.mu + direction.mu * alpha
            nan_move = _isbad(a_new)
            s_ok = jnp.all(s_new >= lb_s_vec) & ~nan_move

            # slack check failed: reject without evaluating the remaining
            # oracles (grad_f, f, J^T products) — the reference pays a
            # constraint eval per trial but defers the rest the same way
            # (move.jl:6-8, line_search.jl:100-126); here the skip is a
            # lax.cond so the whole dual/acceptance block drops out of the
            # trace on the (common) slack-bound backtracks.
            def reject_slack(_):
                status = jnp.where(nan_move, LS_NAN_ERR, LS_S_BOUND)
                return (status.astype(jnp.int32),
                        (alpha * pars.ls.backtracking_factor).astype(dt),
                        zero_pt, zero_cache, jnp.asarray(0.0, dt))

            def eval_trial(_):
                return self._trial_tail(
                    st, direction, be_agg, alpha, x_new, cons_new, pull,
                    a_new, beta_new, s_new, mu_new, nan_move, lb_y_vec,
                    predict_red)

            return lax.cond(s_ok, eval_trial, reject_slack, None)

        def cond(c):
            alpha, i, status, alpha_D, _, _ = c
            running = (status != LS_SUCCESS) & (status != LS_MIN_ALPHA)
            return running & (i < pars.ls.num_backtracks)

        def body(c):
            alpha, i, status, alpha_D, cp, cc = c
            below = alpha < min_step_size

            def run(_):
                tstat, sugg, tp, tc, aD = trial(alpha)
                if pars.output_level >= 5:
                    # per-trial LS trace (line_search.jl:143-153)
                    jax.debug.print(
                        "    ls trial {i}: alpha_P={a:.2e} alpha_D={d:.2e} "
                        "status={s}", i=i + 1, a=alpha, d=aD, s=tstat)
                # keep the ACCEPTED alpha on success (the reference reports
                # step_size_P of the accepted trial, not the next backtrack)
                next_alpha = jnp.where(tstat == LS_SUCCESS, alpha, sugg)
                return (next_alpha, i + 1, tstat, aD, tp, tc)

            def stop(_):
                return (alpha, i, jnp.asarray(LS_MIN_ALPHA, jnp.int32), alpha_D, cp, cc)

            return lax.cond(below, stop, run, None)

        init = (jnp.asarray(alpha0, dt), jnp.asarray(0, jnp.int32),
                jnp.asarray(LS_NONE, jnp.int32), jnp.asarray(0.0, dt),
                zero_pt, zero_cache)

        def no_ls(_):
            a, i, stt, aD, cp, cc = init
            return (a, i, jnp.asarray(LS_PREDICT_RED_NON_NEG, jnp.int32), aD, cp, cc)

        def do_search(_):
            out = lax.while_loop(cond, body, init)
            alpha, i, status, aD, cp, cc = out
            status = jnp.where((status != LS_SUCCESS) & (status != LS_MIN_ALPHA)
                               & (status != LS_PREDICT_RED_NON_NEG),
                               LS_MAX_LS_IT, status)
            return (alpha, i, status, aD, cp, cc)

        alpha, nsteps, status, alpha_D, cand_p, cand_c = lax.cond(
            do_ls, do_search, no_ls, None)

        accepted = status == LS_SUCCESS
        info = LSInfo(status=status, alpha_P=alpha, alpha_D=alpha_D,
                      num_steps=nsteps)
        return accepted, cand_p, cand_c, info

    # ==================================================================
    # take_step (reference: take_step.jl:34-75 + probe :2-17)
    # ==================================================================
    def take_step(self, st: State, be_agg):
        """One direction + line search. Returns (accepted, new_p, new_c,
        LSInfo, Dir, kkt_ratio, eta(3,))."""
        pars = self.pars
        p, cache = st.p, st.cache
        dt = self.dtype

        def agg_factors(_):
            # Mehrotra probe: affine direction, max sigma step
            adir, _ = self.compute_direction(st.fact, p, cache, 0.0, 0.0,
                                             0.0, st.pdata)
            lb_sp = self.lb_s_predict(p.s, adir.x)
            a_s = self.simple_max_step(p.s, adir.s, lb_sp)
            a_y = self.simple_max_step(p.y, adir.y, jnp.zeros_like(p.y))
            sigma = jnp.minimum(a_s, a_y)
            gamma = jnp.minimum(0.5, (1.0 - sigma) ** 2)
            if pars.ls.agg_gamma == "mehrotra":
                e = jnp.stack([gamma, gamma, gamma])
            elif pars.ls.agg_gamma == "mehrotra_stb":
                e = jnp.stack([gamma, jnp.asarray(0.0, dt), gamma])
            elif pars.ls.agg_gamma == "affine":
                e = jnp.zeros(3, dt)
            else:  # constant
                e = jnp.asarray([0.2, 0.0, 0.2], dt)
            r_P = cache.a - p.s
            ms = pars.ls.min_step_size_agg_ratio * jnp.minimum(
                1.0, 1.0 / jnp.max(-r_P / p.s))
            return e, ms

        def stb_factors(_):
            e = jnp.asarray([1.0, 0.0, 1.0], dt)
            return e, jnp.asarray(pars.ls.min_step_size_stable, dt)

        eta, min_step = lax.cond(be_agg, agg_factors, stb_factors, None)
        direction, ratio = self.compute_direction(
            st.fact, p, cache, eta[0], eta[1], eta[2], st.pdata)

        accepted, cand_p, cand_c, info = self.line_search(
            st, direction, be_agg, min_step)
        return accepted, cand_p, cand_c, info, direction, ratio, eta

    # ==================================================================
    # switching condition (reference: one_phase.jl:91-108)
    # ==================================================================
    def switching_condition(self, st: State):
        pars = self.pars
        p, cache = st.p, st.cache
        is_feas = self.is_feasible(p, pars.ls.comp_feas_agg)
        dual_avg = self.scaled_dual_feas(p, cache, p.mu)
        if pars.primal_bounds_dual_feas:
            prog = dual_avg < pars.aggressive_dual_threshold * _norm_inf(cache.a - p.s)
        else:
            prog = dual_avg < pars.aggressive_dual_threshold * p.mu
        th = pars.a_norm_penalty
        lag_grad = (_norm1(self.grad_lag(cache, p.y, p.mu))
                    < jnp.sum(p.s * p.y) + _norm1(cache.g + p.mu * th * cache.jt_ones))
        be = is_feas & prog & lag_grad
        be = be | (st.last_superlinear & prog & lag_grad)
        return be

    # ==================================================================
    # termination (reference: terminate.jl:3-23)
    # ==================================================================
    def terminate(self, p: Point, cache: Cache, pdata=None, bvals=None):
        pars = self.pars
        if pars.kkt.residual_precision == "f64":
            return self.terminate_f64(p, cache, pdata, bvals)
        scale = self.dual_scale(p.y, p.s)
        sdf0 = _norm_inf(cache.g - cache.jt_y) * scale
        comp_scaled = jnp.max(p.s * p.y) * scale
        max_vio = -jnp.minimum(0.0, jnp.min(cache.a))
        jt_y_1 = _norm1(cache.jt_y)
        feas_obj = -jnp.sum(cache.a * p.y)
        fark1 = jnp.where(feas_obj > 0.0, jt_y_1 / feas_obj, jnp.inf)
        fark2 = (jt_y_1 + jnp.dot(p.s, p.y)) / _norm1(p.y)
        return self._term_verdict(p, cache, sdf0, comp_scaled, max_vio,
                                  fark1, fark2)

    def terminate_f64(self, p: Point, cache: Cache, pdata=None, bvals=None):
        """Termination with every measured quantity evaluated by f64
        oracles (the residual_precision="f64" branch; also used by the
        between-chunk batch recheck, parallel/batch.py — an f32-measured
        loop whose noise floor blocks a certificate gets a near-free
        exact re-measurement every chunk instead of per iteration)."""
        scale = self.dual_scale(p.y, p.s)
        gl64 = self.nlp.grad_lag_hi(p.x, p.y, 0.0, pdata)
        sdf0 = (_norm_inf(gl64)
                * scale.astype(jnp.float64)).astype(self.dtype)
        sy64 = p.s.astype(jnp.float64) * p.y.astype(jnp.float64)
        comp_scaled = (jnp.max(sy64)
                       * scale.astype(jnp.float64)).astype(self.dtype)
        a64 = self.nlp.a_of_hi(p.x, bvals, pdata)
        max_vio = (-jnp.minimum(0.0, jnp.min(a64))).astype(self.dtype)
        # Farkas certificate in f64 as well: the numerator ||J^T y||_1
        # must reach ~tol_inf_2 * ||y||_1, below the f32 VJP noise
        # floor on badly-scaled duals (see nlp.jtprod_hi)
        y64 = p.y.astype(jnp.float64)
        jt_y_1 = _norm1(self.nlp.jtprod_hi(p.x, p.y, pdata))
        feas_obj = -jnp.sum(a64 * y64)
        fark1 = jnp.where(feas_obj > 0.0, jt_y_1 / feas_obj,
                          jnp.inf).astype(self.dtype)
        fark2 = ((jt_y_1 + jnp.dot(p.s.astype(jnp.float64), y64))
                 / _norm1(y64)).astype(self.dtype)
        return self._term_verdict(p, cache, sdf0, comp_scaled, max_vio,
                                  fark1, fark2)

    def _term_verdict(self, p, cache, sdf0, comp_scaled, max_vio,
                      fark1, fark2):
        pars = self.pars
        tol = pars.term.tol_opt
        optimal = (sdf0 < tol) & (comp_scaled < tol) & (max_vio < tol)
        infeas = ((max_vio > tol) & (fark1 < pars.term.tol_inf_1)
                  & (fark2 < pars.term.tol_inf_2))
        unbounded = _norm_inf(p.x) > 1.0 / pars.term.tol_unbounded
        maxgrad = _norm_inf(cache.g) > pars.term.grad_max

        return jnp.where(
            optimal, OPTIMAL,
            jnp.where(infeas, PRIMAL_INFEASIBLE,
                      jnp.where(unbounded, DUAL_INFEASIBLE,
                                jnp.where(maxgrad, MAX_GRADIENT, RUNNING)))
        ).astype(jnp.int32)

    # ==================================================================
    # filter bookkeeping (reference: filter_ls.jl:44-75)
    # ==================================================================
    def filter_add(self, st: State) -> Filter:
        p, cache = st.p, st.cache
        pars = self.pars
        merit = self.eval_merit(p, cache)
        kkt = _norm_inf(self.grad_lag(cache, p.y, p.mu))
        if pars.ls.kkt_include_comp:
            kkt = kkt + _norm_inf(self.comp(p))
        kkt = kkt * self.dual_scale(p.y, p.s)
        f = st.filt
        i = jnp.minimum(f.count, self.filt_cap - 1)
        return Filter(merit=f.merit.at[i].set(merit),
                      kkt=f.kkt.at[i].set(kkt),
                      beta=f.beta.at[i].set(p.beta),
                      count=jnp.minimum(f.count + 1, self.filt_cap))

    # ==================================================================
    # one inner step (correction i of outer iteration t)
    # ==================================================================
    def inner_step(self, st: State, first: bool) -> State:
        """reference: one_phase.jl:174-281 body."""
        pars = self.pars
        dt = self.dtype
        be_agg = self.switching_condition(st)
        # superlinear flag is consumed by the switching condition then reset
        # (one_phase.jl:186-188)
        st = st._replace(last_superlinear=jnp.asarray(False))

        if first:
            # -- factor at current point -------------------------------
            fact = self.form_factor(st.p, st.cache, st.fact, st.pdata)
            success, nfac_inertia, new_delta, LD = self.ipopt_strategy(fact, st.delta)
            # the freshly-formed Q was a temporary for the factor search;
            # the carried Factor stores the placeholder (HBM, see __init__)
            fact = fact._replace(L=self.finalize_solver(LD[0]), D=LD[1],
                                 delta=new_delta, ok=success,
                                 Q=self._store_q(fact.Q))
            old_delta = st.delta
            st = st._replace(fact=fact, delta=new_delta,
                             num_fac_inertia=nfac_inertia,
                             tot_num_fac=nfac_inertia,
                             cum_fac=st.cum_fac + nfac_inertia)

            def fact_failed(st):
                return st._replace(status=jnp.asarray(MAX_DELTA, jnp.int32))

            def attempt_phase(st):
                # step attempts with delta escalation (one_phase.jl:221-258)
                def cond(c):
                    st_c, acc, k, dead = c
                    return (~acc) & (~dead) & (k < pars.max_step_attempts)

                def body(c):
                    st_c, acc, k, dead = c
                    accepted, cand_p, cand_c, info, direction, ratio, eta = \
                        self.take_step(st_c, be_agg)

                    def on_acc(args):
                        st_c, = args
                        return st_c._replace(
                            p=cand_p, cache=cand_c, dir=direction,
                            kkt_ratio=ratio, eta=eta, ls=info), False

                    def on_fail(args):
                        st_c, = args
                        delta = st_c.delta
                        can_escalate = delta < self.delta_max
                        gl = _norm_inf(self.grad_lag(st_c.cache, st_c.p.y, st_c.p.mu))
                        dxn = _norm_inf(direction.x)
                        lag_term = jnp.where((dxn > 0) & jnp.isfinite(gl / dxn),
                                             gl / dxn, 0.0)
                        if pars.delta.lag_cap != float("inf"):
                            # bounded jump (delta.lag_cap, TPU addition):
                            # see config.py — prevents the one-step
                            # delta->1e36 black hole on endgame LS failures
                            lag_term = jnp.minimum(
                                lag_term,
                                pars.delta.lag_cap
                                * jnp.maximum(delta, pars.delta.start))
                        if pars.test.response_to_failure == "lag_delta_inc":
                            nd = jnp.maximum(
                                lag_term,
                                jnp.maximum(delta * pars.delta.inc,
                                            jnp.maximum(pars.delta.start,
                                                        old_delta * pars.delta.dec)))
                        else:
                            nd = jnp.maximum(delta * pars.delta.inc,
                                             jnp.maximum(pars.delta.start,
                                                         old_delta * pars.delta.dec))
                        nd = jnp.where(can_escalate, nd, delta)
                        (Lc, Dc), okc = self.factor(self._fact_q(st_c.fact),
                                                    nd, st_c.fact.rescale,
                                                    fact=st_c.fact)
                        Lc = self.finalize_solver(Lc)
                        Lk = jax.tree_util.tree_map(
                            lambda new, old: jnp.where(okc, new, old),
                            Lc, st_c.fact.L)
                        Dk = jax.tree_util.tree_map(
                            lambda new, old: jnp.where(okc, new, old),
                            Dc, st_c.fact.D)
                        st2 = st_c._replace(
                            delta=nd,
                            fact=st_c.fact._replace(L=Lk, D=Dk, delta=nd),
                            tot_num_fac=st_c.tot_num_fac + 1,
                            cum_fac=st_c.cum_fac + 1,
                            dir=direction, kkt_ratio=ratio, eta=eta, ls=info)
                        # dead when we cannot escalate further
                        return st2, ~can_escalate

                    st2, dead2 = lax.cond(accepted, on_acc, on_fail, (st_c,))
                    return (st2, accepted, k + 1, dead2)

                init = (st, jnp.asarray(False), jnp.asarray(0, jnp.int32),
                        jnp.asarray(False))
                st_f, acc, k, dead = lax.while_loop(cond, body, init)

                # last resort (one_phase.jl:243-247): delta at max —
                # reset duals y = mu / s if comp nonzero, else MAX_DELTA.
                def last_resort(args):
                    st_f, = args
                    comp_big = _norm_inf(self.comp(st_f.p)) > 1e-14

                    def dual_reset(st_f):
                        y_new = st_f.p.mu / st_f.p.s
                        p2 = st_f.p._replace(y=y_new)
                        c2 = st_f.cache._replace(
                            jt_y=self.nlp.jtprod(p2.x, y_new, st_f.pdata))
                        return st_f._replace(p=p2, cache=c2, step_ok=jnp.asarray(True))

                    def fail(st_f):
                        return st_f._replace(
                            status=jnp.asarray(MAX_DELTA, jnp.int32),
                            step_ok=jnp.asarray(False))

                    return lax.cond(comp_big, dual_reset, fail, st_f)

                def normal(args):
                    st_f, = args
                    return st_f._replace(step_ok=acc)

                return lax.cond(dead & ~acc, last_resort, normal, (st_f,))

            st = lax.cond(success, attempt_phase, fact_failed, st)
        else:
            # corrections: reuse factorization (one_phase.jl:262-279)
            accepted, cand_p, cand_c, info, direction, ratio, eta = \
                self.take_step(st, be_agg)

            def on_acc(st):
                st2 = st._replace(p=cand_p, cache=cand_c, dir=direction,
                                  kkt_ratio=ratio, eta=eta, ls=info,
                                  step_ok=jnp.asarray(True))
                if pars.superlinear_theory_mode:
                    sl = be_agg & (cand_p.mu < st.p.mu * 0.1)
                    st2 = st2._replace(last_superlinear=sl)
                return st2

            def on_fail(st):
                return st._replace(dir=direction, kkt_ratio=ratio, eta=eta,
                                   ls=info, step_ok=jnp.asarray(False))

            st = lax.cond(accepted, on_acc, on_fail, st)

        # filter update + termination + history (one_phase.jl:288-321)
        st = st._replace(filt=self.filter_add(st), agg_mask=be_agg)
        new_status = self.terminate(st.p, st.cache, st.pdata, st.bvals)
        st = st._replace(status=jnp.where(st.status == RUNNING, new_status,
                                          st.status))
        step_type = jnp.where(be_agg, STEP_AGG, STEP_STB)
        st = st._replace(hist=hist_mod.record(self, st, step_type))
        return st

    # ==================================================================
    # outer iteration + chunk runner
    # ==================================================================
    def outer_iter(self, st: State) -> State:
        for i in range(self.pars.max_it_corrections):
            first = i == 0

            def run(st):
                return self.inner_step(st, first)

            do = (st.status == RUNNING) & (st.step_ok if not first
                                           else jnp.asarray(True))
            st = lax.cond(do, run, lambda s: s, st)
        term = self.pars.term
        if term.stall_patience > 0 or term.unbounded_ray_patience > 0:
            # shared no-progress tracker for the stall exit and the
            # recession-ray certificate
            prog = st.p.mu + (-jnp.minimum(0.0, jnp.min(st.cache.a)))
            improved = prog < st.best_prog * (1.0 - term.stall_rtol)
            best = jnp.where(improved, prog, st.best_prog)
            last_t = jnp.where(improved, st.t, st.last_prog_t)
            st = st._replace(best_prog=best, last_prog_t=last_t)
        if term.unbounded_ray_patience > 0:
            # resolution-limited recession ride -> dual_infeasible (see
            # TermParams.unbounded_ray_patience): persistent no-progress +
            # diverged iterate + primal feasible.  Checked BEFORE the stall
            # exit so a ray-stalled instance certifies instead of
            # escalating.
            max_vio = -jnp.minimum(0.0, jnp.min(st.cache.a))
            ray = ((st.status == RUNNING)
                   & (st.t - st.last_prog_t >= term.unbounded_ray_patience)
                   & (_norm_inf(st.p.x) > term.unbounded_ray_norm)
                   & (max_vio < term.tol_inf_1))
            st = st._replace(status=jnp.where(ray, DUAL_INFEASIBLE,
                                              st.status).astype(jnp.int32))
        if term.stall_patience > 0:
            # per-instance stall exit (term.stall_patience): an f32-floor-
            # limited instance stops improving mu + max_vio long before
            # max_it; release it as STALLED so a masked batch is not held
            # hostage by its slowest straggler (buckets escalates it to f64)
            stalled = ((st.status == RUNNING)
                       & (st.t - st.last_prog_t >= term.stall_patience))
            st = st._replace(status=jnp.where(stalled, STALLED,
                                              st.status).astype(jnp.int32))
        return st._replace(t=st.t + 1)

    def _run_chunk(self, st: State) -> State:
        with _mm_precision_ctx(self.pars.matmul_precision):
            return self._run_chunk_impl(st)

    def _run_chunk_impl(self, st: State) -> State:
        pars = self.pars

        def cond(c):
            st, k = c
            return ((st.status == RUNNING) & (st.t <= pars.term.max_it)
                    & (k < pars.chunk_size))

        def body(c):
            st, k = c
            return self.outer_iter(st), k + 1

        st, _ = lax.while_loop(cond, body, (st, jnp.asarray(0, jnp.int32)))
        st = st._replace(status=jnp.where(
            (st.status == RUNNING) & (st.t > pars.term.max_it),
            MAX_IT, st.status).astype(jnp.int32))
        return st

    # ==================================================================
    # initialization (reference: src/init/gertz_init.jl)
    # ==================================================================
    def project_bounds(self, x0, bvals=None):
        """Ipopt-style projection into bounds (primal-project.jl:1-68).

        With `bvals`, the per-instance bound values (scattered back over the
        static finite-bound pattern) replace the template's."""
        nlp = self.nlp
        if bvals is None:
            lv = jnp.asarray(nlp.lvar, self.dtype)
            uv = jnp.asarray(nlp.uvar, self.dtype)
        else:
            lv = jnp.full(self.n, -jnp.inf, self.dtype).at[
                jnp.asarray(nlp.lvi)].set(bvals["lv"])
            uv = jnp.full(self.n, jnp.inf, self.dtype).at[
                jnp.asarray(nlp.uvi)].set(bvals["uv"])
        k1 = 1e-2
        k2 = 1e-2
        p_L = jnp.minimum(k1 * jnp.maximum(1.0, jnp.abs(lv)), k2 * (uv - lv))
        p_U = jnp.minimum(k1 * jnp.maximum(1.0, jnp.abs(uv)), k2 * (uv - lv))
        b_L = jnp.where(jnp.isfinite(lv), lv + p_L, -jnp.inf)
        b_U = jnp.where(jnp.isfinite(uv), uv - p_U, jnp.inf)
        return jnp.clip(x0, b_L, b_U)

    def _initial_state(self, x0, bvals=None, pdata=None) -> State:
        with _mm_precision_ctx(self.pars.matmul_precision):
            return self._initial_state_impl(x0, bvals, pdata)

    def _initial_state_impl(self, x0, bvals=None, pdata=None) -> State:
        nlp, pars = self.nlp, self.pars
        dt = self.dtype
        n, m = self.n, self.m
        mc = nlp.m_cons  # canonical rows from original constraints ("ais")

        x0 = jnp.asarray(x0, dt)
        if bvals is None:
            bvals = self.nlp.default_bvals()
        if pdata is None:
            pdata = nlp._pdata0 if nlp.parametric else {}
        x = (self.project_bounds(x0, bvals)
             if pars.init.start_satisfying_bounds else x0)

        y0 = jnp.ones(m, dt)
        cons = nlp.c(x, pdata)
        a = nlp.a_of(x, cons, bvals)
        g = nlp.grad_f(x, pdata)

        s_thres = 1e-4
        d_s = jnp.maximum(s_thres, -2.0 * jnp.min(a))
        s0 = a + d_s
        mu0 = d_s

        p0 = Point(x=x, y=y0, s=s0, mu=mu0, beta=jnp.asarray(1.0, dt))
        cache0 = self.make_cache(x, y0, bvals, pdata)

        empty_fact = self._empty_factor()
        if self._param_const_jac or self._param_const_hess:
            # parametric constant structure: evaluate once per solve; the
            # Factor carries these through all iterations (form_factor)
            empty_fact = empty_fact._replace(
                Jc=(nlp.jac_orig(x, pdata) if self._param_const_jac
                    else empty_fact.Jc),
                H=(nlp.lag_hess(x, jnp.zeros(m, dt), pdata)
                   if self._param_const_hess else empty_fact.H))
        if pars.init.init_style == "gertz":
            # one full KKT cycle at the guarded start (gertz_init.jl:22-28)
            fact = self.form_factor(p0, cache0, empty_fact, pdata)
            succ, nfac, delta0, LD = self.ipopt_strategy(fact, jnp.asarray(0.0, dt))
            fact = fact._replace(L=self.finalize_solver(LD[0]), D=LD[1],
                                 delta=delta0, ok=succ)
            adir, _ = self.compute_direction(fact, p0, cache0, 0.0, 0.0,
                                             0.0, pdata)
            y_t = y0 + adir.y
            s_t = -a
            if nlp.m_bounds > 0:
                s_t = s_t.at[mc:].set(a[mc:])  # bound-row slacks stay = a_i
        elif pars.init.init_style == "mehrotra":
            # ridge least-squares dual estimate (estimate_y_tilde,
            # guess-vars.jl:128-169): (lam*I + J^T J) dx = -g, y = -J dx
            Jc0 = nlp.jac_orig(x, pdata)
            lam = 1e-4
            Hr = lam * jnp.eye(n, dtype=dt) + nlp.jtdj(
                Jc0, jnp.ones(m, dt))
            Lr = jnp.linalg.cholesky(Hr)
            zr = jax.scipy.linalg.solve_triangular(Lr, -g, lower=True)
            dx0 = jax.scipy.linalg.solve_triangular(Lr.T, zr, lower=False)
            y_t = -nlp.jprod_mat(Jc0, dx0)
            bad = _isbad(y_t)
            y_t = jnp.where(bad, jnp.ones(m, dt), y_t)
            s_t = a
            fact = self.form_factor(p0, cache0, empty_fact, pdata)
            LD0, succ = self.factor(fact.Q, jnp.asarray(pars.delta.start, dt),
                                    fact.rescale, fact=fact)
            fact = fact._replace(L=self.finalize_solver(LD0[0]), D=LD0[1],
                                 delta=jnp.asarray(pars.delta.start, dt),
                                 ok=succ)
            nfac = jnp.asarray(1, jnp.int32)
        else:
            raise ValueError(f"init style {pars.init.init_style}")
        if mc > 0:
            min_s_cons = jnp.min(s_t[:mc])
        else:
            min_s_cons = jnp.asarray(0.0, dt)
        d_s2 = (jnp.maximum(-2.0 * min_s_cons, 0.0)
                + _norm_inf(g - nlp.jtprod(x, y_t, pdata)) / (1.0 + _norm_inf(y_t)))
        d_y = jnp.maximum(-2.0 * jnp.min(y_t), 0.0)
        if mc > 0:
            s_t = s_t.at[:mc].add(d_s2 + 1e-8)
        y_t = y_t + d_y
        d_y_t = d_y + 0.5 * jnp.dot(s_t, y_t) / jnp.sum(s_t)
        y_t = y_t + d_y_t
        y_t = jnp.clip(y_t, pars.init.dual_min, pars.init.dual_max)
        d_s_t = d_s2 + 0.5 * jnp.dot(s_t, y_t) / jnp.sum(y_t)
        if mc > 0:
            s_t = s_t.at[:mc].add(d_s_t)

        # correct_guess3 (correct-guess.jl:94-132)
        if pars.init.init_style == "mehrotra" and not pars.init.mehotra_scaling:
            mu = 1e-6 + _norm_inf(s_t) + _norm_inf(g)
            conW = jnp.zeros(m, dt).at[:mc].set(1.0)
        else:
            mu = jnp.mean(s_t * y_t)
            conW = (s_t - a) / mu
        if pars.init.init_style == "mehrotra":
            # per-class constraint weights (init.jl:19-85); defaults 1.0
            import numpy as _np
            lin = nlp.lin_mask
            eqb = nlp.eqbound_mask
            scale_vec = _np.ones(m)
            scale_vec[eqb & ~lin] *= pars.init.nl_eq_scale
            scale_vec[~eqb & ~lin] *= pars.init.nl_ineq_scale
            scale_vec[lin] *= pars.init.linear_scale
            conW = conW * jnp.asarray(scale_vec, dt)
        s = a + mu * conW
        mu = mu * pars.init.mu_scale

        # center_dual! with comp_feas_agg (gertz_init.jl:44-49)
        cfa = pars.ls.comp_feas_agg
        y_c = mu / s
        y = jnp.minimum(y_c / cfa, jnp.maximum(y_t, cfa * y_c))

        p = Point(x=x, y=y, s=s, mu=mu, beta=jnp.asarray(1.0, dt))
        cache = self.make_cache(x, y, bvals, pdata)
        r0 = cache.a - s
        fact = fact._replace(Q=self._store_q(fact.Q))  # HBM (see __init__)

        filt = Filter(merit=jnp.full(self.filt_cap, jnp.inf, dt),
                      kkt=jnp.full(self.filt_cap, jnp.inf, dt),
                      beta=jnp.full(self.filt_cap, jnp.inf, dt),
                      count=jnp.asarray(0, jnp.int32))
        hist = History(buf=jnp.zeros((self.hist_cap, hist_mod.NCOLS), dt),
                       count=jnp.asarray(0, jnp.int32))
        zdir = Dir(x=jnp.zeros(n, dt), y=jnp.zeros(m, dt), s=jnp.zeros(m, dt),
                   mu=jnp.asarray(0.0, dt), beta=jnp.asarray(0.0, dt))
        ls0 = LSInfo(status=jnp.asarray(LS_NONE, jnp.int32),
                     alpha_P=jnp.asarray(0.0, dt), alpha_D=jnp.asarray(0.0, dt),
                     num_steps=jnp.asarray(0, jnp.int32))
        st = State(p=p, cache=cache, fact=fact, dir=zdir, filt=filt, hist=hist,
                   r0=r0, delta=jnp.asarray(0.0, dt),
                   t=jnp.asarray(1, jnp.int32),
                   status=jnp.asarray(RUNNING, jnp.int32),
                   step_ok=jnp.asarray(True),
                   last_superlinear=jnp.asarray(False),
                   kkt_ratio=jnp.asarray(0.0, dt),
                   eta=jnp.zeros(3, dt), ls=ls0,
                   agg_mask=jnp.asarray(False),
                   num_fac_inertia=jnp.asarray(0, jnp.int32),
                   tot_num_fac=jnp.asarray(0, jnp.int32),
                   cum_fac=nfac, bvals=bvals, pdata=pdata,
                   best_prog=(jnp.asarray(jnp.inf, dt)
                              if pars.term.stall_patience > 0
                              or pars.term.unbounded_ray_patience > 0
                              else None),
                   last_prog_t=(jnp.asarray(0, jnp.int32)
                                if pars.term.stall_patience > 0
                                or pars.term.unbounded_ray_patience > 0
                                else None))
        # init factorization failure -> MAX_DELTA (reference errors out)
        st = st._replace(status=jnp.where(succ, RUNNING, MAX_DELTA).astype(jnp.int32))
        # termination check at the starting point (one_phase.jl:152-166)
        st = st._replace(status=jnp.where(st.status == RUNNING,
                                          self.terminate(p, cache, pdata,
                                                         bvals),
                                          st.status).astype(jnp.int32))
        st = st._replace(hist=hist_mod.record(self, st, STEP_IT0))
        return st

    def _empty_factor(self) -> Factor:
        n, m = self.n, self.m
        dt = self.dtype
        N = (n + self.mr if self.kkt_type in ("symmetric", "clever_symmetric")
             else n)
        rescale = (jnp.ones(N, dt)
                   if (self.kkt_type == "clever_symmetric"
                       and self.pars.kkt.kkt_system_rescale != "none")
                   else None)
        return Factor(Jc=self._store_jc(jnp.zeros((self.nlp.m_orig, n), dt)),
                      H=self._store_h(jnp.zeros((n, n), dt)),
                      Q=self._store_q(jnp.zeros((N, N),
                                                self.q_store_dtype)),
                      schur_diag=jnp.zeros(n, dt),
                      L=jnp.eye(N, dtype=self.L_store_dtype),
                      D=jnp.ones(N, self.factor_store_dtype),
                      delta=jnp.asarray(0.0, dt),
                      s_f=jnp.ones(m, dt), y_f=jnp.ones(m, dt),
                      ok=jnp.asarray(False), rescale=rescale)
