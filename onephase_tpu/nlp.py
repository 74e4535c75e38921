"""Problem abstraction + canonicalizer.

TPU-native re-design of the reference's L1 layer
(reference: src/utils/Class_cutest.jl — `Class_CUTEst`, `Class_bounds`,
`eval_a`/`eval_jac`/`eval_lag_hess` canonical assembly).

A raw problem is::

    min f(x)  s.t.  lcon <= c(x) <= ucon,  lvar <= x <= uvar

The canonical form (one slack per finite bound side, same row ordering as
the reference, Class_cutest.jl:385-420) is ``a(x) >= 0`` with

    a(x) = [ c(x)[li] - l ;  u - c(x)[ui] ;  x[lvi] - lv ;  uv - x[uvi] ]

Fixed variables (lvar == uvar) are eliminated (reference `_i_not_fixed`,
Class_cutest.jl:37-48) and reconstructed for oracle evaluation
(`_cute_x`, Class_cutest.jl:422-450).

TPU-first departure from the reference: the canonical Jacobian
``J = [Jc[li]; -Jc[ui]; I[lvi]; -I[uvi]]`` is never materialized.  All
canonical products are expressed through the *original* (much smaller)
Jacobian `Jc` plus static gathers/scatters, so the Schur complement
``J^T D J`` becomes one MXU matmul on `Jc` plus a diagonal update — the
42%-of-runtime line item of the reference (docs/one-phase.tex:901-912)
maps onto the MXU instead of sparse scalar code.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NLPSpec", "CanonNLP", "canonicalize"]


@dataclass
class NLPSpec:
    """Raw user problem (analogue of an NLPModels model, reference Project.toml dep)."""

    f: Callable          # x -> scalar objective
    x0: np.ndarray       # starting point, full-variable space
    c: Optional[Callable] = None    # x -> (m_orig,) constraint body, or None
    lcon: Optional[np.ndarray] = None
    ucon: Optional[np.ndarray] = None
    lvar: Optional[np.ndarray] = None
    uvar: Optional[np.ndarray] = None
    lin: Sequence[int] = field(default_factory=tuple)   # indices of linear constraints
    name: str = "nlp"
    # declare structure XLA cannot infer: constant Jacobian (all-linear
    # constraints) / constant Lagrangian Hessian (quadratic f + linear c).
    # The kernel then evaluates them once instead of per outer iteration.
    constant_jac: bool = False
    constant_hess: bool = False
    # LP declaration: the Lagrangian Hessian is IDENTICALLY ZERO (linear f
    # and c).  The kernel then stores no (n, n) H at all and skips every
    # H product — for parametric LP buckets this removes a per-instance
    # dense zero matrix from the carried state (16 MB/instance of zeros
    # at n=2048 — the batched-bucket OOM) and a dense matmul per
    # refinement pass.
    zero_hess: bool = False
    # --- parametric problem data (TPU-first capability, no reference
    # counterpart): when `pdata` is set, `f` and `c` are called as
    # f(x, pdata) / c(x, pdata) with pdata a pytree of arrays.  A batch of
    # same-structure instances differing only in data (e.g. a shape-bucketed
    # Netlib directory: per-instance A, c, bounds) then shares ONE compiled
    # solver, with pdata vmapped alongside the state.  Optional `jac`
    # ((x, pdata) -> (m_orig, n)) bypasses AD for data-given Jacobians.
    pdata: Optional[dict] = None
    jac: Optional[Callable] = None

    def __post_init__(self):
        self.x0 = np.asarray(self.x0, dtype=np.float64)
        nv = self.x0.shape[0]
        if self.lvar is None:
            self.lvar = np.full(nv, -np.inf)
        if self.uvar is None:
            self.uvar = np.full(nv, np.inf)
        self.lvar = np.asarray(self.lvar, dtype=np.float64)
        self.uvar = np.asarray(self.uvar, dtype=np.float64)
        if self.c is None:
            self.lcon = np.zeros(0)
            self.ucon = np.zeros(0)
        else:
            assert self.lcon is not None and self.ucon is not None
            self.lcon = np.asarray(self.lcon, dtype=np.float64)
            self.ucon = np.asarray(self.ucon, dtype=np.float64)


class CanonNLP:
    """Canonicalized problem with JAX oracles (reference: Class_CUTEst).

    All index arrays are host numpy (static under jit).  Oracles operate on
    the reduced variable vector (fixed variables eliminated).
    """

    def __init__(self, spec: NLPSpec, dtype=jnp.float64):
        self.spec = spec
        self.name = spec.name
        self.dtype = dtype

        lvar, uvar = spec.lvar, spec.uvar
        nv_full = lvar.shape[0]

        # --- fixed-variable elimination (reference _i_not_fixed) ---
        free = np.nonzero(lvar != uvar)[0]
        self.free_idx = free
        self.n_full = nv_full
        self.n = free.shape[0]
        self._x_template = np.array(lvar, dtype=np.float64)  # fixed vars take lvar value
        self._x_template[~np.isfinite(self._x_template)] = 0.0

        self.lvar = lvar[free]
        self.uvar = uvar[free]
        self.x0 = spec.x0[free]

        # --- finite-bound row maps (reference Class_bounds, :12-35) ---
        lcon, ucon = spec.lcon, spec.ucon
        self.m_orig = lcon.shape[0]
        self.li = np.nonzero(lcon > -np.inf)[0]
        self.ui = np.nonzero(ucon < np.inf)[0]
        self.lvi = np.nonzero(self.lvar > -np.inf)[0]
        self.uvi = np.nonzero(self.uvar < np.inf)[0]
        self.l = lcon[self.li]
        self.u = ucon[self.ui]
        self.lv = self.lvar[self.lvi]
        self.uv = self.uvar[self.uvi]

        self.n_lcon = self.li.shape[0]
        self.n_ucon = self.ui.shape[0]
        self.n_lvar = self.lvi.shape[0]
        self.n_uvar = self.uvi.shape[0]
        self.m_cons = self.n_lcon + self.n_ucon           # ncons_orginal
        self.m_bounds = self.n_lvar + self.n_uvar         # nbounds_orginal
        self.m = self.m_cons + self.m_bounds              # canonical ncon

        # --- row classification (reference linear_cons/ineq_cons, :205-272) ---
        is_lin = np.zeros(self.m_orig, dtype=bool)
        is_lin[np.asarray(list(spec.lin), dtype=int)] = True
        self.lin_mask = np.concatenate([
            is_lin[self.li], is_lin[self.ui],
            np.ones(self.m_bounds, dtype=bool),
        ])
        is_eq = lcon == ucon
        # reference ineq_cons marks equality rows and bound rows with 1
        self.eqbound_mask = np.concatenate([
            is_eq[self.li], is_eq[self.ui],
            np.ones(self.m_bounds, dtype=bool),
        ])

        # bound-too-close screen (reference primal-project.jl:27-33)
        gap = self.uvar - self.lvar
        if np.any(gap < 1e-8):
            raise ValueError(f"{spec.name}: variable bounds too close (gap < 1e-8)")

        if self.m == 0:
            raise ValueError(
                "Unconstrained minimization problems are unsupported "
                "(reference: one_phase.jl:25-27)")

        # device copies of static data used inside oracles
        d = dtype
        self._j = {
            "li": jnp.asarray(self.li), "ui": jnp.asarray(self.ui),
            "lvi": jnp.asarray(self.lvi), "uvi": jnp.asarray(self.uvi),
            "l": jnp.asarray(self.l, d), "u": jnp.asarray(self.u, d),
            "lv": jnp.asarray(self.lv, d), "uv": jnp.asarray(self.uv, d),
        }
        # canonical J^T @ ones, constraint part weights: +1 per l-row, -1 per u-row
        w1 = np.zeros(self.m_orig)
        np.add.at(w1, self.li, 1.0)
        np.add.at(w1, self.ui, -1.0)
        self._wc_ones = jnp.asarray(w1, d)
        b1 = np.zeros(self.n)
        np.add.at(b1, self.lvi, 1.0)
        np.add.at(b1, self.uvi, -1.0)
        self._bnd_ones = jnp.asarray(b1, d)

        self._f_raw = spec.f
        self._c_raw = spec.c
        self._jac_raw = spec.jac

        # parametric problem data: template copy on device; per-instance
        # overrides flow in through the `pdata` oracle argument (threaded
        # from State.pdata by the kernel)
        self.parametric = spec.pdata is not None
        if self.parametric:
            self._pdata0 = jax.tree_util.tree_map(
                lambda v: (jnp.asarray(v, dtype)
                           if np.issubdtype(np.asarray(v).dtype, np.floating)
                           else jnp.asarray(v)),
                spec.pdata)
        else:
            self._pdata0 = None

    def _pd(self, pdata):
        return self._pdata0 if pdata is None else pdata

    # ------------------------------------------------------------------
    # full-variable reconstruction (reference _cute_x)
    def _full_x(self, x):
        if self.n == self.n_full:
            return x
        tmpl = jnp.asarray(self._x_template, x.dtype)
        return tmpl.at[jnp.asarray(self.free_idx)].set(x)

    # ------------------------------------------------------------------
    # raw oracles in reduced space
    def f(self, x, pdata=None):
        """Objective (reference eval_f, Class_cutest.jl:310)."""
        xf = self._full_x(x)
        v = self._f_raw(xf, self._pd(pdata)) if self.parametric else self._f_raw(xf)
        return jnp.asarray(v, self.dtype)

    def c(self, x, pdata=None):
        """Original constraint body c(x) -> (m_orig,)."""
        if self._c_raw is None:
            return jnp.zeros((0,), self.dtype)
        xf = self._full_x(x)
        v = self._c_raw(xf, self._pd(pdata)) if self.parametric else self._c_raw(xf)
        return jnp.asarray(v, self.dtype).reshape(self.m_orig)

    def grad_f(self, x, pdata=None):
        """Objective gradient (reference eval_grad_f, Class_cutest.jl:505)."""
        return jax.grad(lambda xx: self.f(xx, pdata))(x)

    # ------------------------------------------------------------------
    # canonical constraint vector a(x) >= 0 (reference eval_a, :385-420)
    #
    # `bvals` optionally overrides the bound VALUES (l, u, lv, uv) with
    # traced arrays of the same shapes — the finiteness pattern (which rows
    # exist) stays static, so a batch of instances differing only in bound
    # data (e.g. the perturbed-infeasible campaign, infeas.jl:3-33) shares
    # one compiled solver under vmap.
    def default_bvals(self):
        j = self._j
        return {"l": j["l"], "u": j["u"], "lv": j["lv"], "uv": j["uv"]}

    def shifted_bvals(self, shift):
        """Bound values for the range-shift infeasible generator:
        lcon/ucon rows shifted by -shift, variable bounds unchanged."""
        j = self._j
        return {"l": j["l"] - shift, "u": j["u"] - shift,
                "lv": j["lv"], "uv": j["uv"]}

    def a_of(self, x, cvals=None, bvals=None, pdata=None):
        b = bvals if bvals is not None else self._j
        j = self._j
        if cvals is None:
            cvals = self.c(x, pdata)
        return jnp.concatenate([
            cvals[j["li"]] - b["l"],
            b["u"] - cvals[j["ui"]],
            x[j["lvi"]] - b["lv"],
            b["uv"] - x[j["uvi"]],
        ])

    # canonical J @ v given original-Jacobian action jc_v = Jc @ v
    def jprod_from(self, jc_v, v):
        j = self._j
        return jnp.concatenate([
            jc_v[j["li"]], -jc_v[j["ui"]], v[j["lvi"]], -v[j["uvi"]],
        ])

    def jprod(self, x, v, pdata=None):
        """Canonical J(x) @ v via one JVP on c."""
        if self.m_orig > 0:
            _, jc_v = jax.jvp(lambda xx: self.c(xx, pdata), (x,), (v,))
        else:
            jc_v = jnp.zeros((0,), self.dtype)
        return self.jprod_from(jc_v, v)

    # split a canonical multiplier w into (orig-constraint weights, bound vector)
    def split_canonical(self, w):
        j = self._j
        nl, nu, nbl = self.n_lcon, self.n_ucon, self.n_lvar
        w_l = w[:nl]
        w_u = w[nl:nl + nu]
        w_bl = w[nl + nu:nl + nu + nbl]
        w_bu = w[nl + nu + nbl:]
        wc = jnp.zeros((self.m_orig,), w.dtype)
        wc = wc.at[j["li"]].add(w_l)
        wc = wc.at[j["ui"]].add(-w_u)
        bnd = jnp.zeros((self.n,), w.dtype)
        bnd = bnd.at[j["lvi"]].add(w_bl)
        bnd = bnd.at[j["uvi"]].add(-w_bu)
        return wc, bnd

    # like split_canonical but with squared signs (for J^T diag(d) J assembly)
    def split_canonical_sq(self, d):
        j = self._j
        nl, nu, nbl = self.n_lcon, self.n_ucon, self.n_lvar
        wc = jnp.zeros((self.m_orig,), d.dtype)
        wc = wc.at[j["li"]].add(d[:nl])
        wc = wc.at[j["ui"]].add(d[nl:nl + nu])
        bnd = jnp.zeros((self.n,), d.dtype)
        bnd = bnd.at[j["lvi"]].add(d[nl + nu:nl + nu + nbl])
        bnd = bnd.at[j["uvi"]].add(d[nl + nu + nbl:])
        return wc, bnd

    def jtprod(self, x, w, pdata=None):
        """Canonical J(x)^T @ w via one VJP on c (reference eval_jac_T_prod)."""
        wc, bnd = self.split_canonical(w)
        if self.m_orig > 0:
            _, pull = jax.vjp(lambda xx: self.c(xx, pdata), x)
            out = pull(wc)[0]
        else:
            out = jnp.zeros((self.n,), self.dtype)
        return out + bnd

    def grad_lag_hi(self, x, w, mu_th, pdata=None):
        """g(x) - J(x)^T w + mu_th * J(x)^T 1, evaluated in float64.

        The mixed-precision residual path (kkt.residual_precision="f64"):
        in f32 the oracle's own rounding (~eps32 * intermediate magnitudes)
        floors the achievable KKT error — e.g. Rosenbrock's ~1e3 Hessian
        entries give ~1e-4 gradient noise, so tol 1e-6 is uncertifiable no
        matter how the linear algebra is refined.  Evaluating the DUAL
        RESIDUAL oracles in f64 (elementwise/VJP work, no factorization)
        restores certifiability while the Schur/Cholesky path stays f32.
        Requires jax_enable_x64.  TPU: XLA emulates f64 (slow for matmuls,
        fine for the once-per-iteration residual).
        """
        hi = jnp.float64
        x64 = x.astype(hi)
        pd = self._pd(pdata)

        def f_hi(xx):
            xf = self._full_x(xx)
            v = self._f_raw(xf, pd) if self.parametric else self._f_raw(xf)
            return jnp.asarray(v, hi)

        g = jax.grad(f_hi)(x64)
        wc, bnd = self.split_canonical(w.astype(hi))
        th_vec = mu_th * self._wc_ones.astype(hi) - wc
        if self.m_orig > 0:
            def c_hi(xx):
                xf = self._full_x(xx)
                v = self._c_raw(xf, pd) if self.parametric else self._c_raw(xf)
                return jnp.asarray(v, hi).reshape(self.m_orig)

            _, pull = jax.vjp(c_hi, x64)
            jt = pull(th_vec)[0]
        else:
            jt = jnp.zeros((self.n,), hi)
        return g + jt + mu_th * self._bnd_ones.astype(hi) - bnd

    def jtprod_hi(self, x, w, pdata=None):
        """Canonical J(x)^T @ w with f64 VJP arithmetic.

        The Farkas certificate's numerator ||J^T y||_1 must approach 0 for
        an infeasibility verdict (reference farkas_certificate,
        eval.jl:149-161); in f32 the VJP's own rounding floors it at
        ~eps32 * ||J|| * ||y||, which can sit above tol_inf_2 * ||y||_1 —
        the solve then stalls at MAX_IT instead of certifying.  One f64
        oracle pass per termination check removes that floor (same
        rationale as grad_lag_hi).  Requires jax_enable_x64.
        """
        hi = jnp.float64
        x64 = x.astype(hi)
        pd = self._pd(pdata)
        wc, bnd = self.split_canonical(w.astype(hi))
        if self.m_orig > 0:
            def c_hi(xx):
                xf = self._full_x(xx)
                v = self._c_raw(xf, pd) if self.parametric else self._c_raw(xf)
                return jnp.asarray(v, hi).reshape(self.m_orig)

            _, pull = jax.vjp(c_hi, x64)
            out = pull(wc)[0]
        else:
            out = jnp.zeros((self.n,), hi)
        return out + bnd

    def a_of_hi(self, x, bvals=None, pdata=None):
        """Canonical a(x) in float64 (violation measurement without the
        f32 cancellation in c(x) - l / u - c(x))."""
        hi = jnp.float64
        x64 = x.astype(hi)
        pd = self._pd(pdata)
        if self.m_orig > 0:
            xf = self._full_x(x64)
            v = self._c_raw(xf, pd) if self.parametric else self._c_raw(xf)
            cv = jnp.asarray(v, hi).reshape(self.m_orig)
        else:
            cv = jnp.zeros((0,), hi)
        b = bvals if bvals is not None else self._j
        b = {k: jnp.asarray(b[k]).astype(hi) for k in ("l", "u", "lv", "uv")}
        j = self._j
        return jnp.concatenate([
            cv[j["li"]] - b["l"], b["u"] - cv[j["ui"]],
            x64[j["lvi"]] - b["lv"], b["uv"] - x64[j["uvi"]],
        ])

    def jtprod_ones(self, x, pdata=None):
        """Canonical J(x)^T @ 1 (regularizer gradient, reference eval_grad_r)."""
        if self.m_orig > 0:
            _, pull = jax.vjp(lambda xx: self.c(xx, pdata), x)
            out = pull(self._wc_ones)[0]
        else:
            out = jnp.zeros((self.n,), self.dtype)
        return out + self._bnd_ones

    # ------------------------------------------------------------------
    # materialized original Jacobian (per outer iteration; reference eval_jac)
    def jac_orig(self, x, pdata=None):
        if self.m_orig == 0:
            return jnp.zeros((0, self.n), self.dtype)
        if self._jac_raw is not None:
            # user-supplied Jacobian oracle (full-variable space)
            pd = self._pd(pdata)
            Jf = jnp.asarray(
                self._jac_raw(self._full_x(x), pd) if self.parametric
                else self._jac_raw(self._full_x(x)), self.dtype)
            if self.n != self.n_full:
                Jf = Jf[:, jnp.asarray(self.free_idx)]
            return Jf
        # forward mode costs n passes, reverse costs m_orig: pick the cheaper
        cfun = lambda xx: self.c(xx, pdata)  # noqa: E731
        if self.m_orig < self.n:
            return jax.jacrev(cfun)(x)
        return jax.jacfwd(cfun)(x)

    # canonical products through a materialized Jc
    def jprod_mat(self, Jc, v):
        jc_v = Jc @ v if self.m_orig > 0 else jnp.zeros((0,), v.dtype)
        return self.jprod_from(jc_v, v)

    def jtprod_mat(self, Jc, w):
        wc, bnd = self.split_canonical(w)
        out = Jc.T @ wc if self.m_orig > 0 else jnp.zeros((self.n,), w.dtype)
        return out + bnd

    def jac_canonical(self, Jc):
        """Materialize the canonical Jacobian [Jc[li]; -Jc[ui]; I_l; -I_u]
        (reference eval_jac, Class_cutest.jl:451-503) — used by the
        symmetric KKT path only; the Schur path never forms it."""
        j = self._j
        eye = jnp.eye(self.n, dtype=Jc.dtype)
        return jnp.concatenate([
            Jc[j["li"]], -Jc[j["ui"]], eye[j["lvi"]], -eye[j["uvi"]],
        ], axis=0)

    def jtdj(self, Jc, d):
        """Canonical J^T diag(d) J as dense (n,n) — the Schur hot op.

        = Jc^T diag(wc) Jc + diag(bnd) with wc/bnd from sign-squared scatter
        (reference eval_J_T_J, eval.jl:84-86 via sparse triple product).
        """
        wc, bnd = self.split_canonical_sq(d)
        if self.m_orig > 0:
            Q = (Jc * wc[:, None]).T @ Jc
        else:
            Q = jnp.zeros((self.n, self.n), d.dtype)
        return Q + jnp.diag(bnd)

    def jtdj_fused(self, Jc, d, H, use_pallas: bool = False, mxu_dtype=None):
        """Q = H + J^T diag(d) J fused (Pallas kernel on TPU, ops/schur.py).
        `mxu_dtype` runs the rank-m update at a faster MXU dtype (bf16)."""
        from .ops.schur import fused_q
        wc, bnd = self.split_canonical_sq(d)
        return fused_q(Jc, wc, H, bnd, use_pallas, mxu_dtype)

    def jtdj_diag(self, Jc, d):
        """diag(J^T diag(d) J) (reference eval_diag_J_T_J, eval.jl:88-99)."""
        wc, bnd = self.split_canonical_sq(d)
        if self.m_orig > 0:
            di = jnp.einsum("ij,i,ij->j", Jc, wc, Jc)
        else:
            di = jnp.zeros((self.n,), d.dtype)
        return di + bnd

    # ------------------------------------------------------------------
    # Lagrangian Hessian of f(x) - y^T a(x), materialized (n,n) symmetric
    # (reference eval_lag_hess, Class_cutest.jl:541-581; bound rows are
    # linear so only original-constraint duals enter.)
    def lag_hess(self, x, y, pdata=None):
        wc, _ = self.split_canonical(y)

        def lag(xx):
            val = self.f(xx, pdata)
            if self.m_orig > 0:
                val = val - jnp.dot(wc, self.c(xx, pdata))
            return val

        return jax.hessian(lag)(x)

    def hess_prod_fn(self, x, y, pdata=None):
        """Returns v -> H v (Hessian-vector product at fixed (x, y))."""
        wc, _ = self.split_canonical(y)

        def lag(xx):
            val = self.f(xx, pdata)
            if self.m_orig > 0:
                val = val - jnp.dot(wc, self.c(xx, pdata))
            return val

        g = jax.grad(lag)
        return lambda v: jax.jvp(g, (x,), (v,))[1]


def canonicalize(spec: NLPSpec, dtype=None) -> CanonNLP:
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return CanonNLP(spec, dtype=dtype)
