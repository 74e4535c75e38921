"""Dual (normal-equations / Woodbury) Schur KKT path for LPs with m < n.

The dense schur path factors the (n, n) primal Schur complement
Q = diag(bnd) + Jc^T diag(wc) Jc (reference schur.jl:47-62 with H = 0).
When the original constraint count m_orig is well below n — the shape of
the bucketed Netlib-style LP campaigns, where every variable carries
finite bounds so diag(bnd) > 0 — the classic LP-IPM alternative is to
factor the m x m *dual* normal matrix instead, via the Woodbury identity
(the working version of the reference's dormant src/helpers/woodbury.jl):

    (D + Jc^T W Jc)^-1 = D^-1 - D^-1 Jc^T S^-1 Jc D^-1,
    S = W^-1 + Jc D^-1 Jc^T                      (m_orig, m_orig)

with D = diag(bnd) + delta.  Cost per factorization drops from
O(n^2 m + n^3/3) to O(m^2 n + m^3/3) — 8-16x fewer MXU flops at
m = n/2 — and every backsolve is three matvecs (Jc, S^-1, Jc^T) plus
diagonal scalings, all MXU-friendly batched matmuls under vmap.

Correctness containment is identical to the dense path: the factorization
is only a *preconditioner* — iterative refinement (core.refine_solve)
measures the residual against the true J products, and the a-posteriori
KKT-error ratio guards direction quality.  Inertia: with D > 0 and
W > 0, Q + delta*I is SPD iff S is SPD, so the Cholesky-success test on
S (with the same relative pivot screen as the dense path, core._chol_ok
semantics) is the exact inertia oracle; delta-escalation semantics are
unchanged.

Gating: requires NLPSpec.zero_hess (LPs), m_orig >= 1, and every
variable bounded on at least one side at runtime (bnd + delta > 0 is
part of the inertia check, so unbounded-variable instances fail factor
and escalate delta rather than silently diverge — the bucket templates
always have two-sided finite bounds).

Activate with kkt.kkt_solver_type = "schur_dual" (config.py); the
bucketed LP driver (parallel/buckets.py) picks it automatically for
eligible shape classes unless disabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Params
from ..nlp import CanonNLP
from .core import OnePhaseKernel
from .state import Factor


class SchurDualKernel(OnePhaseKernel):
    """OnePhaseKernel whose factorization object is the dual normal matrix.

    The carried Factor reuses the base pytree slots:
      Q  -> (wc, bnd, jc_store) weight/bound vectors at the factor point
            (placeholders in the carried state; rebuilt by _fact_q)
      L  -> (S_inv, d_inv, A) after finalize: explicit S^-1 (invchol-style
            MXU backsolves), 1/(bnd+delta), and the factor-dtype Jacobian
      D  -> unused (shape-(1,) placeholder)
    """

    def __init__(self, nlp: CanonNLP, pars: Params):
        if pars.kkt.kkt_solver_type != "schur_dual":
            raise ValueError("SchurDualKernel requires kkt_solver_type="
                             "'schur_dual'")
        if pars.kkt.factor_precision == "f32_fallback":
            raise ValueError("schur_dual supports factor_precision 'same' "
                             "or 'f32' (no per-factorization fallback)")
        # internal branches ('schur' hot path + zero-H fast path) and the
        # delta/refinement machinery all key on 'schur'; the pallas/invchol
        # operator dispatch is replaced wholesale by the overrides below
        pars = pars.with_overrides({"kkt.kkt_solver_type": "schur",
                                    "kkt.linear_solver_type": "xla"})
        super().__init__(nlp, pars)
        if not self._H_zero:
            raise ValueError("schur_dual requires NLPSpec.zero_hess (LP)")
        if nlp.m_orig < 1:
            raise ValueError("schur_dual needs original constraint rows")
        self._mo = nlp.m_orig

    # ---------------- factorization pieces ---------------------------
    # (Factor.H is always the (0, 0) zero-Hessian placeholder here)
    def form_factor(self, p, cache, prev: Factor, pdata=None) -> Factor:
        nlp = self.nlp
        if self._Jc_const is not None:
            Jc = self._Jc_const
        elif self._param_const_jac:
            Jc = prev.Jc
        else:
            Jc = nlp.jac_orig(p.x, pdata)
        d = p.y / p.s
        wc, bnd = nlp.split_canonical_sq(d)
        schur_diag = nlp.jtdj_diag(Jc, d)
        return Factor(Jc=self._store_jc(Jc), H=jnp.zeros((0, 0), self.dtype),
                      Q=(wc, bnd, self._store_jc(Jc)),
                      schur_diag=schur_diag.astype(self.dtype),
                      L=prev.L, D=prev.D, delta=prev.delta,
                      s_f=p.s, y_f=p.y, ok=jnp.asarray(False))

    def _store_q(self, Q):
        dt = self.dtype
        return (jnp.zeros(0, dt), jnp.zeros(0, dt), jnp.zeros((0, 0), dt))

    def _fact_q(self, fact: Factor):
        wc, bnd = self.nlp.split_canonical_sq(fact.y_f / fact.s_f)
        return (wc, bnd, self._fact_jc(fact))

    def factor(self, Q, delta, rescale=None, fact=None):
        wc, bnd, jc = Q
        jc = self._Jc_const if self._Jc_const is not None else jc
        fdt = self.factor_store_dtype
        dtil = bnd + jnp.asarray(delta).astype(bnd.dtype)
        ok_d = jnp.all(dtil > 0.0)
        d_inv = jnp.where(dtil > 0.0, 1.0 / dtil, 0.0).astype(fdt)
        # W^-1 with an underflow floor: wc = folded y/s sums are strictly
        # positive, but f32 underflow would poison S with inf
        w = jnp.maximum(wc, jnp.finfo(wc.dtype).tiny * 1e4).astype(fdt)
        A = jc.astype(fdt)
        S = (A * d_inv[None, :]) @ A.T
        S = S + jnp.diag(1.0 / w)
        Ls, ok_s = self._chol_ok(S)
        # constant (folded) Jacobians are read from the fold in chol_solve,
        # not carried per instance in the factor operator
        A_store = jnp.zeros((0, 0), fdt) if self._Jc_const is not None else A
        return ((Ls, d_inv, A_store), jnp.ones(1, fdt)), ok_d & ok_s

    def finalize_solver(self, L):
        from ..ops.cholesky import xla_chol_inv_from_L
        Ls, d_inv, A = L
        return (xla_chol_inv_from_L(Ls), d_inv, A)

    def chol_solve(self, L, b):
        S_inv, d_inv, A = L
        if self._Jc_const is not None:
            A = self._Jc_const.astype(d_inv.dtype)
        out_dt = b.dtype
        z = b.astype(d_inv.dtype) * d_inv
        u = S_inv @ (A @ z)
        return (z - d_inv * (A.T @ u)).astype(out_dt)

    def _empty_factor(self) -> Factor:
        n, m = self.n, self.m
        dt = self.dtype
        fdt = self.factor_store_dtype
        mo = self.nlp.m_orig
        jshape = (0, 0) if self._Jc_const is not None else (mo, n)
        return Factor(Jc=self._store_jc(jnp.zeros((mo, n), dt)),
                      H=jnp.zeros((0, 0), dt),
                      Q=self._store_q(None),
                      schur_diag=jnp.zeros(n, dt),
                      L=(jnp.eye(mo, dtype=fdt), jnp.ones(n, fdt),
                         jnp.zeros(jshape, fdt)),
                      D=jnp.ones(1, fdt),
                      delta=jnp.asarray(0.0, dt),
                      s_f=jnp.ones(m, dt), y_f=jnp.ones(m, dt),
                      ok=jnp.asarray(False))


def make_kernel(nlp: CanonNLP, pars: Params) -> OnePhaseKernel:
    """Kernel factory: dispatch kkt.kkt_solver_type to the implementing
    class (schur_dual is a subclass, not a branch of the dense kernel)."""
    if pars.kkt.kkt_solver_type == "schur_dual":
        return SchurDualKernel(nlp, pars)
    return OnePhaseKernel(nlp, pars)
