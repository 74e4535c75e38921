"""SchurDualKernel (ipm/dual.py): Woodbury/normal-equations LP path.

Scope pinned by results/sparse_lane_analysis.md: exact in f64 on
feasible-dominant LP workloads (m_orig < n, finite bounds); the f32 lane
and infeasible endgames are outside the supported envelope (the
W^-1-cancellation bound measured there), so tests cover the f64 contract
and the solve-operator algebra, not the excluded regimes.
"""
import numpy as np
import pytest

from onephase_tpu import one_phase_solve
from onephase_tpu.config import Params
from onephase_tpu.models.lp import LPData

INF = np.inf


def _lp(seed=0, m=24, n=48):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.3)
    A[np.all(A == 0.0, axis=1), 0] = 1.0
    x_feas = rng.random(n)
    b = A @ x_feas
    return LPData(
        cvec=rng.normal(size=n), A=A,
        lcon=b - 1.0, ucon=b + 1.0,
        lvar=np.full(n, -5.0), uvar=np.full(n, 5.0), name=f"lp{seed}")


def test_dual_matches_primal_f64():
    for seed in range(3):
        d = _lp(seed)
        rp = one_phase_solve(d.to_spec(), options={"output_level": 0})
        rd = one_phase_solve(d.to_spec(), options={
            "output_level": 0, "kkt.kkt_solver_type": "schur_dual"})
        assert rp.status == "Optimal" and rd.status == "Optimal"
        assert rd.obj == pytest.approx(rp.obj, rel=1e-7, abs=1e-8)
        np.testing.assert_allclose(rd.x, rp.x, atol=1e-5)


def test_dual_solve_operator_algebra():
    """chol_solve applies (diag(bnd+delta) + Jc^T diag(wc) Jc)^-1 exactly
    (up to roundoff) — checked against a dense solve."""
    import jax.numpy as jnp

    from onephase_tpu.ipm.dual import SchurDualKernel
    from onephase_tpu.nlp import canonicalize

    d = _lp(1, m=10, n=20)
    pars = Params().with_overrides({
        "output_level": 0, "kkt.kkt_solver_type": "schur_dual"})
    kern = SchurDualKernel(canonicalize(d.to_spec()), pars)
    rng = np.random.default_rng(2)
    m, n = kern.nlp.m, kern.n
    dvec = jnp.asarray(np.abs(rng.normal(size=m)) + 0.1, kern.dtype)
    wc, bnd = kern.nlp.split_canonical_sq(dvec)
    Jc = kern.nlp.jac_orig(jnp.asarray(kern.nlp.x0, kern.dtype))
    delta = 1e-3
    (Lraw, D), ok = kern.factor((wc, bnd, Jc), delta)
    assert bool(ok)
    op = kern.finalize_solver(Lraw)
    b = jnp.asarray(rng.normal(size=n), kern.dtype)
    x = kern.chol_solve(op, b)
    Q = (np.asarray(Jc) * np.asarray(wc)[:, None]).T @ np.asarray(Jc) \
        + np.diag(np.asarray(bnd) + delta)
    np.testing.assert_allclose(np.asarray(Q @ x), np.asarray(b),
                               rtol=1e-8, atol=1e-8)


def test_dual_gating():
    # non-zero-Hessian problems are rejected
    from onephase_tpu.nlp import NLPSpec, canonicalize
    import jax.numpy as jnp

    from onephase_tpu.ipm.dual import SchurDualKernel
    spec = NLPSpec(
        f=lambda x: jnp.sum(x ** 2), c=lambda x: x[:1],
        lcon=np.array([-1.0]), ucon=np.array([1.0]),
        lvar=np.full(2, -2.0), uvar=np.full(2, 2.0), x0=np.zeros(2))
    pars = Params().with_overrides({
        "output_level": 0, "kkt.kkt_solver_type": "schur_dual"})
    with pytest.raises(ValueError):
        SchurDualKernel(canonicalize(spec), pars)
