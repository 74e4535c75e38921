"""Cross-KKT-solver consistency: schur vs symmetric (LDL^T) directions.

The reference's key cross-implementation oracle
(test/kkt_system_solvers.jl:61-181): for toy LPs, one affine direction per
KKT solver config, pairwise agreement < 1e-6 on dx, dy, ds.  Plus the
config-matrix end-to-end sweep (runtests.jl:150-194).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu import one_phase_solve
from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.models import zoo
from onephase_tpu.nlp import canonicalize
from onephase_tpu.ops import ldlt as ldlt_mod

PROBS = [zoo.toy_lp1, zoo.toy_lp3, zoo.toy_lp5, zoo.toy_lp7, zoo.rosenbrook2,
         zoo.circle1]


def test_ldlt_kernel():
    rng = np.random.default_rng(0)
    n, m = 6, 4
    Hm = rng.normal(size=(n, n))
    Hm = Hm @ Hm.T + np.eye(n)          # PD block
    J = rng.normal(size=(m, n))
    C = np.diag(rng.random(m) + 0.5)    # PD block
    K = np.block([[Hm, J.T], [J, -C]])  # quasi-definite: inertia (n, m)
    L, d = ldlt_mod.ldlt(jnp.asarray(K))
    rec = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    np.testing.assert_allclose(rec, K, atol=1e-8)
    assert bool(ldlt_mod.inertia_status(d, n, m))
    assert not bool(ldlt_mod.inertia_status(d, n + 1, m - 1))
    b = rng.normal(size=n + m)
    x = np.asarray(ldlt_mod.ldlt_solve(L, d, jnp.asarray(b)))
    np.testing.assert_allclose(K @ x, b, atol=1e-8)


@pytest.mark.parametrize("prob", PROBS, ids=[p.__name__ for p in PROBS])
def test_direction_agreement(prob, base_pars):
    nlp = canonicalize(prob())
    dirs = {}
    for solver in ("schur", "symmetric"):
        pars = base_pars.with_overrides({"kkt!kkt_solver_type": solver})
        k = OnePhaseKernel(nlp, pars)
        st = k.initial_state()
        fact = k.form_factor(st.p, st.cache, st.fact)
        delta = 1e-8
        LD, ok = k.factor(fact.Q, delta)
        assert bool(ok), solver
        fact = fact._replace(L=LD[0], D=LD[1],
                             delta=jnp.asarray(delta, k.dtype))
        d, ratio = k.compute_direction(fact, st.p, st.cache, 0.0, 0.0, 0.0)
        dirs[solver] = d
        assert float(ratio) < 1e-6, solver
    for field in ("x", "y", "s"):
        a = np.asarray(getattr(dirs["schur"], field))
        b = np.asarray(getattr(dirs["symmetric"], field))
        scale = 1.0 + np.abs(a).max()
        assert np.abs(a - b).max() / scale < 1e-6, field


@pytest.mark.parametrize("prob,expect", [
    (zoo.toy_lp1, "Optimal"), (zoo.toy_lp5, "Optimal"),
    (zoo.toy_lp_inf2, "primal_infeasible"), (zoo.circle_nc1, "Optimal")])
def test_end_to_end_symmetric(prob, expect, base_pars):
    pars = base_pars.with_overrides({"kkt!kkt_solver_type": "symmetric"})
    r = one_phase_solve(prob(), pars)
    assert r.status == expect


@pytest.mark.parametrize("prob,expect", [
    (zoo.toy_lp1, "Optimal"), (zoo.circle_nc1, "Optimal"),
    (zoo.toy_lp_inf2, "primal_infeasible")])
def test_mehrotra_init(prob, expect, base_pars):
    pars = base_pars.with_overrides({"init!init_style": "mehrotra"})
    r = one_phase_solve(prob(), pars)
    assert r.status == expect


@pytest.mark.parametrize("prob", [zoo.toy_lp5, zoo.toy_lp6],
                         ids=["toy_lp5", "toy_lp6"])
def test_clever_direction_agreement(prob, base_pars):
    """clever_symmetric reduced system reproduces the schur direction on the
    parallel-row LPs built to exercise it (problems.jl:222-296)."""
    nlp = canonicalize(prob())
    dirs = {}
    for solver in ("schur", "clever_symmetric"):
        pars = base_pars.with_overrides({"kkt!kkt_solver_type": solver})
        k = OnePhaseKernel(nlp, pars)
        if solver == "clever_symmetric":
            assert k.mr < k.m  # the parallel rows actually merged
        st = k.initial_state()
        fact = k.form_factor(st.p, st.cache, st.fact)
        delta = 1e-8
        LD, ok = k.factor(fact.Q, delta)
        assert bool(ok), solver
        fact = fact._replace(L=LD[0], D=LD[1],
                             delta=jnp.asarray(delta, k.dtype))
        d, ratio = k.compute_direction(fact, st.p, st.cache, 0.0, 0.0, 0.0)
        assert float(ratio) < 1e-6, (solver, float(ratio))
        dirs[solver] = d
    for field in ("x", "y", "s"):
        a = np.asarray(getattr(dirs["schur"], field))
        b = np.asarray(getattr(dirs["clever_symmetric"], field))
        scale = 1.0 + np.abs(a).max()
        assert np.abs(a - b).max() / scale < 1e-6, field


@pytest.mark.parametrize("prob,expect", [
    (zoo.toy_lp5, "Optimal"), (zoo.toy_lp6, "Optimal"),
    (zoo.toy_lp_inf2, "primal_infeasible")])
def test_end_to_end_clever(prob, expect, base_pars):
    pars = base_pars.with_overrides(
        {"kkt!kkt_solver_type": "clever_symmetric"})
    r = one_phase_solve(prob(), pars)
    assert r.status == expect
