"""Scenario-structured solver tests: arrow-KKT IPM vs the generic kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.ipm.state import OPTIMAL, RUNNING
from onephase_tpu.nlp import canonicalize
from onephase_tpu.parallel.scenario import ScenarioKernel, TwoStageSpec


def make_two_stage(K=4, nz=3, nx=4, seed=0):
    """Two-stage QP: first-stage cost + per-scenario recourse QPs with
    coupling constraints ck = Ak xk + Gk z - bk >= 0."""
    rng = np.random.default_rng(seed)
    Ak = jnp.asarray(rng.normal(size=(K, 2, nx)))
    Gk = jnp.asarray(rng.normal(size=(K, 2, nz)) * 0.5)
    bk = jnp.asarray(rng.normal(size=(K, 2)) * 0.1)
    Pk = rng.normal(size=(K, nx, nx))
    Pk = jnp.asarray(np.einsum("kij,klj->kil", Pk, Pk) / nx
                     + np.eye(nx) * 0.5)
    qk = jnp.asarray(rng.normal(size=(K, nx)))

    data = {"A": Ak, "G": Gk, "b": bk, "P": Pk, "q": qk}

    def f0(z):
        return 0.5 * jnp.sum(z ** 2) + 0.1 * jnp.sum(z)

    def fk(xk, z, d):
        return 0.5 * xk @ d["P"] @ xk + d["q"] @ xk + 0.2 * jnp.dot(z, z)

    def ck(xk, z, d):
        return d["A"] @ xk + d["G"] @ z - d["b"]

    return TwoStageSpec(
        f0=f0, fk=fk, ck=ck, data=data, K=K, nz=nz, nx=nx, mc=2,
        lcon=np.zeros(2), ucon=np.full(2, np.inf),
        lz=np.full(nz, -5.0), uz=np.full(nz, 5.0),
        lx=np.full(nx, -10.0), ux=np.full(nx, 10.0),
        z0=np.zeros(nz), x0=np.zeros(nx), name="two_stage_qp")


def _pars():
    return Params().with_overrides({
        "output_level": 0, "term.max_it": 100, "chunk_size": 100,
        "history_capacity": 2})


def test_scenario_direction_matches_generic():
    spec = make_two_stage()
    pars = _pars()
    sk = ScenarioKernel(spec, pars)
    gk = OnePhaseKernel(canonicalize(spec.to_nlpspec()), pars)

    st_s = sk.initial_state()
    st_g = gk.initial_state()
    np.testing.assert_allclose(np.asarray(st_s.p.x), np.asarray(st_g.p.x),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_s.p.y), np.asarray(st_g.p.y),
                               atol=1e-9)

    f_s = sk.form_factor(st_s.p, st_s.cache, st_s.fact)
    f_g = gk.form_factor(st_g.p, st_g.cache, st_g.fact)
    np.testing.assert_allclose(np.asarray(f_s.schur_diag),
                               np.asarray(f_g.schur_diag), atol=1e-8)

    delta = 1e-8
    LD_s, ok_s = sk.factor(f_s.Q, delta)
    LD_g, ok_g = gk.factor(f_g.Q, delta)
    assert bool(ok_s) and bool(ok_g)
    f_s = f_s._replace(L=LD_s[0], D=LD_s[1],
                       delta=jnp.asarray(delta, sk.dtype))
    f_g = f_g._replace(L=LD_g[0], D=LD_g[1],
                       delta=jnp.asarray(delta, gk.dtype))
    d_s, r_s = sk.compute_direction(f_s, st_s.p, st_s.cache, 0.0, 0.0, 0.0)
    d_g, r_g = gk.compute_direction(f_g, st_g.p, st_g.cache, 0.0, 0.0, 0.0)
    for fld in ("x", "y", "s"):
        a, b = np.asarray(getattr(d_s, fld)), np.asarray(getattr(d_g, fld))
        assert np.abs(a - b).max() / (1 + np.abs(a).max()) < 1e-7, fld
    assert float(r_s) < 1e-8


def test_scenario_end_to_end_matches_generic():
    spec = make_two_stage()
    pars = _pars()
    sk = ScenarioKernel(spec, pars)
    st = sk.initial_state()
    st = sk.run_chunk(st)
    assert int(st.status) == OPTIMAL

    from onephase_tpu import one_phase_solve
    r = one_phase_solve(canonicalize(spec.to_nlpspec()), pars)
    assert r.status == "Optimal"
    x_s = np.asarray(st.p.x)
    np.testing.assert_allclose(x_s, r.x, atol=1e-5)
    # same iteration count: the structured path reproduces the trajectory
    assert abs(int(st.t) - 1 - r.iterations) <= 1
