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


from onephase_tpu.models.examples import two_stage_qp as make_two_stage


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


def test_scenario_sharded_matches_unsharded():
    """GSPMD scenario sharding: K=8 scenarios over an 8-device blk mesh
    must reproduce the unsharded trajectory, and the compiled program must
    contain a cross-device reduction for the border assembly."""
    from onephase_tpu.parallel.mesh import make_mesh

    spec = make_two_stage(K=8)
    pars = _pars()
    mesh = make_mesh(8, axis="blk")
    sk_sharded = ScenarioKernel(make_two_stage(K=8), pars, mesh=mesh)
    sk_plain = ScenarioKernel(spec, pars)

    st_s = sk_sharded.initial_state()
    st_p = sk_plain.initial_state()
    st_s = sk_sharded.run_chunk(st_s)
    st_p = sk_plain.run_chunk(st_p)
    assert int(st_s.status) == OPTIMAL
    assert int(st_p.status) == OPTIMAL
    np.testing.assert_allclose(np.asarray(st_s.p.x), np.asarray(st_p.p.x),
                               atol=1e-7)
    assert int(st_s.t) == int(st_p.t)

    # the factor path really communicates: border sums become all-reduces
    hlo = sk_sharded.run_chunk.lower(st_s).compile().as_text()
    assert "all-reduce" in hlo


def test_scenario_sharded_rejects_indivisible_k():
    from onephase_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError):
        ScenarioKernel(make_two_stage(K=6), _pars(),
                       mesh=make_mesh(8, axis="blk"))


def test_scenario_direction_matches_generic_at_scale():
    """VERDICT item 6: past-toy scale — K=64 scenarios, nx=64 locals,
    mc=32 coupling rows (flat n = 16 + 64*64 = 4112).  The arrow path must
    agree with the dense generic kernel's direction without ever forming
    the 4112^2 Schur complement."""
    spec = make_two_stage(K=64, nz=16, nx=64, mc=32)
    pars = _pars()
    sk = ScenarioKernel(spec, pars)
    gk = OnePhaseKernel(canonicalize(spec.to_nlpspec()), pars)

    st_s = sk.initial_state()
    st_g = gk.initial_state()
    np.testing.assert_allclose(np.asarray(st_s.p.x), np.asarray(st_g.p.x),
                               atol=1e-9)

    f_s = sk.form_factor(st_s.p, st_s.cache, st_s.fact)
    f_g = gk.form_factor(st_g.p, st_g.cache, st_g.fact)
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
        assert np.abs(a - b).max() / (1 + np.abs(a).max()) < 1e-6, fld
    assert float(r_s) < 1e-8


def test_scenario_full_solve_at_scale():
    """Full structured IPM at K=64/nx=64/mc=32 terminates Optimal."""
    spec = make_two_stage(K=64, nz=16, nx=64, mc=32)
    sk = ScenarioKernel(spec, _pars())
    st = sk.run_chunk(sk.initial_state())
    assert int(st.status) == OPTIMAL


def test_tax_grouped_structured_matches_dense():
    """ECON-style block-angular model (VERDICT item 6): the grouped
    Mirrlees design solves identically on the arrow path and the dense
    generic kernel."""
    from onephase_tpu.models.tax import tax_grouped

    spec = tax_grouped(G=4, na_g=6)
    pars = _pars()
    sk = ScenarioKernel(spec, pars)
    st = sk.run_chunk(sk.initial_state())
    assert int(st.status) == OPTIMAL

    from onephase_tpu import one_phase_solve
    r = one_phase_solve(canonicalize(spec.to_nlpspec()), pars)
    assert r.status == "Optimal"
    np.testing.assert_allclose(np.asarray(st.p.x), r.x, atol=1e-5)
    assert abs(int(st.t) - 1 - r.iterations) <= 1
