"""Shape-bucketed heterogeneous LP sweep (parallel/buckets.py).

Checks that a mixed-shape dict of LPs — different n/m, missing bound sides,
fixed variables, equality rows, an infeasible instance — solved as padded
parametric batches agrees with the single-problem solver.
"""

import numpy as np
import pytest

from onephase_tpu import one_phase_solve
from onephase_tpu.config import Params
from onephase_tpu.models.lp import LPData
from onephase_tpu.parallel.buckets import (bucket_shapes, eliminate_fixed,
                                           pad_lp, solve_bucketed)

INF = np.inf


def _problems():
    ps = {}
    # 1) simple bounded LP: min -x1-x2, x1+x2<=1, x>=0 -> obj -1
    ps["simplex2"] = LPData(
        cvec=np.array([-1.0, -1.0]), A=np.array([[1.0, 1.0]]),
        lcon=np.array([-INF]), ucon=np.array([1.0]),
        lvar=np.zeros(2), uvar=np.full(2, INF))
    # 2) equality row + fixed variable: min x+y+z, x+y+z=2, z==0.5, 0<=x,y<=2
    ps["eq_fix3"] = LPData(
        cvec=np.array([1.0, 2.0, 3.0]),
        A=np.array([[1.0, 1.0, 1.0]]),
        lcon=np.array([2.0]), ucon=np.array([2.0]),
        lvar=np.array([0.0, 0.0, 0.5]), uvar=np.array([2.0, 2.0, 0.5]))
    # 3) larger shape class: min sum x, Ax >= b elementwise
    rng = np.random.default_rng(0)
    A = np.abs(rng.normal(size=(4, 12))) + 0.1
    ps["wide12"] = LPData(
        cvec=np.ones(12), A=A,
        lcon=np.ones(4), ucon=np.full(4, INF),
        lvar=np.zeros(12), uvar=np.full(12, INF))
    # 4) infeasible: x >= 1 (bound) and x <= 0 (row)
    ps["infeas1"] = LPData(
        cvec=np.array([1.0]), A=np.array([[1.0]]),
        lcon=np.array([-INF]), ucon=np.array([0.0]),
        lvar=np.array([1.0]), uvar=np.array([INF]))
    return ps


def test_eliminate_fixed():
    d = _problems()["eq_fix3"]
    red, xf, free = eliminate_fixed(d)
    assert red.n == 2 and xf[2] == 0.5 and list(free) == [0, 1]
    np.testing.assert_allclose(red.lcon, [1.5])
    assert red.c0 == pytest.approx(1.5)


def test_pad_neutral():
    d = _problems()["simplex2"]
    p = pad_lp(d, 8, 4)
    assert p.A.shape == (4, 8)
    assert np.isfinite(p.lcon).all() and np.isfinite(p.uvar).all()
    # pad rows/vars neutral
    assert (p.A[1:] == 0).all() and (p.cvec[2:] == 0).all()


def test_bucket_shapes_grouping():
    ps = _problems()
    datas = [eliminate_fixed(d)[0] for d in ps.values()]
    buckets = bucket_shapes(datas, round_to=8)
    assert sum(len(v) for v in buckets.values()) == len(datas)
    assert len(buckets) >= 2  # wide12 separates from the tiny ones


def test_solve_bucketed_matches_singles():
    ps = _problems()
    pars = Params().with_overrides({"output_level": 0, "term.max_it": 200})
    res = solve_bucketed(ps, pars, round_to=8)
    assert set(res) == set(ps)

    assert res["infeas1"].status == "primal_infeasible"

    for name in ("simplex2", "eq_fix3", "wide12"):
        r = res[name]
        assert r.status == "Optimal", name
        single = one_phase_solve(ps[name].to_spec(),
                                 options={"output_level": 0})
        assert single.status == "Optimal", name
        assert r.obj == pytest.approx(single.obj, rel=1e-5, abs=1e-6), name
        np.testing.assert_allclose(r.x, single.x, atol=1e-4)
        assert r.max_violation < 1e-6

    # known argmins
    assert res["simplex2"].obj == pytest.approx(-1.0, abs=1e-5)
    assert res["eq_fix3"].obj == pytest.approx(1.5 + 1.5, abs=1e-4)  # x=1.5,y=0,z=.5


def test_stall_exit_releases_straggler():
    """term.stall_patience: an instance with no mu+violation progress exits
    as STALLED well before max_it, and converging instances are untouched
    (same statuses/objs as the patience-off run)."""
    import jax.numpy as jnp

    ps = _problems()
    base = {"output_level": 0, "term.max_it": 200}
    pars_off = Params().with_overrides(base)
    pars_on = Params().with_overrides({**base, "term.stall_patience": 20})
    res_off = solve_bucketed(ps, pars_off, round_to=8, dtype=jnp.float64)
    res_on = solve_bucketed(ps, pars_on, round_to=8, dtype=jnp.float64)
    for name in ps:
        assert res_on[name].status == res_off[name].status, name
        if res_on[name].status == "Optimal":
            assert res_on[name].obj == pytest.approx(res_off[name].obj,
                                                     rel=1e-6, abs=1e-8)

    # a genuinely stalling instance: tol far below the f32 floor in f32
    # arithmetic -> mu bottoms out, patience fires long before max_it
    stall = {"hard": LPData(
        cvec=np.array([-1.0, -1.0]), A=np.array([[1.0, 1.0]]),
        lcon=np.array([-INF]), ucon=np.array([1.0]),
        lvar=np.zeros(2), uvar=np.full(2, INF))}
    pars_tight = Params().with_overrides({
        "output_level": 0, "term.max_it": 500, "term.tol_opt": 1e-14,
        "term.stall_patience": 20})
    r = solve_bucketed(stall, pars_tight, round_to=8,
                       dtype=jnp.float32)["hard"]
    assert r.status in ("STALLED", "MAX_DELTA"), r.status
    assert r.iterations < 450, r.iterations
