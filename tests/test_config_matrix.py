"""Parameter-variant robustness: filter types, dual LS modes, dual-scale
modes, agg-gamma strategies (reference: parameter-sweep campaigns,
benchmark/CUTEst/run_one_phase.jl + test config matrix runtests.jl:150-194).
"""

import pytest

from onephase_tpu import one_phase_solve
from onephase_tpu.models import zoo


@pytest.mark.parametrize("ftype", ["default", "test1", "test2", "test3"])
def test_filter_types(ftype, base_pars):
    pars = base_pars.with_overrides({"ls!filter_type": ftype})
    r = one_phase_solve(zoo.circle_nc1(), pars)
    assert r.status == "Optimal"
    assert abs(r.x[0] - 1.0) < 1e-3


@pytest.mark.parametrize("dls", [0, 1, 2, 3])
def test_dual_ls_modes(dls, base_pars):
    pars = base_pars.with_overrides({"ls!dual_ls": dls})
    r = one_phase_solve(zoo.toy_lp1(), pars)
    assert r.status == "Optimal"
    assert abs(r.x[1] - 1.0) < 1e-3


@pytest.mark.parametrize("mode", ["max_dual", "ipopt", "sqrt", "exact"])
def test_dual_scale_modes(mode, base_pars):
    pars = base_pars.with_overrides({"term!dual_scale_mode": mode})
    r = one_phase_solve(zoo.circle1(), pars)
    assert r.status == "Optimal"


@pytest.mark.parametrize("gamma", ["mehrotra", "mehrotra_stb", "affine",
                                   "constant"])
def test_agg_gamma_modes(gamma, base_pars):
    pars = base_pars.with_overrides({"ls!agg_gamma": gamma})
    r = one_phase_solve(zoo.toy_lp3(), pars)
    assert r.status == "Optimal"
    assert abs(r.x[0]) < 1e-3


def test_corrections_count(base_pars):
    for nc in (1, 3):
        pars = base_pars.with_overrides({"max_it_corrections": nc})
        r = one_phase_solve(zoo.circle_nc2(), pars)
        assert r.status == "Optimal", nc


def test_superlinear_mode(base_pars):
    pars = base_pars.with_overrides({"superlinear_theory_mode": True})
    r = one_phase_solve(zoo.circle1(), pars)
    assert r.status == "Optimal"


def test_primal_bounds_dual_feas_switch(base_pars):
    pars = base_pars.with_overrides({"primal_bounds_dual_feas": True})
    r = one_phase_solve(zoo.toy_lp1(), pars)
    assert r.status == "Optimal"
