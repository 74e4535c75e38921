"""Round-2 parity closures: dual-scale modes, line-search acceptance modes,
clever-symmetric rescaling, coupled primal/dual steps, eigh backend,
throw_error_nans, adaptive refinement, batched-semantics knobs.

Reference anchors:
- primal_dual dual scale     src/IPM/IPM_tools.jl:17-18
- accept_kkt / accept_stable src/line_search/kkt_ls.jl, stable_ls.jl
- accept_comp                src/line_search/line_search.jl:26-34,54-55
  (Class_comp_ls is undefined in the reference — see PARITY.md)
- kkt_system_rescale         src/kkt_system_solver/clever_symmetric.jl:310-338
- move_primal_seperate_to_dual src/line_search/line_search.jl:100-104
- Eval_NaN_error             src/utils/eval.jl:21-51
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu import one_phase_solve, EvalNaNError
from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.models import zoo
from onephase_tpu.nlp import canonicalize


def _solve(prob, opts):
    return one_phase_solve(prob, options={
        "output_level": 0, "term!max_it": 81, **opts})


# ---------------------------------------------------------------------------
# line-search acceptance modes.  accept_filter / accept_stable carry merit
# control and must solve the nonconvex zoo; accept_kkt (filter-only,
# kkt_ls.jl) and accept_comp (predicted-complementarity, line_search.jl:26-34)
# are non-default research variants without merit control — on nonconvex
# problems they can stall (KKT error is non-monotone along good steps), so
# they are only required to solve the convex problems (see PARITY.md).
@pytest.mark.parametrize("mode", ["accept_filter", "accept_stable"])
def test_ls_modes_solve(mode):
    r = _solve(zoo.rosenbrook2(), {"ls.ls_mode_stable": mode})
    assert r.status == "Optimal"
    assert abs(r.x[0] - 2.0) < 1e-3 and abs(r.x[1] - 4.0) < 1e-3
    r2 = _solve(zoo.toy_lp1(), {"ls.ls_mode_stable": mode})
    assert r2.status == "Optimal"


@pytest.mark.parametrize("mode", ["accept_kkt", "accept_comp"])
def test_ls_modes_research_variants(mode):
    r = _solve(zoo.toy_lp1(), {"ls.ls_mode_stable": mode})
    assert r.status == "Optimal"
    r2 = _solve(zoo.circle1(), {"ls.ls_mode_stable": mode})
    assert r2.status == "Optimal"


def test_ls_mode_infeasible_certificate():
    """Acceptance variants must not break the infeasibility certificate."""
    r = _solve(zoo.toy_lp_inf1(), {"ls.ls_mode_stable": "accept_kkt"})
    assert r.status == "primal_infeasible"


# ---------------------------------------------------------------------------
# dual-scale modes
@pytest.mark.parametrize("mode", ["max_dual", "ipopt", "sqrt", "exact",
                                  "primal_dual"])
def test_dual_scale_modes_solve(mode):
    r = _solve(zoo.circle1(), {"term.dual_scale_mode": mode})
    assert r.status == "Optimal"
    assert abs(r.x[0] - 1.0) < 1e-3


def test_primal_dual_scale_value():
    """thr / max(sqrt(||y||inf * ||s||inf), thr) (IPM_tools.jl:17-18)."""
    pars = Params().with_overrides({"term.dual_scale_mode": "primal_dual",
                                    "output_level": 0})
    k = OnePhaseKernel(canonicalize(zoo.toy_lp1()), pars)
    y = jnp.asarray([300.0, 1.0, 2.0])
    s = jnp.asarray([4.0, 300.0, 1.0])
    want = 100.0 / max(np.sqrt(300.0 * 300.0), 100.0)
    got = float(k.dual_scale(y[: k.m], s[: k.m])) if k.m <= 3 else None
    if got is not None:
        np.testing.assert_allclose(
            got, 100.0 / max(float(jnp.sqrt(jnp.max(jnp.abs(y[:k.m]))
                                            * jnp.max(jnp.abs(s[:k.m])))),
                             100.0))
    # direct formula check on explicit vectors
    k2 = OnePhaseKernel(canonicalize(zoo.toy_lp5()), pars)
    yv = jnp.full(k2.m, 300.0)
    sv = jnp.full(k2.m, 300.0)
    np.testing.assert_allclose(float(k2.dual_scale(yv, sv)), 100.0 / 300.0)
    _ = want


# ---------------------------------------------------------------------------
# coupled primal/dual step-size check
def test_move_primal_coupled():
    r = _solve(zoo.rosenbrook2(), {"ls.move_primal_seperate_to_dual": False})
    assert r.status == "Optimal"
    assert abs(r.x[0] - 2.0) < 1e-3


# ---------------------------------------------------------------------------
# clever-symmetric diagonal rescaling
@pytest.mark.parametrize("rmode", ["none", "u_only", "u_and_x"])
def test_clever_rescale_solves(rmode):
    r = _solve(zoo.toy_lp5(), {"kkt.kkt_solver_type": "clever_symmetric",
                               "kkt.kkt_system_rescale": rmode})
    assert r.status == "Optimal"


def test_clever_rescale_direction_parity(base_pars):
    """The rescaled solve is the same linear system — directions must agree
    with the unrescaled path to solver precision."""
    dirs = {}
    for rmode in ("none", "u_only", "u_and_x"):
        pars = base_pars.with_overrides({
            "kkt.kkt_solver_type": "clever_symmetric",
            "kkt.kkt_system_rescale": rmode})
        k = OnePhaseKernel(canonicalize(zoo.toy_lp5()), pars)
        st = k.initial_state()
        fact = k.form_factor(st.p, st.cache, st.fact)
        (L, D), ok = k.factor(fact.Q, 1e-8, fact.rescale)
        assert bool(ok)
        fact = fact._replace(L=L, D=D, delta=jnp.asarray(1e-8, k.dtype))
        d, ratio = k.compute_direction(fact, st.p, st.cache, 0.0, 0.0, 0.0)
        assert float(ratio) < 1e-6
        dirs[rmode] = d
    for rmode in ("u_only", "u_and_x"):
        for leaf in ("x", "y", "s"):
            a = np.asarray(getattr(dirs["none"], leaf))
            b = np.asarray(getattr(dirs[rmode], leaf))
            scale = 1.0 + np.abs(a).max()
            assert np.abs(a - b).max() / scale < 1e-6, (rmode, leaf)


# ---------------------------------------------------------------------------
# eigh (spectral) backend on the symmetric path
def test_eigh_backend_direction_and_solve(base_pars):
    pars = base_pars.with_overrides({"kkt.kkt_solver_type": "symmetric",
                                     "kkt.linear_solver_type": "eigh"})
    k = OnePhaseKernel(canonicalize(zoo.toy_lp2()), pars)
    st = k.initial_state()
    fact = k.form_factor(st.p, st.cache, st.fact)
    (V, w), ok = k.factor(fact.Q, 1e-8)
    assert bool(ok)
    # inertia counts from eigenvalues: n positive, m negative
    assert int(jnp.sum(w > 0)) == k.n and int(jnp.sum(w < 0)) == k.mr
    fact = fact._replace(L=V, D=w, delta=jnp.asarray(1e-8, k.dtype))
    d, ratio = k.compute_direction(fact, st.p, st.cache, 0.0, 0.0, 0.0)
    assert float(ratio) < 1e-8

    r = _solve(zoo.toy_lp2(), {"kkt.kkt_solver_type": "symmetric",
                               "kkt.linear_solver_type": "eigh"})
    assert r.status == "Optimal"


# ---------------------------------------------------------------------------
# throw_error_nans wiring
def test_throw_error_nans_clean_solve():
    r = _solve(zoo.circle1(), {"throw_error_nans": True})
    assert r.status == "Optimal"


def test_state_has_nan_detects():
    from onephase_tpu.solver import _state_has_nan
    k = OnePhaseKernel(canonicalize(zoo.toy_lp1()),
                       Params().with_overrides({"output_level": 0}))
    st = k.initial_state()
    assert not _state_has_nan(st)
    bad = st._replace(p=st.p._replace(x=st.p.x.at[0].set(jnp.nan)))
    assert _state_has_nan(bad)


# ---------------------------------------------------------------------------
# adaptive iterative refinement (ADVICE r1): same direction as fixed-count
def test_it_refine_adaptive_direction(base_pars):
    dirs = {}
    for adaptive in (False, True):
        pars = base_pars.with_overrides({"kkt.it_refine_adaptive": adaptive})
        k = OnePhaseKernel(canonicalize(zoo.toy_lp3()), pars)
        st = k.initial_state()
        fact = k.form_factor(st.p, st.cache, st.fact)
        (L, D), ok = k.factor(fact.Q, 1e-8)
        assert bool(ok)
        fact = fact._replace(L=L, D=D, delta=jnp.asarray(1e-8, k.dtype))
        d, ratio = k.compute_direction(fact, st.p, st.cache, 0.0, 0.0, 0.0)
        assert float(ratio) < 1e-8
        dirs[adaptive] = d
    for leaf in ("x", "y", "s"):
        a = np.asarray(getattr(dirs[False], leaf))
        b = np.asarray(getattr(dirs[True], leaf))
        assert np.abs(a - b).max() / (1.0 + np.abs(a).max()) < 1e-9


# ---------------------------------------------------------------------------
# pallas_fused_q_tri parity (ADVICE r1), interpret mode
def test_pallas_fused_q_tri_parity():
    from onephase_tpu.ops.schur import pallas_fused_q_tri, xla_fused_q
    rng = np.random.default_rng(7)
    m, n = 96, 130
    Jc = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    wc = jnp.asarray(rng.uniform(0.5, 2.0, size=m).astype(np.float32))
    H = rng.normal(size=(n, n)).astype(np.float32)
    H = jnp.asarray(H + H.T)
    bnd = jnp.asarray(rng.uniform(0.0, 1.0, size=n).astype(np.float32))
    want = np.asarray(xla_fused_q(Jc, wc, H, bnd))
    got = np.asarray(pallas_fused_q_tri(Jc, wc, H, bnd, interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-6)


# ---------------------------------------------------------------------------
# batched-semantics knobs (de-forked, explicit)
def test_batch_step_attempts_knob():
    from onephase_tpu.parallel.batch import BatchSolver
    nlp = canonicalize(zoo.rosenbrook2())
    b_default = BatchSolver(nlp, Params().with_overrides({"output_level": 0}))
    assert b_default.pars.max_step_attempts == 4     # documented batch default
    b_off = BatchSolver(nlp, Params().with_overrides(
        {"output_level": 0, "batch_max_step_attempts": 0}))
    assert b_off.pars.max_step_attempts == 100       # cap disabled
    b_hist = BatchSolver(nlp, Params().with_overrides(
        {"output_level": 0, "batch_history_capacity": 0, "term.max_it": 50}))
    assert b_hist.kernel.hist_cap == 50 * 2 + 2      # full history


def test_batch_wall_clock_bound():
    from onephase_tpu.ipm.state import MAX_TIME
    from onephase_tpu.parallel.batch import BatchSolver
    nlp = canonicalize(zoo.rosenbrook2())
    pars = Params().with_overrides({"output_level": 0, "term.max_time": 0.0,
                                    "chunk_size": 1, "term.max_it": 81})
    b = BatchSolver(nlp, pars)
    st = b.solve(np.stack([nlp.x0, nlp.x0 + 0.1]))
    assert all(int(s) == MAX_TIME for s in np.asarray(st.status))
