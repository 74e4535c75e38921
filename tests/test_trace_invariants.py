"""Trace-level property tests of the one-phase mechanism (VERDICT r3 item 6).

Julia reference traces are unavailable, but the paper's own invariants are
checkable on the recorded iterates (docs/one-phase.tex:21-25; the nonlinear
slack update move.jl:2-22):

  I1  slack coupling: at every recorded iterate, a(x) - s == beta * r0
      (the primal residual stays EXACTLY beta * r0 after every accepted
      step — THE one-phase mechanism).
  I2  beta never increases (d_beta = -(1-eta_P) beta <= 0).
  I3  rate coupling: between consecutive history rows where the iterate
      moved, mu and the primal residual contract by their predicted
      factors (1 - alpha_P (1 - eta_mu)) and (1 - alpha_P (1 - eta_P));
      on aggressive steps eta_mu == eta_P, so feasibility decreases at
      the same rate as mu (the paper's abstract property).
  I4  interior invariant: s > 0, y > 0 and s.y/mu within comp_feas bounds
      at every recorded iterate (is_feasible, IPM_tools.jl:51-64).

A regression in the slack update, the eta plumbing, or the dual bounds
makes these fail."""
import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.ipm.state import RUNNING
from onephase_tpu.models import zoo
from onephase_tpu.nlp import canonicalize

CONFIGS = {
    "schur_xla": {},
    "schur_invchol": {"kkt.linear_solver_type": "invchol"},
    "symmetric": {"kkt.kkt_solver_type": "symmetric"},
    "clever": {"kkt.kkt_solver_type": "clever_symmetric"},
}

PROBLEMS = [zoo.toy_lp1, zoo.rosenbrook2, zoo.circle1, zoo.toy_lp_inf1]


def _drive(spec, overrides, max_outer=60):
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": max_outer, "chunk_size": 1,
        **overrides})
    k = OnePhaseKernel(canonicalize(spec), pars)
    st = k.initial_state()
    states = [st]
    while int(st.status) == RUNNING and len(states) <= max_outer:
        st = k.run_chunk(st)
        states.append(st)
    return k, states


@pytest.mark.parametrize("config", sorted(CONFIGS))
@pytest.mark.parametrize("prob", PROBLEMS, ids=lambda p: p.__name__)
def test_trace_invariants(prob, config):
    spec = prob()
    k, states = _drive(spec, CONFIGS[config])

    r0 = np.asarray(states[0].r0)
    scale = 1.0 + float(np.max(np.abs(r0)))
    betas = []
    for st in states:
        a = np.asarray(st.cache.a)
        s = np.asarray(st.p.s)
        beta = float(st.p.beta)
        # I1 slack coupling (exact by construction; tolerance covers the
        # f64 round-off of a(x) re-evaluation)
        drift = np.max(np.abs(a - s - beta * r0))
        assert drift <= 1e-9 * scale, (config, prob.__name__, drift)
        # I4 interior invariant
        assert bool(k.is_feasible(st.p, k.pars.ls.comp_feas)), (
            config, prob.__name__, int(st.t))
        betas.append(beta)
    # I2 beta monotone non-increasing
    assert all(b2 <= b1 * (1 + 1e-12) for b1, b2 in zip(betas, betas[1:])), (
        config, prob.__name__, betas)


@pytest.mark.parametrize("prob", PROBLEMS, ids=lambda p: p.__name__)
def test_rate_coupling_history(prob):
    """I3 over the recorded history of a default-config solve."""
    from onephase_tpu.solver import one_phase_solve

    res = one_phase_solve(prob(), options={
        "output_level": 0, "term.max_it": 60})
    hist = res.history
    assert len(hist) >= 2
    moved = 0
    for r1, r2 in zip(hist, hist[1:]):
        mu1, mu2 = r1["mu"], r2["mu"]
        rp1, rp2 = r1["primal_residual"], r2["primal_residual"]
        if mu2 == mu1:
            # rejected attempt or pure-dual move: feasibility must not
            # move either (the slack update ties them together)
            assert abs(rp2 - rp1) <= 1e-9 * (1.0 + rp1), (prob.__name__, r2)
            continue
        moved += 1
        a_p = r2["alpha_P"]
        f_mu = 1.0 - a_p * (1.0 - r2["eta_mu"])
        f_p = 1.0 - a_p * (1.0 - r2["eta_P"])
        assert np.isclose(mu2, mu1 * f_mu, rtol=1e-6, atol=1e-14), (
            prob.__name__, r2["t"], mu2, mu1 * f_mu)
        assert np.isclose(rp2, rp1 * f_p, rtol=1e-6,
                          atol=1e-12 * (1.0 + rp1)), (
            prob.__name__, r2["t"], rp2, rp1 * f_p)
        if r2["step_type"] == "agg":
            # the headline property: aggressive steps cut mu and
            # feasibility at the same rate
            assert r2["eta_mu"] == r2["eta_P"], (prob.__name__, r2)
    assert moved >= 1, prob.__name__
