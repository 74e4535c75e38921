"""Mixed-precision modes (TPU additions; the reference is all-f64).

Two complementary knobs, both absent from the reference (which relies on
f64 throughout plus optional BigFloat refinement accumulators,
schur.jl:154-156):

* ``kkt.factor_precision="f32"`` — f64 solve dtype, but the O(n^3) hot path
  (Cholesky/LDL^T + backsolves) runs in f32 (the MXU-native dtype);
  iterative refinement against the f64 residual recovers f64-accurate
  directions.  This is the mode that reaches the reference's tol 1e-6
  (parameters.jl:110-136) while keeping the factorization work in f32.

* ``kkt.residual_precision="f64"`` — f32 solve dtype, but the KKT residuals
  used for the Newton RHS and for termination are measured by f64 oracle
  evaluation, making f32 certification honest (no false Optimal from
  cancellation noise in a(x)-s or g-J^T y).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu import one_phase_solve
from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.models import zoo
from onephase_tpu.nlp import canonicalize

PROBS = [zoo.rosenbrook2, zoo.toy_lp2, zoo.toy_lp7, zoo.circle1,
         zoo.circle_nc1, zoo.quad_opt]


def _pars(**over):
    base = {"term!max_it": 200, "output_level": 0, "term!tol_opt": 1e-6,
            "kkt!it_refine_adaptive": True}
    base.update(over)
    return Params().with_overrides(base)


@pytest.mark.parametrize("prob", PROBS, ids=[p.__name__ for p in PROBS])
def test_f32_factor_reaches_tol6(prob):
    """f64 solve + f32 factorization certifies tol 1e-6 with the same
    trajectory as the all-f64 solve (VERDICT item 3)."""
    r64 = one_phase_solve(canonicalize(prob(), dtype=jnp.float64), _pars())
    r32 = one_phase_solve(canonicalize(prob(), dtype=jnp.float64),
                          _pars(**{"kkt!factor_precision": "f32"}))
    assert r64.status == "Optimal"
    assert r32.status == "Optimal"
    assert np.allclose(r32.x, r64.x, atol=1e-5)
    # refinement restores the direction, so the path should barely differ
    assert abs(r32.iterations - r64.iterations) <= 2


def test_f32_factor_direction_parity():
    """The f32-factored, f64-refined direction matches the pure-f64
    direction to ~f64 accuracy (the refinement contract)."""
    pars64 = _pars()
    pars32 = _pars(**{"kkt!factor_precision": "f32"})
    nlp = canonicalize(zoo.rosenbrook2(), dtype=jnp.float64)
    k64 = OnePhaseKernel(nlp, pars64)
    k32 = OnePhaseKernel(nlp, pars32)
    assert k32.factor_dtype == jnp.float32
    st = k64.initial_state()

    def direction(k):
        fact = k.form_factor(st.p, st.cache, k._empty_factor())
        (L, D), ok = k.factor(fact.Q, jnp.asarray(1e-8, k.dtype))
        assert bool(ok)
        fact = fact._replace(L=k.finalize_solver(L), D=D,
                             delta=jnp.asarray(1e-8, k.dtype))
        return k.compute_direction(fact, st.p, st.cache, 0.0, 0.0, 0.0)

    d64, ratio64 = direction(k64)
    d32, ratio32 = direction(k32)
    assert d32.x.dtype == jnp.float64
    scale = 1.0 + float(jnp.max(jnp.abs(d64.x)))
    assert float(jnp.max(jnp.abs(d32.x - d64.x))) / scale < 1e-8
    assert float(ratio32) < 1e-8  # a-posteriori KKT error of the direction


def test_f32_factor_infeasible_certificate():
    """The Farkas infeasibility certificate survives the pure f32 factor."""
    r = one_phase_solve(canonicalize(zoo.toy_lp_inf1(), dtype=jnp.float64),
                        _pars(**{"kkt!factor_precision": "f32"}))
    assert r.status == "primal_infeasible"


def test_f32_fallback_unbounded_certificate():
    """The race to ||x|| -> 1/tol_unbounded needs factorizations with
    cond(Q) beyond f32; "f32_fallback" codifies the f64 fallback rule
    (VERDICT item 3: 'codify the fallback rule where it can't').  With the
    instantaneous criterion alone (unbounded_ray_patience=0), pure f32
    cannot certify; the r5 recession-ray certificate
    (results/unbounded_ray_note.md) closes that gap for every lane."""
    pure = one_phase_solve(canonicalize(zoo.lp_unbd(), dtype=jnp.float64),
                           _pars(**{"kkt!factor_precision": "f32",
                                    "term!unbounded_ray_patience": 0}))
    assert pure.status != "dual_infeasible"  # the 1e12 race needs f64
    fb = one_phase_solve(canonicalize(zoo.lp_unbd(), dtype=jnp.float64),
                         _pars(**{"kkt!factor_precision": "f32_fallback",
                                  "term!unbounded_ray_patience": 0}))
    r64 = one_phase_solve(canonicalize(zoo.lp_unbd(), dtype=jnp.float64),
                          _pars(**{"term!unbounded_ray_patience": 0}))
    assert fb.status == r64.status == "dual_infeasible"
    # ray certificate: persistent feasible divergence certifies even the
    # pure-f32 factor lane (delta floored far above 1e-12)
    ray = one_phase_solve(canonicalize(zoo.lp_unbd(), dtype=jnp.float64),
                          _pars(**{"kkt!factor_precision": "f32"}))
    assert ray.status == "dual_infeasible"


def test_residual_precision_f64_runs_and_is_honest():
    """f32 solve with f64-measured residuals: the measured violation agrees
    with an independent f64 evaluation (no false certification)."""
    nlp = canonicalize(zoo.toy_lp2(), dtype=jnp.float32)
    r = one_phase_solve(nlp, _pars(**{
        "kkt!residual_precision": "f64", "term!tol_opt": 1e-4}))
    assert r.status == "Optimal"
    a64 = np.asarray(nlp.a_of_hi(jnp.asarray(r.x[:nlp.n], jnp.float32)))
    vio64 = max(0.0, float(-a64.min()))
    assert abs(vio64 - float(r.max_violation)) < 1e-6


def test_grad_lag_hi_matches_f64_oracle():
    """nlp.grad_lag_hi == the canonical-gradient identity computed in f64."""
    nlp32 = canonicalize(zoo.circle_nc1(), dtype=jnp.float32)
    nlp64 = canonicalize(zoo.circle_nc1(), dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=nlp32.n), jnp.float32)
    y = jnp.asarray(rng.uniform(0.1, 2.0, size=nlp32.m), jnp.float32)
    hi = np.asarray(nlp32.grad_lag_hi(x, y, jnp.asarray(0.0, jnp.float64)))
    ref = np.asarray(nlp64.grad_f(x.astype(jnp.float64))
                     - nlp64.jtprod(x.astype(jnp.float64),
                                    y.astype(jnp.float64)))
    assert np.allclose(hi, ref, atol=1e-12)


@pytest.mark.parametrize("prob", [zoo.toy_lp2, zoo.rosenbrook2,
                                  zoo.circle_nc1],
                         ids=lambda p: p.__name__)
def test_bf16_q_formation(prob):
    """kkt.q_form_dtype="bf16": the MXU-dtype rank-m update changes only
    the preconditioner; with refinement the trajectory is unchanged, and
    the full cascade bf16 Q -> f32 chol -> f64 refine certifies 1e-6."""
    base = _pars(**{"kkt!factor_precision": "f32"})
    bf = _pars(**{"kkt!factor_precision": "f32",
                  "kkt!q_form_dtype": "bf16"})
    r0 = one_phase_solve(canonicalize(prob(), dtype=jnp.float64), base)
    r1 = one_phase_solve(canonicalize(prob(), dtype=jnp.float64), bf)
    assert r0.status == r1.status == "Optimal"
    assert r0.iterations == r1.iterations
    assert np.allclose(r0.x, r1.x, atol=1e-5)


def test_bf16_q_matches_dense():
    """xla_fused_q(mxu_dtype=bf16) agrees with the f32 dense expression to
    bf16 resolution."""
    from onephase_tpu.ops.schur import xla_fused_q
    rng = np.random.default_rng(3)
    m, n = 96, 64
    Jc = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    w = jnp.asarray(rng.uniform(1e-4, 1e4, size=m).astype(np.float32))
    H = jnp.asarray((lambda A: A @ A.T)(rng.normal(size=(n, n))).astype(np.float32))
    bnd = jnp.asarray(rng.uniform(0, 1, size=n).astype(np.float32))
    q32 = np.asarray(xla_fused_q(Jc, w, H, bnd))
    qbf = np.asarray(xla_fused_q(Jc, w, H, bnd, mxu_dtype=jnp.bfloat16))
    scale = np.abs(q32).max()
    assert np.abs(qbf - q32).max() / scale < 3e-2


# ---------------------------------------------------------------------------
# r5 TPU-emulated-f64 escape hatches (profile-driven: the ECON250 outer
# iteration was 82% direction solves + 13% Q formation, both in emulated
# f64 on-chip — results/profile_econ_250.md)
# ---------------------------------------------------------------------------

def test_pair_matvec_accuracy():
    """ops/refine f32-pair products reproduce f64 matvecs to ~1e-12 even
    with wide dynamic range in the operands."""
    from onephase_tpu.ops import refine as r
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(800, 120))
                    * np.exp(rng.normal(size=(800, 120)) * 3.0))
    x = jnp.asarray(rng.normal(size=120) * np.exp(rng.normal(size=120) * 3))
    w = jnp.asarray(rng.normal(size=800))
    ref1, ref2 = np.asarray(A @ x), np.asarray(A.T @ w)
    e1 = np.abs(np.asarray(r.pair_matvec64(A, x)) - ref1).max()
    e2 = np.abs(np.asarray(r.pair_matvec64_t(A, w)) - ref2).max()
    assert e1 / np.abs(ref1).max() < 1e-12
    assert e2 / np.abs(ref2).max() < 1e-12


@pytest.mark.parametrize("prob", [zoo.toy_lp1, zoo.rosenbrook2,
                                  zoo.circle_nc1, zoo.toy_lp_inf1],
                         ids=lambda p: p.__name__)
def test_fast_f64_lane_parity(prob):
    """The r5 fast-f64 lane (f32 Q formation with lazy-f64 fallback re-form
    + f32-pair refinement matvecs) keeps statuses and argmins of the plain
    f64 solve."""
    ref = one_phase_solve(canonicalize(prob(), dtype=jnp.float64), _pars())
    r = one_phase_solve(
        canonicalize(prob(), dtype=jnp.float64),
        _pars(**{"kkt!factor_precision": "f32_fallback",
                 "kkt!fallback_form_f32": True,
                 "kkt!hi_matvec_f32pair": "refine",
                 "kkt!linear_solver_type": "invchol",
                 "kkt!it_refine_highprec": True,
                 "kkt!it_refine_tol": 1e-12}))
    assert r.status == ref.status
    if ref.status == "Optimal":
        assert np.allclose(np.asarray(ref.x), np.asarray(r.x), atol=2e-5)
