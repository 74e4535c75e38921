"""Tier-1 numerics tests: KKT direction cross-validation.

The reference cross-checks Newton directions between independent KKT solver
implementations on 9 toy LPs (test/kkt_system_solvers.jl:61-181, pairwise
agreement < 1e-6 on dx, dy, ds).  Here the Schur-complement path is checked
against an independently assembled dense KKT system solved with numpy:

    [H+dI   0    -J^T] [dx]   [dual_r ]
    [ J    -I      0 ] [ds] = [primal_r]
    [ 0     Y      S ] [dy]   [comp_r ]
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.models import zoo
from onephase_tpu.nlp import canonicalize

PROBS = [zoo.toy_lp1, zoo.toy_lp2, zoo.toy_lp3, zoo.toy_lp5, zoo.toy_lp6,
         zoo.toy_lp7, zoo.toy_lp8, zoo.rosenbrook2, zoo.circle1]


def dense_canonical_jac(nlp, x):
    import jax
    return jax.jacfwd(lambda xx: nlp.a_of(xx))(x)


@pytest.mark.parametrize("prob", PROBS, ids=[p.__name__ for p in PROBS])
@pytest.mark.parametrize("eta", [(0.0, 0.0, 0.0), (1.0, 0.0, 1.0),
                                 (0.3, 0.0, 0.3)],
                         ids=["affine", "stable", "gamma03"])
def test_direction_matches_dense_solve(prob, eta, base_pars):
    pars = base_pars
    nlp = canonicalize(prob())
    k = OnePhaseKernel(nlp, pars)
    st = k.initial_state()
    # factor at the initial iterate with a small positive delta
    fact = k.form_factor(st.p, st.cache, st.fact)
    delta = 1e-8
    (L, D), ok = k.factor(fact.Q, delta)
    assert bool(ok)
    fact = fact._replace(L=L, D=D, delta=jnp.asarray(delta, k.dtype))

    d, ratio = k.compute_direction(fact, st.p, st.cache, *eta)

    # independent dense assembly
    n, m = nlp.n, nlp.m
    x = np.asarray(st.p.x)
    J = np.asarray(dense_canonical_jac(nlp, st.p.x))
    H = np.asarray(fact.H) + delta * np.eye(n)
    s = np.asarray(st.p.s)
    y = np.asarray(st.p.y)
    dual_r, primal_r, comp_r = (np.asarray(v) for v in
                                k.build_rhs(st.p, st.cache, *eta))

    K = np.zeros((n + 2 * m, n + 2 * m))
    K[:n, :n] = H
    K[:n, n + m:] = -J.T
    K[n:n + m, :n] = J
    K[n:n + m, n:n + m] = -np.eye(m)
    K[n + m:, n:n + m] = np.diag(y)
    K[n + m:, n + m:] = np.diag(s)
    rhs = np.concatenate([dual_r, primal_r, comp_r])
    sol = np.linalg.solve(K, rhs)
    dx_ref, ds_ref, dy_ref = sol[:n], sol[n:n + m], sol[n + m:]

    scale = 1.0 + np.linalg.norm(sol, np.inf)
    assert np.linalg.norm(np.asarray(d.x) - dx_ref, np.inf) / scale < 1e-6
    assert np.linalg.norm(np.asarray(d.s) - ds_ref, np.inf) / scale < 1e-6
    assert np.linalg.norm(np.asarray(d.y) - dy_ref, np.inf) / scale < 1e-6
    # a-posteriori KKT error ratio small for a consistent solve
    assert float(ratio) < 1e-6


def test_jtdj_matches_dense():
    """Structured J^T D J assembly == dense canonical computation."""
    import jax
    nlp = canonicalize(zoo.toy_lp5())
    x = jnp.asarray(nlp.x0) + 0.3
    Jc = nlp.jac_orig(x)
    d = jnp.arange(1.0, nlp.m + 1.0)
    Jcan = np.asarray(dense_canonical_jac(nlp, x))
    want = Jcan.T @ np.diag(np.asarray(d)) @ Jcan
    got = np.asarray(nlp.jtdj(Jc, d))
    np.testing.assert_allclose(got, want, atol=1e-12)
    np.testing.assert_allclose(np.asarray(nlp.jtdj_diag(Jc, d)),
                               np.diag(want), atol=1e-12)


def test_canonical_products_match():
    import jax
    nlp = canonicalize(zoo.rosenbrook2())
    x = jnp.asarray([0.7, 1.3])
    Jcan = np.asarray(dense_canonical_jac(nlp, x))
    v = jnp.asarray([0.5, -2.0])
    w = jnp.arange(1.0, nlp.m + 1.0)
    np.testing.assert_allclose(np.asarray(nlp.jprod(x, v)), Jcan @ np.asarray(v),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(nlp.jtprod(x, w)),
                               Jcan.T @ np.asarray(w), atol=1e-12)
    np.testing.assert_allclose(np.asarray(nlp.jtprod_ones(x)),
                               Jcan.T @ np.ones(nlp.m), atol=1e-12)
    Jc = nlp.jac_orig(x)
    np.testing.assert_allclose(np.asarray(nlp.jprod_mat(Jc, v)),
                               Jcan @ np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(nlp.jtprod_mat(Jc, w)),
                               Jcan.T @ np.asarray(w), atol=1e-12)


def test_lag_hess():
    """Lagrangian Hessian: f - y^T a over canonical rows (bound rows linear)."""
    nlp = canonicalize(zoo.rosenbrook2())
    x = jnp.asarray([0.7, 1.3])
    y = jnp.arange(1.0, nlp.m + 1.0) * 0.1
    H = np.asarray(nlp.lag_hess(x, y))
    # finite difference of grad of lagrangian
    import jax

    def lag_grad(xx):
        return nlp.grad_f(xx) - nlp.jtprod(xx, y)

    Hfd = np.asarray(jax.jacfwd(lag_grad)(x))
    np.testing.assert_allclose(H, Hfd, atol=1e-8)
    np.testing.assert_allclose(H, H.T, atol=1e-12)


def test_pallas_kernels_interpret():
    """Blocked Pallas chol + tri-inv-gram in interpreter mode vs numpy."""
    from onephase_tpu.ops.cholesky import (pallas_chol, pallas_chol_inv,
                                           pallas_tri_inv_gram)
    rng = np.random.default_rng(3)
    for n in (40, 130):  # < one block and multi-block (128 + remainder pad)
        M = rng.normal(size=(n, n)).astype(np.float32)
        Q = jnp.asarray(M @ M.T + n * np.eye(n, dtype=np.float32))
        L, d, ok = pallas_chol(Q, interpret=True)
        assert bool(ok)
        Lnp = np.linalg.cholesky(np.asarray(Q))
        scale = np.abs(Lnp).max()
        np.testing.assert_allclose(np.asarray(L) / scale, Lnp / scale, atol=3e-5)
        np.testing.assert_allclose(np.asarray(d), np.diagonal(Lnp), rtol=2e-5)
        Minv = pallas_tri_inv_gram(L, interpret=True)
        resid = np.asarray(Q) @ np.asarray(Minv) - np.eye(n)
        assert np.abs(resid).max() < 5e-4
        M2, d2, ok2 = pallas_chol_inv(Q, interpret=True)
        assert bool(ok2)
        np.testing.assert_allclose(np.asarray(M2), np.asarray(Minv), atol=1e-6)
    # non-PD detection
    n = 40
    M = rng.normal(size=(n, n)).astype(np.float32)
    Q = jnp.asarray(M @ M.T + 3 * np.eye(n, dtype=np.float32))
    _, _, okbad = pallas_chol(Q - 50.0 * jnp.eye(n), interpret=True)
    assert not bool(okbad)


def test_end_to_end_pallas_solver_interpret():
    """Full solve with linear_solver_type=pallas (interpret on CPU)."""
    import onephase_tpu.ops as ops
    from onephase_tpu import one_phase_solve
    from onephase_tpu.models import zoo
    ops.INTERPRET = True
    try:
        r = one_phase_solve(zoo.circle1(), options={
            "output_level": 0, "term!max_it": 81,
            "kkt!linear_solver_type": "pallas"})
    finally:
        ops.INTERPRET = False
    assert r.status == "Optimal"
    assert abs(r.x[0] - 1.0) < 1e-3


def test_batched_pallas_kernels_interpret():
    """vmapped dispatch of the auto kernels (the hand-written batched
    Mosaic kernels were deleted after losing AND crashing at every
    measured shape — results/profile_kernels_tpu.md is the record; the
    custom-vmap dispatcher routes batches to XLA on hardware and to
    lax.map of the single-shape kernel in interpret mode)."""
    import onephase_tpu.ops as ops
    rng = np.random.default_rng(5)
    b, n = 3, 40
    A = rng.normal(size=(b, n, n)).astype(np.float32)
    Q = jnp.asarray(A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))
    Lnp = np.linalg.cholesky(np.asarray(Q))
    # the custom-vmap dispatcher under vmap (interpret -> lax.map path)
    from onephase_tpu.ops.cholesky import chol_auto
    ops.INTERPRET = True
    try:
        L2, d2, ok2 = jax.vmap(chol_auto)(Q)
    finally:
        ops.INTERPRET = False
    np.testing.assert_allclose(np.asarray(L2), Lnp, atol=5e-4)


def test_end_to_end_invchol_solver():
    """Full solve with the explicit-inverse (matvec-solve) backend."""
    from onephase_tpu import one_phase_solve
    from onephase_tpu.models import zoo
    r = one_phase_solve(zoo.circle1(), options={
        "output_level": 0, "term!max_it": 81,
        "kkt!linear_solver_type": "invchol"})
    assert r.status == "Optimal"
    assert abs(r.x[0] - 1.0) < 1e-3


def test_double_single_matvec():
    """ds_matvec residual arithmetic: ~2x-precision from f32 ops."""
    from onephase_tpu.ops import refine as dsr
    rng = np.random.default_rng(0)
    n = 150
    A = rng.normal(size=(n, n)).astype(np.float32)
    x = rng.normal(size=n).astype(np.float32)
    hi, lo = dsr.ds_matvec(jnp.asarray(A), jnp.asarray(x))
    ref = A.astype(np.float64) @ x.astype(np.float64)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    err_ds = np.abs(got - ref).max() / np.abs(ref).max()
    err_f32 = np.abs(np.asarray(jnp.asarray(A) @ jnp.asarray(x), np.float64)
                     - ref).max() / np.abs(ref).max()
    assert err_ds < err_f32 / 50.0      # at least ~1.7 digits better
    s, e = dsr.two_sum(jnp.float32(1.0), jnp.float32(1e-9))
    assert float(s) == 1.0 and abs(float(e) - 1e-9) < 1e-12


def test_pallas_fused_q_tri_parity_interpret():
    """Triangle-tiled fused-Q kernel matches xla_fused_q (ADVICE r1: the
    kernel previously had zero coverage)."""
    from onephase_tpu.ops.schur import pallas_fused_q_tri, xla_fused_q
    rng = np.random.default_rng(11)
    for m, n in ((40, 30), (300, 150)):   # single-tile and multi-tile grids
        Jc = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
        w = jnp.asarray(np.abs(rng.normal(size=m)).astype(np.float32) + 0.1)
        H = rng.normal(size=(n, n)).astype(np.float32)
        H = jnp.asarray(H + H.T)
        bnd = jnp.asarray(np.abs(rng.normal(size=n)).astype(np.float32))
        want = np.asarray(xla_fused_q(Jc, w, H, bnd), np.float64)
        got = np.asarray(pallas_fused_q_tri(Jc, w, H, bnd, interpret=True),
                         np.float64)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)


def test_it_refine_adaptive_direction_parity():
    """Adaptive refinement produces the same solve as the fixed-count loop
    on well-conditioned toy LPs (ADVICE r1: no coverage; also documents that
    the adaptive while_loop path is not reverse-differentiable)."""
    from onephase_tpu import one_phase_solve
    from onephase_tpu.models import zoo
    base = {"output_level": 0, "term!max_it": 81}
    for prob in (zoo.toy_lp1(), zoo.circle1()):
        r_fix = one_phase_solve(prob, options=base)
        r_ada = one_phase_solve(prob, options={
            **base, "kkt!it_refine_adaptive": True})
        assert r_ada.status == r_fix.status == "Optimal"
        assert r_ada.iterations == r_fix.iterations
        np.testing.assert_allclose(r_ada.x, r_fix.x, atol=1e-9)


def test_pallas_fused_q_tri_parity_interpret():
    """Triangle-tiled fused-Q kernel == XLA expression (ADVICE r1: the
    kernel is not on the dispatch path but must stay CI-verified)."""
    from onephase_tpu.ops.schur import pallas_fused_q_tri, xla_fused_q
    rng = np.random.default_rng(7)
    for (m, n) in [(96, 64), (300, 200)]:
        Jc = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
        w = jnp.asarray(rng.uniform(0.1, 5.0, size=m).astype(np.float32))
        H0 = rng.normal(size=(n, n)).astype(np.float32)
        H = jnp.asarray(H0 @ H0.T)
        bnd = jnp.asarray(rng.uniform(0, 1, size=n).astype(np.float32))
        q_ref = np.asarray(xla_fused_q(Jc, w, H, bnd))
        q_tri = np.asarray(pallas_fused_q_tri(Jc, w, H, bnd, interpret=True))
        scale = np.abs(q_ref).max()
        assert np.abs(q_tri - q_ref).max() / scale < 1e-5


def test_it_refine_adaptive_direction_parity(base_pars):
    """kkt.it_refine_adaptive (while-loop refinement) reproduces the
    fixed-count path's trajectory on the toy LPs (ADVICE r1)."""
    from onephase_tpu import one_phase_solve
    for prob in (zoo.toy_lp2, zoo.toy_lp7, zoo.rosenbrook2):
        rs = []
        for adaptive in (False, True):
            pars = base_pars.with_overrides(
                {"kkt!it_refine_adaptive": adaptive})
            rs.append(one_phase_solve(prob(), pars))
        assert rs[0].status == rs[1].status == "Optimal"
        assert rs[0].iterations == rs[1].iterations
        assert np.allclose(rs[0].x, rs[1].x, atol=1e-7)


def test_blocked_tri_inv():
    """blocked_tri_inv vs direct inverse: square/padded sizes, batched,
    custom block size (the n=2048 compile-OOM fix, results/compile_2048.md)."""
    from onephase_tpu.ops.cholesky import blocked_tri_inv, xla_chol_inv_from_L
    rng = np.random.default_rng(11)
    for n, block in ((100, 256), (256, 128), (300, 128), (513, 128)):
        A = rng.normal(size=(n, n))
        L = np.linalg.cholesky(A @ A.T + n * np.eye(n))
        Li = np.asarray(blocked_tri_inv(jnp.asarray(L), block=block))
        np.testing.assert_allclose(Li, np.linalg.inv(L), atol=1e-9 * n)
        # strictly lower triangular output
        assert np.abs(np.triu(Li, 1)).max() == 0.0
        M = np.asarray(xla_chol_inv_from_L(jnp.asarray(L)))
        np.testing.assert_allclose(M @ (L @ L.T), np.eye(n), atol=1e-8 * n)
    # batched leading axis
    Ls = np.stack([np.linalg.cholesky(
        (lambda B: B @ B.T + 64 * np.eye(64))(rng.normal(size=(64, 64))))
        for _ in range(3)])
    Lis = np.asarray(blocked_tri_inv(jnp.asarray(Ls), block=32))
    for k in range(3):
        np.testing.assert_allclose(Lis[k], np.linalg.inv(Ls[k]), atol=1e-7)
