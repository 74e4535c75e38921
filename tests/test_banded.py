"""RCM-banded general-sparsity kernel tests (parallel/banded.py): the
unstructured counterpart of the chain path — pattern detection, native RCM
ordering, block-band assembly, direction parity vs the dense kernel."""

import jax.numpy as jnp
import numpy as np

from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.ipm.state import OPTIMAL
from onephase_tpu.models.examples import chain_ocp
from onephase_tpu.nlp import NLPSpec, canonicalize
from onephase_tpu.parallel.banded import BandedKernel


def _pars(**kw):
    o = {"output_level": 0, "term.max_it": 100, "chunk_size": 100,
         "history_capacity": 2}
    o.update(kw)
    return Params().with_overrides(o)


def _chain_nlp(K=8, nx=6, mc=3):
    return canonicalize(chain_ocp(K=K, nx=nx, mc=mc).to_nlpspec())


def _scrambled_chain_nlp(K=8, nx=6, mc=3, seed=7):
    """Chain NLP with randomly permuted variable order: the natural
    ordering is destroyed, so a small bandwidth exists only if RCM
    actually finds it."""
    spec = chain_ocp(K=K, nx=nx, mc=mc).to_nlpspec()
    n = len(np.asarray(spec.x0))
    rng = np.random.default_rng(seed)
    sig = rng.permutation(n)          # scrambled x = original[sig]

    def unscramble(z):
        return z[jnp.asarray(sig)]

    return canonicalize(NLPSpec(
        f=lambda z: spec.f(unscramble(z)),
        c=lambda z: spec.c(unscramble(z)),
        lcon=spec.lcon, ucon=spec.ucon,
        lvar=np.asarray(spec.lvar)[np.argsort(sig)],
        uvar=np.asarray(spec.uvar)[np.argsort(sig)],
        x0=np.asarray(spec.x0)[np.argsort(sig)],
        name="scrambled_chain")), sig


def test_banded_direction_matches_dense():
    nlp = _chain_nlp()
    pars = _pars()
    bk = BandedKernel(nlp, pars)
    gk = OnePhaseKernel(nlp, pars)
    assert bk.bandwidth < nlp.n // 2

    st_b, st_g = bk.initial_state(), gk.initial_state()
    f_b = bk.form_factor(st_b.p, st_b.cache, st_b.fact)
    f_g = gk.form_factor(st_g.p, st_g.cache, st_g.fact)
    np.testing.assert_allclose(np.asarray(f_b.schur_diag),
                               np.asarray(f_g.schur_diag), atol=1e-8)
    delta = 1e-8
    LD_b, ok_b = bk.factor(f_b.Q, delta)
    LD_g, ok_g = gk.factor(f_g.Q, delta)
    assert bool(ok_b) and bool(ok_g)
    f_b = f_b._replace(L=LD_b[0], D=LD_b[1],
                       delta=jnp.asarray(delta, bk.dtype))
    f_g = f_g._replace(L=gk.finalize_solver(LD_g[0]), D=LD_g[1],
                       delta=jnp.asarray(delta, gk.dtype))
    d_b, r_b = bk.compute_direction(f_b, st_b.p, st_b.cache, 0.0, 0.0, 0.0)
    d_g, _ = gk.compute_direction(f_g, st_g.p, st_g.cache, 0.0, 0.0, 0.0)
    for fld in ("x", "y", "s"):
        a, b = np.asarray(getattr(d_b, fld)), np.asarray(getattr(d_g, fld))
        assert np.abs(a - b).max() / (1 + np.abs(a).max()) < 1e-7, fld
    assert float(r_b) < 1e-8


def test_banded_end_to_end_matches_dense():
    nlp = _chain_nlp()
    pars = _pars()
    bk = BandedKernel(nlp, pars)
    st = bk.run_chunk(bk.initial_state())
    assert int(st.status) == OPTIMAL

    from onephase_tpu import one_phase_solve
    r = one_phase_solve(nlp, pars)
    assert r.status == "Optimal"
    np.testing.assert_allclose(np.asarray(st.p.x), r.x, atol=1e-5)


def test_banded_partitioned_matches_sequential():
    nlp = _chain_nlp(K=16)
    st_seq = BandedKernel(nlp, _pars()).run_chunk(
        BandedKernel(nlp, _pars()).initial_state())
    pars_p = _pars(**{"kkt.chain_partitions": 4})
    bkp = BandedKernel(nlp, pars_p)
    st_par = bkp.run_chunk(bkp.initial_state())
    assert int(st_par.status) == OPTIMAL
    assert int(st_par.t) == int(st_seq.t)
    np.testing.assert_allclose(np.asarray(st_par.p.x),
                               np.asarray(st_seq.p.x), atol=1e-7)


def test_banded_sharded_matches_unsharded():
    import jax
    from jax.sharding import Mesh

    nlp = _chain_nlp(K=16)
    pars_p = _pars(**{"kkt.chain_partitions": 8})
    bk0 = BandedKernel(nlp, pars_p)
    st0 = bk0.run_chunk(bk0.initial_state())

    mesh = Mesh(np.array(jax.devices()[:8]), ("chain",))
    bk = BandedKernel(nlp, pars_p, mesh=mesh)
    st = bk.run_chunk(bk.initial_state())
    assert int(st.status) == OPTIMAL
    assert int(st.t) == int(st0.t)
    np.testing.assert_allclose(np.asarray(st.p.x), np.asarray(st0.p.x),
                               atol=1e-8)


def test_matrix_free_band_matches_assembled():
    """matrix_free probing must produce the SAME (Qd, Qs) band blocks as
    the dense assembly, and the same Newton direction (VERDICT r2 item 6:
    no dense J/H anywhere in the factor path)."""
    nlp = _chain_nlp()
    pars = _pars()
    bk = BandedKernel(nlp, pars)
    mk = BandedKernel(nlp, pars, matrix_free=True)

    st_b, st_m = bk.initial_state(), mk.initial_state()
    f_b = bk.form_factor(st_b.p, st_b.cache, st_b.fact)
    f_m = mk.form_factor(st_m.p, st_m.cache, st_m.fact)
    np.testing.assert_allclose(np.asarray(f_m.Q[0]), np.asarray(f_b.Q[0]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(f_m.Q[1]), np.asarray(f_b.Q[1]),
                               atol=1e-8)
    # factor slots hold the linearization point, not matrices
    assert np.asarray(f_m.Jc).shape == (nlp.n,)
    assert np.asarray(f_m.H).shape == ()

    delta = 1e-8
    LD_b, _ = bk.factor(f_b.Q, delta)
    LD_m, ok_m = mk.factor(f_m.Q, delta)
    assert bool(ok_m)
    f_b = f_b._replace(L=LD_b[0], D=LD_b[1],
                       delta=jnp.asarray(delta, bk.dtype))
    f_m = f_m._replace(L=LD_m[0], D=LD_m[1],
                       delta=jnp.asarray(delta, mk.dtype))
    d_b, _ = bk.compute_direction(f_b, st_b.p, st_b.cache, 0.0, 0.0, 0.0)
    d_m, r_m = mk.compute_direction(f_m, st_m.p, st_m.cache, 0.0, 0.0, 0.0)
    for fld in ("x", "y", "s"):
        a, b = np.asarray(getattr(d_m, fld)), np.asarray(getattr(d_b, fld))
        assert np.abs(a - b).max() / (1 + np.abs(a).max()) < 1e-7, fld
    assert float(r_m) < 1e-8


def test_matrix_free_end_to_end_matches_dense():
    nlp = _chain_nlp()
    pars = _pars()
    mk = BandedKernel(nlp, pars, matrix_free=True)
    st = mk.run_chunk(mk.initial_state())
    assert int(st.status) == OPTIMAL

    from onephase_tpu import one_phase_solve
    r = one_phase_solve(nlp, pars)
    assert r.status == "Optimal"
    np.testing.assert_allclose(np.asarray(st.p.x), r.x, atol=1e-5)
    assert abs(int(st.t) - 1 - r.iterations) <= 1


def test_rcm_recovers_band_from_scrambled_order():
    """Random variable permutation destroys the natural band; the native
    RCM ordering must recover a bandwidth far below n, and the solve must
    still match the dense kernel's argmin."""
    nlp, _sig = _scrambled_chain_nlp()
    pars = _pars()
    bk = BandedKernel(nlp, pars)
    # scrambled natural bandwidth is ~n; RCM gets back to O(stage width)
    assert bk.bandwidth < nlp.n // 2
    st = bk.run_chunk(bk.initial_state())
    assert int(st.status) == OPTIMAL

    from onephase_tpu import one_phase_solve
    r = one_phase_solve(nlp, pars)
    np.testing.assert_allclose(np.asarray(st.p.x), r.x, atol=1e-5)
