"""Chain-structured (block-tridiagonal) solver tests: ChainKernel vs the
generic dense kernel — the structured-sparsity path (VERDICT item 10)."""

import jax.numpy as jnp
import numpy as np

from onephase_tpu.config import Params
from onephase_tpu.ipm.core import OnePhaseKernel
from onephase_tpu.ipm.state import OPTIMAL
from onephase_tpu.models.examples import chain_ocp
from onephase_tpu.nlp import canonicalize
from onephase_tpu.parallel.chain import ChainKernel
from onephase_tpu.ops.block_tridiag import (TridiagFactor, partitioned_factor,
                                            partitioned_solve, tridiag_factor,
                                            tridiag_matvec, tridiag_solve)


def _pars():
    return Params().with_overrides({
        "output_level": 0, "term.max_it": 100, "chunk_size": 100,
        "history_capacity": 2})


def _dense_from_blocks(Ad, Bs):
    K, nb, _ = Ad.shape
    Q = np.zeros((K * nb, K * nb))
    for k in range(K):
        Q[k*nb:(k+1)*nb, k*nb:(k+1)*nb] = Ad[k]
    for k in range(K - 1):
        Q[(k+1)*nb:(k+2)*nb, k*nb:(k+1)*nb] = Bs[k]
        Q[k*nb:(k+1)*nb, (k+1)*nb:(k+2)*nb] = Bs[k].T
    return Q


def test_tridiag_factor_solve_matches_dense():
    rng = np.random.default_rng(0)
    K, nb = 7, 5
    Ad = rng.normal(size=(K, nb, nb))
    Ad = np.einsum("kij,klj->kil", Ad, Ad) + 3 * np.eye(nb)
    Bs = rng.normal(size=(K - 1, nb, nb)) * 0.3
    b = rng.normal(size=(K, nb))
    delta = 1e-3

    f = tridiag_factor(jnp.asarray(Ad), jnp.asarray(Bs), delta)
    assert bool(f.ok)
    x = np.asarray(tridiag_solve(f, jnp.asarray(b)))

    Q = _dense_from_blocks(Ad, Bs) + delta * np.eye(K * nb)
    x_ref = np.linalg.solve(Q, b.reshape(-1)).reshape(K, nb)
    np.testing.assert_allclose(x, x_ref, atol=1e-9)

    mv = np.asarray(tridiag_matvec(jnp.asarray(Ad), jnp.asarray(Bs),
                                   jnp.asarray(b)))
    mv_ref = ((Q - delta * np.eye(K * nb)) @ b.reshape(-1)).reshape(K, nb)
    np.testing.assert_allclose(mv, mv_ref, atol=1e-9)


def test_tridiag_indefinite_rejected():
    rng = np.random.default_rng(1)
    K, nb = 4, 3
    Ad = rng.normal(size=(K, nb, nb))
    Ad = np.einsum("kij,klj->kil", Ad, Ad) + 0.5 * np.eye(nb)
    Ad[2] -= 10.0 * np.eye(nb)          # indefinite block
    Bs = rng.normal(size=(K - 1, nb, nb)) * 0.1
    f = tridiag_factor(jnp.asarray(Ad), jnp.asarray(Bs), 0.0)
    assert not bool(f.ok)


def test_chain_direction_matches_generic():
    spec = chain_ocp(K=8, nx=6, mc=3)
    pars = _pars()
    ck = ChainKernel(spec, pars)
    gk = OnePhaseKernel(canonicalize(spec.to_nlpspec()), pars)

    st_c = ck.initial_state()
    st_g = gk.initial_state()
    np.testing.assert_allclose(np.asarray(st_c.p.x), np.asarray(st_g.p.x),
                               atol=1e-9)

    f_c = ck.form_factor(st_c.p, st_c.cache, st_c.fact)
    f_g = gk.form_factor(st_g.p, st_g.cache, st_g.fact)
    np.testing.assert_allclose(np.asarray(f_c.schur_diag),
                               np.asarray(f_g.schur_diag), atol=1e-8)
    delta = 1e-8
    LD_c, ok_c = ck.factor(f_c.Q, delta)
    LD_g, ok_g = gk.factor(f_g.Q, delta)
    assert bool(ok_c) and bool(ok_g)
    f_c = f_c._replace(L=LD_c[0], D=LD_c[1],
                       delta=jnp.asarray(delta, ck.dtype))
    f_g = f_g._replace(L=LD_g[0], D=LD_g[1],
                       delta=jnp.asarray(delta, gk.dtype))
    d_c, r_c = ck.compute_direction(f_c, st_c.p, st_c.cache, 0.0, 0.0, 0.0)
    d_g, r_g = gk.compute_direction(f_g, st_g.p, st_g.cache, 0.0, 0.0, 0.0)
    for fld in ("x", "y", "s"):
        a, b = np.asarray(getattr(d_c, fld)), np.asarray(getattr(d_g, fld))
        assert np.abs(a - b).max() / (1 + np.abs(a).max()) < 1e-7, fld
    assert float(r_c) < 1e-8


def test_chain_end_to_end_matches_generic():
    spec = chain_ocp(K=8, nx=6, mc=3)
    pars = _pars()
    ck = ChainKernel(spec, pars)
    st = ck.run_chunk(ck.initial_state())
    assert int(st.status) == OPTIMAL

    from onephase_tpu import one_phase_solve
    r = one_phase_solve(canonicalize(spec.to_nlpspec()), pars)
    assert r.status == "Optimal"
    np.testing.assert_allclose(np.asarray(st.p.x), r.x, atol=1e-5)
    assert abs(int(st.t) - 1 - r.iterations) <= 1


def test_partitioned_factor_matches_dense():
    rng = np.random.default_rng(3)
    for K, nb, P in [(8, 3, 4), (16, 5, 4), (6, 4, 3)]:
        Ad = rng.normal(size=(K, nb, nb))
        Ad = np.einsum("kij,klj->kil", Ad, Ad) + 3 * np.eye(nb)
        Bs = rng.normal(size=(K - 1, nb, nb)) * 0.3
        b = rng.normal(size=(K, nb))
        delta = 1e-3
        f = partitioned_factor(jnp.asarray(Ad), jnp.asarray(Bs), delta, P)
        assert bool(f.ok)
        x = np.asarray(partitioned_solve(f, jnp.asarray(b)))
        Q = _dense_from_blocks(Ad, Bs) + delta * np.eye(K * nb)
        x_ref = np.linalg.solve(Q, b.reshape(-1)).reshape(K, nb)
        np.testing.assert_allclose(x, x_ref, atol=1e-9)


def test_partitioned_indefinite_rejected():
    rng = np.random.default_rng(4)
    K, nb, P = 8, 3, 4
    Ad = rng.normal(size=(K, nb, nb))
    Ad = np.einsum("kij,klj->kil", Ad, Ad) + 3 * np.eye(nb)
    Bs = rng.normal(size=(K - 1, nb, nb)) * 0.3
    # K=8, P=4 -> chunks of Kc=2; separators are the last stage of each
    # chunk (stages 1,3,5,7), interiors are stages 0,2,4,6.
    Ad[4] -= 50.0 * np.eye(nb)   # stage 4: interior stage of chunk 2
    f = partitioned_factor(jnp.asarray(Ad), jnp.asarray(Bs), 0.0, P)
    assert not bool(f.ok)
    Ad[4] += 50.0 * np.eye(nb)
    Ad[7] -= 50.0 * np.eye(nb)   # stage 7: separator stage
    f = partitioned_factor(jnp.asarray(Ad), jnp.asarray(Bs), 0.0, P)
    assert not bool(f.ok)


def test_chain_partitioned_end_to_end_matches_sequential():
    """Partitioned (nested-dissection) chain solve follows the sequential
    block recursion exactly — same trajectory, same certificate."""
    spec = chain_ocp(K=16, nx=6, mc=3)
    st_seq = ChainKernel(spec, _pars()).run_chunk(
        ChainKernel(spec, _pars()).initial_state())
    pars_p = _pars().with_overrides({"kkt.chain_partitions": 4})
    ck = ChainKernel(spec, pars_p)
    st_par = ck.run_chunk(ck.initial_state())
    assert int(st_par.status) == OPTIMAL
    assert int(st_par.t) == int(st_seq.t)
    np.testing.assert_allclose(np.asarray(st_par.p.x),
                               np.asarray(st_seq.p.x), atol=1e-7)


def test_chain_sharded_matches_unsharded():
    """Chunk axis sharded over the 8-device CPU mesh: identical trajectory
    to the single-device partitioned solve."""
    import jax
    from jax.sharding import Mesh

    spec = chain_ocp(K=16, nx=6, mc=3)
    pars_p = _pars().with_overrides({"kkt.chain_partitions": 8})
    ck0 = ChainKernel(spec, pars_p)
    st0 = ck0.run_chunk(ck0.initial_state())

    mesh = Mesh(np.array(jax.devices()[:8]), ("chain",))
    ck = ChainKernel(spec, pars_p, mesh=mesh)
    st = ck.run_chunk(ck.initial_state())
    assert int(st.status) == OPTIMAL
    assert int(st.t) == int(st0.t)
    np.testing.assert_allclose(np.asarray(st.p.x), np.asarray(st0.p.x),
                               atol=1e-8)


def test_chain_full_solve_5k_variables():
    """>= 5k variables within budget (VERDICT item 10): K=200 stages of
    nx=32 -> 6400 variables, never forming the 6400^2 dense Schur
    complement."""
    spec = chain_ocp(K=200, nx=32, mc=8)
    ck = ChainKernel(spec, _pars())
    st = ck.run_chunk(ck.initial_state())
    assert int(st.status) == OPTIMAL
