"""Pallas block-tridiagonal kernels (ops/tridiag_pallas.py): parity with
the XLA scan implementation, inertia protocol, and the ChainKernel
integration (interpret mode on CPU; the TPU win is measured in
results/profile_tridiag_tpu.md)."""

import jax.numpy as jnp
import numpy as np

import onephase_tpu.ops as ops
from onephase_tpu.ops.block_tridiag import (TridiagFactor, tridiag_factor,
                                            tridiag_solve)
from onephase_tpu.ops.tridiag_pallas import (pallas_tridiag_factor,
                                             pallas_tridiag_solve)


def _spd_band(K, nb, seed=3, dtype=np.float32):
    rng = np.random.default_rng(seed)
    Ad = rng.normal(size=(K, nb, nb)).astype(dtype)
    Ad = np.einsum("kij,klj->kil", Ad, Ad) + 3 * np.eye(nb, dtype=dtype)
    Bs = (rng.normal(size=(max(K - 1, 0), nb, nb)) * 0.3).astype(dtype)
    return Ad, Bs


def test_pallas_tridiag_matches_scan():
    rng = np.random.default_rng(0)
    for K, nb in [(8, 3), (6, 16), (1, 5), (12, 8)]:
        Ad, Bs = _spd_band(K, nb)
        delta = 1e-3
        ref = tridiag_factor(jnp.asarray(Ad), jnp.asarray(Bs), delta)
        Ck, Ci, Ek, ok = pallas_tridiag_factor(
            jnp.asarray(Ad), jnp.asarray(Bs), delta, interpret=True)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(Ck), np.asarray(ref.Ck),
                                   atol=2e-5)
        if K > 1:
            np.testing.assert_allclose(np.asarray(Ek), np.asarray(ref.Ek),
                                       atol=2e-5)
        b = rng.normal(size=(K, nb)).astype(np.float32)
        x_ref = tridiag_solve(ref, jnp.asarray(b))
        x = pallas_tridiag_solve(Ci, Ek, jnp.asarray(b), interpret=True)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   atol=2e-5)


def test_pallas_tridiag_indefinite_rejected():
    Ad, Bs = _spd_band(8, 6)
    Ad[3] -= 50.0 * np.eye(6, dtype=np.float32)
    _, _, _, ok = pallas_tridiag_factor(jnp.asarray(Ad), jnp.asarray(Bs),
                                        0.0, interpret=True)
    assert not bool(ok)


def test_chain_kernel_pallas_backend_matches_xla():
    from onephase_tpu.config import Params
    from onephase_tpu.ipm.state import OPTIMAL
    from onephase_tpu.models.examples import chain_ocp
    from onephase_tpu.parallel.chain import ChainKernel

    spec = chain_ocp(K=8, nx=6, mc=3)
    o = {"output_level": 0, "term.max_it": 100, "chunk_size": 100,
         "history_capacity": 2}
    st_x = ChainKernel(spec, Params().with_overrides(o)).run_chunk(
        ChainKernel(spec, Params().with_overrides(o)).initial_state())

    ops.INTERPRET = True
    try:
        pars_p = Params().with_overrides(
            dict(o, **{"kkt.linear_solver_type": "pallas"}))
        ck = ChainKernel(spec, pars_p)
        st_p = ck.run_chunk(ck.initial_state())
    finally:
        ops.INTERPRET = False
    assert int(st_p.status) == OPTIMAL
    assert int(st_p.t) == int(st_x.t)
    np.testing.assert_allclose(np.asarray(st_p.p.x), np.asarray(st_x.p.x),
                               atol=1e-5)
