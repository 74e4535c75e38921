"""Block-angular KKT factorization tests (scenario Schur, ops/block_schur).

Validates the arrow factor/solve against a dense assembled system, and the
shard_map+psum variant against the local one on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu.ops.block_schur import (arrow_factor, arrow_solve,
                                          sharded_arrow_factor_solve)
from onephase_tpu.parallel.mesh import make_mesh


def make_arrow(K=8, nx=6, nz=4, seed=0):
    rng = np.random.default_rng(seed)
    Qzz = rng.normal(size=(nz, nz))
    Qzz = Qzz @ Qzz.T + 2 * np.eye(nz)
    Qkk = np.zeros((K, nx, nx))
    Bk = rng.normal(size=(K, nx, nz)) * 0.3
    for k in range(K):
        M = rng.normal(size=(nx, nx))
        Qkk[k] = M @ M.T + 2 * np.eye(nx)
    rz = rng.normal(size=nz)
    rk = rng.normal(size=(K, nx))
    return Qzz, Qkk, Bk, rz, rk


def dense_assemble(Qzz, Qkk, Bk, delta):
    K, nx, _ = Qkk.shape
    nz = Qzz.shape[0]
    N = nz + K * nx
    Q = np.zeros((N, N))
    Q[:nz, :nz] = Qzz
    for k in range(K):
        sl = slice(nz + k * nx, nz + (k + 1) * nx)
        Q[sl, sl] = Qkk[k]
        Q[sl, :nz] = Bk[k]
        Q[:nz, sl] = Bk[k].T
    return Q + delta * np.eye(N)


def test_arrow_matches_dense():
    Qzz, Qkk, Bk, rz, rk = make_arrow()
    delta = 1e-3
    f = arrow_factor(jnp.asarray(Qzz), jnp.asarray(Qkk), jnp.asarray(Bk),
                     delta)
    assert bool(f.ok)
    dz, dxk = arrow_solve(f, jnp.asarray(Bk), jnp.asarray(rz),
                          jnp.asarray(rk))
    Q = dense_assemble(Qzz, Qkk, Bk, delta)
    sol = np.linalg.solve(Q, np.concatenate([rz, rk.ravel()]))
    np.testing.assert_allclose(np.asarray(dz), sol[:4], atol=1e-9)
    np.testing.assert_allclose(np.asarray(dxk).ravel(), sol[4:], atol=1e-9)


def test_arrow_inertia_detects_indefinite():
    Qzz, Qkk, Bk, rz, rk = make_arrow()
    Qkk[2] -= 10 * np.eye(6)        # make one block indefinite
    f = arrow_factor(jnp.asarray(Qzz), jnp.asarray(Qkk), jnp.asarray(Bk),
                     0.0)
    assert not bool(f.ok)
    # large delta restores definiteness
    f2 = arrow_factor(jnp.asarray(Qzz), jnp.asarray(Qkk), jnp.asarray(Bk),
                      20.0)
    assert bool(f2.ok)


def test_sharded_matches_local():
    Qzz, Qkk, Bk, rz, rk = make_arrow(K=8)
    delta = 1e-3
    mesh = make_mesh(8, axis="blk")
    dz_s, dxk_s, ok = sharded_arrow_factor_solve(
        mesh, jnp.asarray(Qzz), jnp.asarray(Qkk), jnp.asarray(Bk),
        delta, jnp.asarray(rz), jnp.asarray(rk))
    assert bool(ok)
    f = arrow_factor(jnp.asarray(Qzz), jnp.asarray(Qkk), jnp.asarray(Bk),
                     delta)
    dz, dxk = arrow_solve(f, jnp.asarray(Bk), jnp.asarray(rz),
                          jnp.asarray(rk))
    np.testing.assert_allclose(np.asarray(dz_s), np.asarray(dz), atol=1e-10)
    np.testing.assert_allclose(np.asarray(dxk_s), np.asarray(dxk),
                               atol=1e-10)
