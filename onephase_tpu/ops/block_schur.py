"""Block-angular (arrow) KKT factorization with scenario sharding.

For two-stage / scenario-structured NLPs (ECON/Tax-style, SURVEY.md §2.4,
§7 item 5) the primal Schur complement has arrow structure over
(coupling z, scenario blocks x_1..x_K):

    Q = [[Q_zz, B_1^T ... B_K^T],
         [B_1,  Q_11            ],
         [ ...,        ...      ],
         [B_K,             Q_KK ]]

Factorization by block elimination:
    L_k = chol(Q_kk + delta I)                      (vmapped over scenarios)
    S   = Q_zz + delta I - sum_k B_k^T Q_kk^{-1} B_k    (psum over shards)
    L_S = chol(S)
Inertia is correct iff every chol succeeds — exactly the Schur-path inertia
rule lifted blockwise.

`sharded_*` variants run the scenario axis under `shard_map` over a mesh
axis ("blk"): each device factors its scenarios locally and one
`psum` assembles the border S — the collective rides ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ArrowFactor(NamedTuple):
    Lk: jnp.ndarray    # (K, nx, nx) scenario Cholesky factors
    LS: jnp.ndarray    # (nz, nz) border Cholesky factor
    ok: jnp.ndarray    # bool


def _chol_ok(M):
    L = jnp.linalg.cholesky(M)
    d = jnp.diagonal(L)
    return L, jnp.all(jnp.isfinite(d)) & jnp.all(d > 0)


def arrow_factor(Qzz, Qkk, Bk, delta) -> ArrowFactor:
    """Qzz (nz,nz); Qkk (K,nx,nx); Bk (K,nx,nz)."""
    nz = Qzz.shape[0]
    nx = Qkk.shape[1]
    eye_x = jnp.eye(nx, dtype=Qkk.dtype)

    def per_block(Qb, Bb):
        L, ok = _chol_ok(Qb + delta * eye_x)
        # W = Q_kk^{-1} B_k via two triangular solves
        Z = jax.scipy.linalg.solve_triangular(L, Bb, lower=True)
        contrib = Z.T @ Z          # B^T Q^{-1} B
        return L, ok, contrib

    Lk, oks, contribs = jax.vmap(per_block)(Qkk, Bk)
    S = Qzz + delta * jnp.eye(nz, dtype=Qzz.dtype) - jnp.sum(contribs, 0)
    LS, okS = _chol_ok(S)
    return ArrowFactor(Lk=Lk, LS=LS, ok=jnp.all(oks) & okS)


def arrow_solve(f: ArrowFactor, Bk, rz, rk):
    """Solve the arrow system for (dz, dxk): rz (nz,), rk (K, nx)."""
    def fwd(L, B, r):
        u = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        BtQinv_r = jax.scipy.linalg.solve_triangular(L, B, lower=True).T @ u
        return u, BtQinv_r

    us, border = jax.vmap(fwd)(f.Lk, Bk, rk)
    rhs_z = rz - jnp.sum(border, 0)
    t = jax.scipy.linalg.solve_triangular(f.LS, rhs_z, lower=True)
    dz = jax.scipy.linalg.solve_triangular(f.LS.T, t, lower=False)

    def bwd(L, B, u):
        v = u - jax.scipy.linalg.solve_triangular(L, B @ dz, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, v, lower=False)

    dxk = jax.vmap(bwd)(f.Lk, Bk, us)
    return dz, dxk


# ---------------------------------------------------------------------------
# sharded variants: scenario axis distributed over a mesh axis "blk"
# ---------------------------------------------------------------------------
def sharded_arrow_factor_solve(mesh: Mesh, Qzz, Qkk, Bk, delta, rz, rk,
                               axis: str = "blk"):
    """Factor + solve with scenarios sharded over `axis`.

    Every device holds K/D scenarios; S is assembled with one psum over the
    mesh axis, the border solve is replicated, and the scenario back-solves
    stay local.  Returns (dz, dxk, ok).
    """
    from jax.experimental.shard_map import shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(), P(axis)),
        out_specs=(P(), P(axis), P()),
        check_rep=False)
    def impl(Qzz, Qkk, Bk, delta, rz, rk):
        nz = Qzz.shape[0]
        nx = Qkk.shape[1]
        eye_x = jnp.eye(nx, dtype=Qkk.dtype)

        def per_block(Qb, Bb, r):
            L, ok = _chol_ok(Qb + delta * eye_x)
            Z = jax.scipy.linalg.solve_triangular(L, Bb, lower=True)
            u = jax.scipy.linalg.solve_triangular(L, r, lower=True)
            return L, ok, Z.T @ Z, Z.T @ u, u

        Lk, oks, contribs, borders, us = jax.vmap(per_block)(Qkk, Bk, rk)
        local_S = jnp.sum(contribs, 0)
        local_b = jnp.sum(borders, 0)
        S_sum = lax.psum(local_S, axis)           # ICI collective
        b_sum = lax.psum(local_b, axis)
        ok_all = lax.psum(jnp.all(oks).astype(jnp.int32), axis)
        S = Qzz + delta * jnp.eye(nz, dtype=Qzz.dtype) - S_sum
        LS, okS = _chol_ok(S)
        t = jax.scipy.linalg.solve_triangular(LS, rz - b_sum, lower=True)
        dz = jax.scipy.linalg.solve_triangular(LS.T, t, lower=False)

        def bwd(L, B, u):
            v = u - jax.scipy.linalg.solve_triangular(L, B @ dz, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, v, lower=False)

        dxk = jax.vmap(bwd)(Lk, Bk, us)
        n_dev = lax.psum(jnp.asarray(1, jnp.int32), axis)
        ok = (ok_all == n_dev) & okS
        return dz, dxk, ok

    return impl(Qzz, Qkk, Bk, jnp.asarray(delta, Qzz.dtype), rz, rk)
