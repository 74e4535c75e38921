"""Block-tridiagonal Cholesky for chain-structured (OCP-style) KKT systems.

The sparse-scaling story of the framework (SURVEY.md §5 "scaling-axis",
reference Class_iterate.jl:4-20 sparse cache / julia.jl sparse CHOLMOD):
instead of a general sparse factorization — which maps poorly to the MXU —
chain-structured NLPs (multiple-shooting optimal control, discretized
chains; reference CHAIN, test/CUTEst.jl:11-30) keep their Schur complement
in block-tridiagonal form

    Q = tridiag(B_{k-1}, A_k, B_k^T),   A_k (nb,nb), B_k = Q[k+1,k]

and factor it with K sequential nb-sized dense Cholesky steps under
`lax.scan` — O(K nb^3) work and O(K nb^2) memory instead of O((K nb)^3) /
O((K nb)^2).  Every step is MXU-dense; only the K-recursion is sequential.

    C_0 = chol(A_0 + delta I)
    E_k = B_k C_k^{-T}                       (subdiagonal of L)
    C_{k+1} = chol(A_{k+1} + delta I - E_k E_k^T)

Inertia rule: correct iff every block Cholesky succeeds — the Schur-path
rule (julia.jl:28-46) lifted blockwise, exactly as in ops/block_schur.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class TridiagFactor(NamedTuple):
    Ck: jnp.ndarray    # (K, nb, nb) diagonal Cholesky blocks
    Ek: jnp.ndarray    # (K-1, nb, nb) subdiagonal blocks of L
    ok: jnp.ndarray    # bool


def _chol_ok(M):
    L = jnp.linalg.cholesky(M)
    d = jnp.diagonal(L)
    return L, jnp.all(jnp.isfinite(d)) & jnp.all(d > 0)


def tridiag_factor(Ad, Bs, delta) -> TridiagFactor:
    """Ad (K, nb, nb) diagonal blocks; Bs (K-1, nb, nb) subdiagonal blocks
    B_k = Q[k+1, k]; delta added to every diagonal entry."""
    K, nb, _ = Ad.shape
    eye = jnp.eye(nb, dtype=Ad.dtype)
    C0, ok0 = _chol_ok(Ad[0] + delta * eye)

    def step(carry, inp):
        C_prev, ok = carry
        Ak, Bk = inp
        # E = B C_prev^{-T}  <=>  E^T = C_prev^{-1} B^T
        Et = jax.scipy.linalg.solve_triangular(C_prev, Bk.T, lower=True)
        C, okk = _chol_ok(Ak + delta * eye - Et.T @ Et)
        return (C, ok & okk), (C, Et.T)

    if K == 1:
        return TridiagFactor(C0[None], jnp.zeros((0, nb, nb), Ad.dtype), ok0)
    (_, ok), (Cs, Es) = lax.scan(step, (C0, ok0), (Ad[1:], Bs))
    return TridiagFactor(jnp.concatenate([C0[None], Cs]), Es, ok)


def tridiag_solve(f: TridiagFactor, b):
    """Solve L L^T x = b with b (K, nb); two block scans."""
    K, nb, _ = f.Ck.shape

    def tlo(C, r):
        return jax.scipy.linalg.solve_triangular(C, r, lower=True)

    def tup(C, r):
        return jax.scipy.linalg.solve_triangular(C.T, r, lower=False)

    y0 = tlo(f.Ck[0], b[0])
    if K == 1:
        return tup(f.Ck[0], y0)[None]

    def fwd(y_prev, inp):
        Ck, Ek, bk = inp
        y = tlo(Ck, bk - Ek @ y_prev)
        return y, y

    _, ys = lax.scan(fwd, y0, (f.Ck[1:], f.Ek, b[1:]))
    y = jnp.concatenate([y0[None], ys])

    xK = tup(f.Ck[-1], y[-1])

    def bwd(x_next, inp):
        Ck, Ek, yk = inp
        x = tup(Ck, yk - Ek.T @ x_next)
        return x, x

    _, xs = lax.scan(bwd, xK, (f.Ck[:-1], f.Ek, y[:-1]), reverse=True)
    return jnp.concatenate([xs, xK[None]])


def tridiag_matvec(Ad, Bs, v):
    """Block-tridiagonal matvec: (Q v)_k = A_k v_k + B_{k-1} v_{k-1}
    + B_k^T v_{k+1}; v (K, nb)."""
    out = jnp.einsum("kij,kj->ki", Ad, v)
    if Bs.shape[0]:
        lower = jnp.einsum("kij,kj->ki", Bs, v[:-1])   # into rows 1..K-1
        upper = jnp.einsum("kji,kj->ki", Bs, v[1:])    # B_k^T v_{k+1}
        out = out.at[1:].add(lower).at[:-1].add(upper)
    return out
