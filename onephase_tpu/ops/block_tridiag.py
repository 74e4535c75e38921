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


class PartitionedFactor(NamedTuple):
    """Nested-dissection factorization of a block-tridiagonal SPD matrix.

    K = P * Kc stages are split into P chunks; the last stage of each
    chunk is a *separator*.  The Li = Kc-1 interior stages of every chunk
    factor independently (vmapped over P — the parallel axis, shardable
    over a device mesh), leaving a P-block reduced tridiagonal system
    over the separators (tiny, sequential).  Elimination order
    (interiors first, separators last) is just a permutation, so "every
    block Cholesky succeeds" still certifies positive definiteness —
    the same inertia rule as `tridiag_factor` (julia.jl:28-46).
    """
    interiors: TridiagFactor   # Ck (P, Li, nb, nb), Ek (P, Li-1, nb, nb)
    Gu: jnp.ndarray            # (P, Li, nb, nb) = T_p^{-1} u_p
    Gv: jnp.ndarray            # (P, Li, nb, nb) = T_p^{-1} v_p  (v_0 = 0)
    Bu: jnp.ndarray            # (P, nb, nb) coupling B_{s_p - 1}
    Vs: jnp.ndarray            # (P, nb, nb) coupling B_{s_{p-1}} (0 at p=0)
    red: TridiagFactor         # reduced P-block tridiagonal factor
    ok: jnp.ndarray


def check_mesh_partitions(partitions: int, mesh, axis: str) -> None:
    """Validate a chunk-axis sharding request up front: an indivisible
    P/axis-size combination otherwise surfaces as an opaque GSPMD sharding
    error at trace time."""
    if partitions <= 1:
        raise ValueError("a mesh requires kkt.chain_partitions > 1")
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r} (axes: "
                         f"{tuple(mesh.shape)})")
    size = mesh.shape[axis]
    if partitions % size:
        raise ValueError(
            f"kkt.chain_partitions={partitions} must be divisible by the "
            f"mesh {axis!r} axis size {size}")


def shard_partitioned(pf: PartitionedFactor, mesh, axis: str) -> PartitionedFactor:
    """Pin the chunk-parallel leaves of a PartitionedFactor to `axis` of
    `mesh`; the tiny reduced factor stays replicated (its P-step scan is
    sequential).  Shared by ChainKernel and BandedKernel."""
    if mesh is None:
        return pf
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    def shard(a):
        spec = PartitionSpec(axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    return pf._replace(
        interiors=jax.tree_util.tree_map(shard, pf.interiors),
        Gu=shard(pf.Gu), Gv=shard(pf.Gv),
        Bu=shard(pf.Bu), Vs=shard(pf.Vs))


def _partition_blocks(Ad, Bs, P):
    """Split (K,nb,nb)/(K-1,nb,nb) chain blocks into per-chunk pieces."""
    K, nb, _ = Ad.shape
    if K % P or K // P < 2:
        raise ValueError(f"K={K} must be P*Kc with Kc>=2 (P={P})")
    Kc = K // P
    Li = Kc - 1
    Adc = Ad.reshape(P, Kc, nb, nb)
    Bpad = jnp.concatenate([Bs, jnp.zeros((1, nb, nb), Bs.dtype)])
    Bc = Bpad.reshape(P, Kc, nb, nb)
    Ai = Adc[:, :Li]                      # interior diagonal blocks
    Ei = Bc[:, :Li - 1] if Li > 1 else jnp.zeros((P, 0, nb, nb), Bs.dtype)
    Asep = Adc[:, -1]                     # separator diagonal blocks
    Bu = Bc[:, Li - 1]                    # B_{s_p - 1}: interior->own sep
    # v_p = B_{s_{p-1}} couples chunk p's first interior stage to sep p-1
    Vs = jnp.concatenate([jnp.zeros((1, nb, nb), Bs.dtype), Bc[:-1, -1]])
    return Kc, Li, Ai, Ei, Asep, Bu, Vs


def partitioned_factor(Ad, Bs, delta, P) -> PartitionedFactor:
    """Factor tridiag(B, A, B^T) + delta*I with P parallel chunks."""
    K, nb, _ = Ad.shape
    Kc, Li, Ai, Ei, Asep, Bu, Vs = _partition_blocks(Ad, Bs, P)

    interiors = jax.vmap(lambda a, e: tridiag_factor(a, e, delta))(Ai, Ei)

    def couple_rhs(Bu_p, Vs_p):
        U = jnp.zeros((Li, nb, nb), Ad.dtype).at[Li - 1].set(Bu_p.T)
        V = jnp.zeros((Li, nb, nb), Ad.dtype).at[0].set(Vs_p)
        return U, V

    U, V = jax.vmap(couple_rhs)(Bu, Vs)
    Gu = jax.vmap(tridiag_solve)(interiors, U)
    Gv = jax.vmap(tridiag_solve)(interiors, V)

    eye = jnp.eye(nb, dtype=Ad.dtype)
    # S[p,p] = A_sep[p] + dI - u_p' T_p^-1 u_p - v_{p+1}' T_{p+1}^-1 v_{p+1}
    W = jnp.einsum("pji,pjk->pik", Vs, Gv[:, 0])       # v_p' T_p^-1 v_p
    Wnext = jnp.concatenate([W[1:], jnp.zeros((1, nb, nb), Ad.dtype)])
    S_dd = (Asep + delta * eye
            - jnp.einsum("pij,pjk->pik", Bu, Gu[:, -1]) - Wnext)
    # S[p, p-1] = -u_p' T_p^-1 v_p
    S_sub = -jnp.einsum("pij,pjk->pik", Bu[1:], Gv[1:, -1])
    red = tridiag_factor(S_dd, S_sub, 0.0)
    ok = jnp.all(interiors.ok) & red.ok
    return PartitionedFactor(interiors=interiors, Gu=Gu, Gv=Gv, Bu=Bu,
                             Vs=Vs, red=red, ok=ok)


def partitioned_solve(f: PartitionedFactor, b):
    """Solve with b (K, nb); interiors in parallel, reduced sequential."""
    P, Li, nb, _ = f.Gu.shape
    Kc = Li + 1
    bc = b.reshape(P, Kc, nb)
    bi, bsep = bc[:, :Li], bc[:, -1]

    yi = jax.vmap(tridiag_solve)(f.interiors, bi)
    Z = jnp.einsum("pji,pj->pi", f.Vs, yi[:, 0])       # v_p' T_p^-1 b_i
    Znext = jnp.concatenate([Z[1:], jnp.zeros((1, nb), b.dtype)])
    rs = bsep - jnp.einsum("pij,pj->pi", f.Bu, yi[:, -1]) - Znext
    xs = tridiag_solve(f.red, rs)

    xs_prev = jnp.concatenate([jnp.zeros((1, nb), b.dtype), xs[:-1]])
    xi = (yi - jnp.einsum("pkij,pj->pki", f.Gu, xs)
          - jnp.einsum("pkij,pj->pki", f.Gv, xs_prev))
    return jnp.concatenate([xi, xs[:, None]], axis=1).reshape(P * Kc, nb)


def tridiag_matvec(Ad, Bs, v):
    """Block-tridiagonal matvec: (Q v)_k = A_k v_k + B_{k-1} v_{k-1}
    + B_k^T v_{k+1}; v (K, nb)."""
    out = jnp.einsum("kij,kj->ki", Ad, v)
    if Bs.shape[0]:
        lower = jnp.einsum("kij,kj->ki", Bs, v[:-1])   # into rows 1..K-1
        upper = jnp.einsum("kji,kj->ki", Bs, v[1:])    # B_k^T v_{k+1}
        out = out.at[1:].add(lower).at[:-1].add(upper)
    return out
