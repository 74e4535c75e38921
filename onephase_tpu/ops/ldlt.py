"""Dense symmetric-indefinite LDL^T factorization with inertia extraction.

TPU-native replacement for the reference's sparse LDL^T backends
(SuiteSparse `ldlt()` in julia.jl:48-66, HSL MA97 in hsl.jl, MUMPS): the
augmented KKT matrix [[H+delta*I, J^T], [J, -S/Y]] is symmetric
*quasi-definite* once delta makes the (1,1) block definite, so LDL^T in the
natural order needs no pivoting (Vanderbei 1995); when the inertia is wrong
a non-positive leading pivot shows up in D exactly as it does in the
reference's D-diagonal sign count (julia.jl:70-90).

Two backends:
- `ldlt`: right-looking unpivoted LDL^T as a `lax.fori_loop` of rank-1
  updates (O(n) sequential steps of vectorized O(n^2) work).
- `eigh_inertia`: spectral factorization (XLA-native `eigh`) — exact
  inertia; selected with `kkt.linear_solver_type = "eigh"` on the
  symmetric/clever paths (the robust-alternative role of MA97, hsl.jl).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# reference tol for counting D's signs (julia.jl:74)
DIAG_TOL = 1e-20


def ldlt(K):
    """Returns (L, d): unit-lower L and diagonal d with K = L diag(d) L^T.

    No pivoting: intended for quasi-definite KKT systems.  A breakdown
    (zero pivot) yields inf/nan entries which the inertia check rejects.
    """
    n = K.shape[0]
    idx = jnp.arange(n)

    def body(j, A):
        dj = A[j, j]
        dj_safe = jnp.where(dj == 0.0, 1.0, dj)
        col = A[:, j] / dj_safe
        col = jnp.where(idx > j, col, 0.0)           # strict lower part
        rowj = jnp.where(idx > j, A[j, :], 0.0)
        A = A - jnp.outer(col, rowj)
        # store L's column j (below diagonal) back, keep d on the diagonal
        A = A.at[:, j].set(jnp.where(idx > j, col, A[:, j]))
        return A

    A = lax.fori_loop(0, n, body, K)
    d = jnp.diagonal(A)
    L = jnp.tril(A, -1) + jnp.eye(n, dtype=K.dtype)
    return L, d


def ldlt_solve(L, d, b):
    z = jax.scipy.linalg.solve_triangular(L, b, lower=True,
                                          unit_diagonal=True)
    d_safe = jnp.where(d == 0.0, 1.0, d)
    z = z / d_safe
    return jax.scipy.linalg.solve_triangular(L.T, z, lower=False,
                                             unit_diagonal=True)


def inertia_status(d, n, m):
    """reference inertia_status (linear_system_solvers.jl:48-91):
    correct iff #pos == n and #neg == m, no zero/nan/inf pivots."""
    finite = jnp.all(jnp.isfinite(d))
    pos = jnp.sum(d > DIAG_TOL)
    neg = jnp.sum(d < -DIAG_TOL)
    zer = d.shape[0] - pos - neg
    return finite & (pos == n) & (neg == m) & (zer == 0)


def eigh_inertia(K):
    """Spectral factorization backend: returns (V, w)."""
    w, V = jnp.linalg.eigh(K)
    return V, w


def eigh_solve(V, w, b):
    w_safe = jnp.where(w == 0.0, 1.0, w)
    return V @ ((V.T @ b) / w_safe)
