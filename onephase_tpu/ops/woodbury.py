"""Woodbury-identity solver and extreme-eigenvalue estimation.

Reference: the dormant helpers in src/helpers/ (not wired into the module
build there, README "not currently in use"): woodbury.jl:3-77 (low-rank
update solver with iterative refinement) and eigenvalues.jl:3-41 (inverse
iteration for the minimum eigenvalue).  Provided here as working utilities:
the Woodbury form is how a low-rank constraint block can reuse an existing
Cholesky factor without refactoring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def woodbury_solve(solve_A, U, C, V, b, refine: int = 2, matvec_A=None):
    """Solve (A + U C V) x = b given x -> A^{-1} x.

    x = A^{-1} b - A^{-1} U (C^{-1} + V A^{-1} U)^{-1} V A^{-1} b,
    with optional iterative refinement when `matvec_A` is supplied
    (reference woodbury.jl does fixed-count refinement the same way).
    """
    k = U.shape[1]
    Ainv_b = solve_A(b)
    Ainv_U = jax.vmap(solve_A, in_axes=1, out_axes=1)(U)
    S = jnp.linalg.inv(C) + V @ Ainv_U
    core = jnp.linalg.solve(S, V @ Ainv_b)
    x = Ainv_b - Ainv_U @ core
    if matvec_A is not None:
        def full_mv(v):
            return matvec_A(v) + U @ (C @ (V @ v))
        for _ in range(refine):
            r = b - full_mv(x)
            Ainv_r = solve_A(r)
            Ainv_Ur = Ainv_U  # same prefactor
            core_r = jnp.linalg.solve(S, V @ Ainv_r)
            x = x + (Ainv_r - Ainv_Ur @ core_r)
    return x


def min_eig_inverse_iteration(matvec, solve_shifted, n, shift=0.0,
                              iters: int = 30, key=None, dtype=jnp.float64):
    """Estimate the minimum eigenvalue of a symmetric operator by inverse
    iteration on (A - shift I) (reference eigenvalues.jl:3-41)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n,), dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = solve_shifted(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    lam = jnp.dot(v, matvec(v))
    return lam, v
