"""Double-single (compensated) arithmetic for iterative-refinement residuals.

The reference leans on f64 (+ optional BigFloat accumulators,
schur.jl:154-156) for refinement.  TPUs are f32-native; plain f32 residuals
stop improving once eps*cond(Q) ~ 1, stalling the solver around
sqrt(eps32) ~ 3e-4.  This module computes residual matvecs in
*double-single* arithmetic — every product split into an exact head and
tail via Dekker/Veltkamp splitting, sums carried as (hi, lo) pairs — giving
~2x-precision residuals from f32 hardware ops only.  Enabled with
`kkt.it_refine_highprec = True`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _split_const(dtype):
    # Veltkamp splitting constant: 2^ceil(p/2) + 1 (p = mantissa bits)
    return {jnp.dtype(jnp.float32): 4097.0,          # 2^12 + 1
            jnp.dtype(jnp.float64): 134217729.0}[jnp.dtype(dtype)]


def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def split(a):
    c = _split_const(a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def ds_add(x_hi, x_lo, y_hi, y_lo):
    s, e = two_sum(x_hi, y_hi)
    e = e + x_lo + y_lo
    hi, lo = two_sum(s, e)
    return hi, lo


def ds_matvec(A, x_hi, x_lo=None):
    """(A @ x) as a double-single pair (hi, lo).

    Products are split exactly; the row reduction carries a compensated
    (hi, lo) accumulator via lax.scan over columns (O(n) sequential steps
    of O(m) vector work — used for the refinement residual only).
    """
    if x_lo is None:
        x_lo = jnp.zeros_like(x_hi)
    P, E = two_prod(A, x_hi[None, :])
    E = E + A * x_lo[None, :]
    return _ds_tree_sum(P, E)


def _ds_tree_sum(P, E):
    """Compensated binary-tree reduction of (m, n) double-single pairs
    along axis 1 -> (m,) pair.

    A sequential compensated scan has O(n) depth — it serializes the TPU
    (measured as the dominant latency of highprec refinement).  The tree
    does the same work at O(log n) depth: every level is one full-width
    vectorized ds_add, and the compensated error carry keeps double-single
    accuracy (each ds_add is exact to ~eps^2 relative).
    """
    n = P.shape[1]
    while n > 1:
        half = (n + 1) // 2
        if n % 2:
            pad = jnp.zeros((P.shape[0], 1), P.dtype)
            P = jnp.concatenate([P[:, :n], pad], axis=1)
            E = jnp.concatenate([E[:, :n], pad], axis=1)
            n = n + 1
        P, E = ds_add(P[:, 0:n:2], E[:, 0:n:2], P[:, 1:n:2], E[:, 1:n:2])
        n = half
    return P[:, 0], E[:, 0]


def ds_axpy(alpha, x_hi, x_lo, y_hi, y_lo):
    """alpha*x + y in double-single (alpha a plain scalar)."""
    p, e = two_prod(jnp.broadcast_to(alpha, x_hi.shape), x_hi)
    e = e + alpha * x_lo
    return ds_add(p, e, y_hi, y_lo)
