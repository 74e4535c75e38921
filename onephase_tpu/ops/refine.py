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


# ----------------------------------------------------------------------
# f32-pair ("double-single") products for f64 SOLVES on TPU.
#
# TPUs have no f64 ALU: every f64 op XLA emits is software-emulated, and
# the profile of the ECON flagship (results/profile_econ_250.md) showed
# the refinement/direction J-matvecs in emulated f64 dominating the outer
# iteration (direction 143 ms of a 524 ms outer at m=62751, n=500).
# Representing the f64 operands as exact f32 (hi, lo) pairs lets the same
# compensated machinery above run on NATIVE f32 vector ops, with the
# eps32-magnitude correction term riding the MXU: relative error
# ~ log(n) * eps32^2 ~ 1e-13 — beyond the 1e-12 refinement target, at
# roughly a tenth of the emulated-f64 cost.
# ----------------------------------------------------------------------

def pair_split(A):
    """Exact f32 (hi, lo) pair representation of an f64 array."""
    hi = A.astype(jnp.float32)
    lo = (A - hi.astype(A.dtype)).astype(jnp.float32)
    return hi, lo


def pair_matvec64(A, x):
    """(A @ x) for f64 A (m, n), x (n,) -> f64, via f32 double-single.

    hi-hi products are compensated (two_prod + ds tree); the eps32-small
    cross terms Alo@xh and Ahi@xl are plain f32 MXU matmuls (their own
    rounding is ~eps32^2 relative to the result).
    """
    Ah, Al = pair_split(A)
    xh, xl = pair_split(x)
    hi, lo = ds_matvec(Ah, xh, xl)
    corr = Al @ xh
    hi, lo = ds_add(hi, lo, corr, jnp.zeros_like(corr))
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def pair_matvec64_t(A, w):
    """(A.T @ w) for f64 A (m, n), w (m,) -> f64, via f32 double-single."""
    Ah, Al = pair_split(A)
    wh, wl = pair_split(w)
    hi, lo = ds_matvec(Ah.T, wh, wl)
    corr = Al.T @ wh
    hi, lo = ds_add(hi, lo, corr, jnp.zeros_like(corr))
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)
