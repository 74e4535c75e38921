"""Pallas VMEM-resident Cholesky with inertia flag.

The factorization is 35% of the reference's runtime (1.9 factorizations per
outer iteration, docs/one-phase.tex:901-912).  XLA:TPU's `jnp.linalg.cholesky`
is very slow for the batched small-to-medium systems the batched IPM
produces; this kernel keeps the whole matrix in VMEM and runs the
right-looking factorization as one fused kernel — no HBM traffic between
panels, inertia (pivot-positivity) computed in-pass.

Single-instance kernel; batching comes from `jax.vmap` (Pallas's batching
rule turns the batch axis into an extra grid dimension), which is exactly
how the solver core calls `factor` under the batched/sharded drivers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(a_ref, l_ref, ok_ref):
    n = a_ref.shape[0]
    A0 = a_ref[:]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)

    def body(j, carry):
        A, ok = carry
        pivot = jnp.sum(jnp.where((idx == j)[:, None] * (idx == j)[None, :],
                                  A, 0.0))
        ok = ok & (pivot > 0.0) & jnp.isfinite(pivot)
        d = jnp.sqrt(jnp.maximum(pivot, 1e-45))
        colj = jnp.sum(jnp.where((idx == j)[None, :], A, 0.0), axis=1)
        Lcol = jnp.where(idx >= j, colj / d, 0.0)
        below = jnp.where(idx > j, Lcol, 0.0)
        A = A - below[:, None] * below[None, :]
        # write column j of L in place (the trailing update never touches it)
        A = jnp.where((idx == j)[None, :], Lcol[:, None], A)
        return A, ok

    A, ok = jax.lax.fori_loop(0, n, body, (A0, jnp.asarray(True)))
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(row >= col, A, 0.0)
    ok_ref[0, 0] = ok.astype(jnp.int32)


def _chol_solve_kernel(l_ref, b_ref, x_ref):
    """Fused forward+backward substitution: solve L L^T x = b in one
    kernel launch (two latency-bound XLA trisolves become one VMEM pass).

    b/x are carried as (1, n) rows and every intermediate stays 2-D: Mosaic's
    layout inference rejects 1-D loop carries, and a (1, n) row block stays
    lowerable when `jax.vmap` adds a leading (squeezed) batch grid dim."""
    n = l_ref.shape[0]
    L = l_ref[:]
    LT = L.T  # one relayout so the forward sweep reads columns of L as rows
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    dinv = 1.0 / jnp.sum(jnp.where(row == col, L, 0.0), axis=0, keepdims=True)

    # forward: column-sweep on y = L^{-1} b
    def fwd(j, y):
        yj = jnp.sum(jnp.where(idx == j, y * dinv, 0.0))
        colj = jnp.sum(jnp.where(row == j, LT, 0.0), axis=0, keepdims=True)
        upd = jnp.where(idx > j, colj * yj, 0.0)
        return jnp.where(idx == j, yj, y - upd)

    y = jax.lax.fori_loop(0, n, fwd, b_ref[:])

    # backward: column-sweep on x = L^{-T} y (rows of L = columns of L^T)
    def bwd(jj, x):
        j = n - 1 - jj
        xj = jnp.sum(jnp.where(idx == j, x * dinv, 0.0))
        rowj = jnp.sum(jnp.where(row == j, L, 0.0), axis=0, keepdims=True)
        upd = jnp.where(idx < j, rowj * xj, 0.0)
        return jnp.where(idx == j, xj, x - upd)

    x_ref[:] = jax.lax.fori_loop(0, n, bwd, y)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol_solve(L, b, interpret: bool = None):
    """x = (L L^T)^{-1} b with both substitutions fused in one kernel."""
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    n = L.shape[-1]
    x = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), L.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n, transcendentals=0,
            bytes_accessed=(n * n + 2 * n) * L.dtype.itemsize),
    )(L, b.reshape(1, n))
    return x[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol(Q, interpret: bool = None):
    """Returns (L, ok): lower Cholesky factor of Q and pivot-positivity.

    On failure (non-PD) L is garbage and ok is False — callers follow the
    same protocol as `jnp.linalg.cholesky` + finite check.
    """
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    n = Q.shape[-1]
    L, ok = pl.pallas_call(
        _chol_kernel,
        out_shape=(jax.ShapeDtypeStruct((n, n), Q.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3, transcendentals=n,
            bytes_accessed=2 * n * n * Q.dtype.itemsize),
    )(Q)
    return L, ok[0, 0] > 0
