"""Blocked Pallas Cholesky + explicit-inverse solve operator.

The factorization is 35% of the reference's runtime (1.9 factorizations per
outer iteration, docs/one-phase.tex:901-912), and each factorization feeds
~10 backsolves (docs/one-phase.tex:908).  On TPU both ops are redesigned
around the MXU rather than translated:

- `pallas_chol` — right-looking *blocked* Cholesky, whole matrix VMEM-
  resident, 128x128 diagonal blocks factored by a masked fori_loop and the
  panel/trailing updates done as MXU matmuls.  All block loops are Python-
  unrolled (static shapes).  Inertia = pivot positivity, computed in-pass
  (reference: julia.jl:28-46 — Cholesky success == correct inertia).
- `pallas_tri_inv_gram` — M = L^-T L^-1 by blocked forward substitution on
  the identity (the diagonal-block inverses + nb^3/6 MXU matmuls) followed
  by one Gram matmul.  Every subsequent backsolve `x = M @ b` is then a
  single MXU matvec: no latency-bound triangular solves anywhere in the
  solve path.  The IPM's fixed-count iterative refinement
  (ipm/core.refine_solve) restores the digits explicit inversion loses, and
  the a-posteriori KKT-error-ratio monitor guards it.

An earlier single-shot (unblocked, whole-matrix fori_loop) kernel OOMed
Mosaic's scoped VMEM at n>=256 on v5e; keeping loop-carried temporaries at
(128,128) and doing everything else as matmuls is the fix and the speedup.

Single-instance kernels; batching comes from `jax.vmap` (the batch axis
becomes an outer grid dimension), which is how the batched/sharded solver
drivers call them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import custom_batching as _custom_batching

BS = 128  # block size: MXU-aligned


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _unblocked_chol(A0, ok0):
    """Masked in-register Cholesky of a (bs, bs) tile; returns (L, ok).

    Every loop intermediate is kept 2-D ((bs,1)/(1,bs)/(bs,bs)) — Mosaic's
    layout inference rejects 1-D vectors carried across masked selects.
    """
    bs = A0.shape[0]
    dt = A0.dtype
    rcol = lax.broadcasted_iota(jnp.int32, (bs, 1), 0)   # row ids, column vec
    crow = lax.broadcasted_iota(jnp.int32, (1, bs), 1)   # col ids, row vec
    row = lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    col = lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    tiny = jnp.asarray(1e-38 if dt == jnp.float32 else 1e-300, dt)

    def body(j, carry):
        A, ok = carry
        pivot = jnp.sum(jnp.where((row == j) & (col == j), A, 0.0))
        ok = ok & (pivot > 0.0) & jnp.isfinite(pivot)
        dinv = lax.rsqrt(jnp.maximum(pivot, tiny))
        colj = jnp.sum(jnp.where(col == j, A, 0.0), axis=1, keepdims=True)
        Lcol = jnp.where(rcol >= j, colj * dinv, 0.0)        # (bs, 1)
        below = jnp.where(rcol > j, Lcol, 0.0)               # (bs, 1)
        A = A - below * below.reshape(1, bs)
        A = jnp.where(col == j, Lcol, A)
        return A, ok

    A, ok = lax.fori_loop(0, bs, body, (A0, ok0))
    return jnp.where(row >= col, A, 0.0), ok


def _tri_inv_unblocked(L):
    """Inverse of a (bs, bs) lower-triangular tile by row-sweep forward
    substitution on the identity.  All intermediates 2-D (see above)."""
    bs = L.shape[0]
    dt = L.dtype
    crow = lax.broadcasted_iota(jnp.int32, (1, bs), 1)
    row = lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    col = lax.broadcasted_iota(jnp.int32, (bs, bs), 1)

    def body(j, Inv):
        lrow = jnp.sum(jnp.where(row == j, L, 0.0), axis=0, keepdims=True)
        lrow = jnp.where(crow < j, lrow, 0.0)                # (1, bs)
        contrib = jnp.dot(lrow, Inv, preferred_element_type=dt)  # (1, bs)
        ej = jnp.where(crow == j, 1.0, 0.0).astype(dt)
        dj = jnp.sum(jnp.where((row == j) & (col == j), L, 0.0))
        newrow = (ej - contrib) / dj                         # (1, bs)
        return jnp.where(row == j, newrow, Inv)

    return lax.fori_loop(0, bs, body, jnp.zeros_like(L))


def _chol_kernel(a_ref, l_ref, d_ref, ok_ref):
    """Blocked right-looking Cholesky; l_ref doubles as workspace."""
    n = a_ref.shape[0]
    bs = min(BS, n)
    nb = n // bs
    dt = a_ref.dtype
    l_ref[:] = a_ref[:]
    ok = jnp.asarray(True)

    for kb in range(nb):
        o = kb * bs
        Lkk, ok = _unblocked_chol(l_ref[o:o + bs, o:o + bs], ok)
        l_ref[o:o + bs, o:o + bs] = Lkk
        ridx = lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
        cidx = lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
        d_ref[0:1, o:o + bs] = jnp.sum(jnp.where(ridx == cidx, Lkk, 0.0),
                                       axis=0, keepdims=True)
        if kb < nb - 1:
            Ikk = _tri_inv_unblocked(Lkk)
            L21 = jnp.dot(l_ref[o + bs:, o:o + bs], Ikk.T,
                          preferred_element_type=dt)
            l_ref[o + bs:, o:o + bs] = L21
            l_ref[o + bs:, o + bs:] -= jnp.dot(L21, L21.T,
                                               preferred_element_type=dt)

    # zero the (junk) strict upper triangle so downstream matmuls see L
    row = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(row >= col, l_ref[:], 0.0)
    ok_ref[0, 0] = ok.astype(jnp.int32)


def _tri_inv_gram_kernel(l_ref, m_ref, li_ref):
    """M = L^-T L^-1 via blocked forward substitution + one Gram matmul."""
    n = l_ref.shape[0]
    bs = min(BS, n)
    nb = n // bs
    dt = l_ref.dtype

    for i in range(nb):
        o = i * bs
        li_ref[o:o + bs, o:o + bs] = _tri_inv_unblocked(l_ref[o:o + bs, o:o + bs])
        for j in range(i):
            oj = j * bs
            acc = jnp.zeros((bs, bs), dt)
            for k in range(j, i):
                ok_ = k * bs
                acc += jnp.dot(l_ref[o:o + bs, ok_:ok_ + bs],
                               li_ref[ok_:ok_ + bs, oj:oj + bs],
                               preferred_element_type=dt)
            li_ref[o:o + bs, oj:oj + bs] = -jnp.dot(
                li_ref[o:o + bs, o:o + bs], acc, preferred_element_type=dt)
        # zero upper blocks of this row band (li_ref scratch is uninitialized)
        for j in range(i + 1, nb):
            li_ref[o:o + bs, j * bs:(j + 1) * bs] = jnp.zeros((bs, bs), dt)

    Li = li_ref[:]
    m_ref[:] = jnp.dot(Li.T, Li, preferred_element_type=dt)


def _pad_spd(Q, n_p):
    """Pad Q to (n_p, n_p) with an identity block (block-diagonal, so the
    leading principal inverse is unchanged)."""
    n = Q.shape[-1]
    if n == n_p:
        return Q
    out = jnp.zeros((n_p, n_p), Q.dtype)
    out = out.at[:n, :n].set(Q)
    idx = jnp.arange(n, n_p)
    return out.at[idx, idx].set(1.0)


def _block_size(n):
    return BS if n >= BS else _round_up(n, 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol(Q, interpret: bool = None):
    """Blocked Cholesky. Returns (L, d, ok): lower factor (padded region
    stripped), its diagonal, and the pivot-positivity flag.

    On failure (non-PD input) L is garbage and ok is False — same protocol
    as `jnp.linalg.cholesky` + finite check (reference julia.jl:28-46).
    """
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    n = Q.shape[-1]
    bs = _block_size(n)
    n_p = _round_up(n, bs)
    Qp = _pad_spd(Q, n_p)
    L, d, ok = pl.pallas_call(
        _chol_kernel,
        out_shape=(jax.ShapeDtypeStruct((n_p, n_p), Q.dtype),
                   jax.ShapeDtypeStruct((1, n_p), Q.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_p ** 3 // 3, transcendentals=n_p,
            bytes_accessed=2 * n_p * n_p * Q.dtype.itemsize),
    )(Qp)
    return L[:n, :n], d[0, :n], ok[0, 0] > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_tri_inv_gram(L, interpret: bool = None):
    """M = (L L^T)^-1 = L^-T L^-1 for a lower-triangular L."""
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    n = L.shape[-1]
    bs = _block_size(n)
    n_p = _round_up(n, bs)
    if n_p != n:
        Lp = jnp.zeros((n_p, n_p), L.dtype).at[:n, :n].set(L)
        idx = jnp.arange(n, n_p)
        Lp = Lp.at[idx, idx].set(1.0)
    else:
        Lp = L
    M = pl.pallas_call(
        _tri_inv_gram_kernel,
        out_shape=jax.ShapeDtypeStruct((n_p, n_p), L.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_p, n_p), L.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_p ** 3 // 3 + 2 * n_p ** 3, transcendentals=0,
            bytes_accessed=3 * n_p * n_p * L.dtype.itemsize),
    )(Lp)
    return M[:n, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol_inv(Q, interpret: bool = None):
    """(M, d, ok): explicit inverse of SPD Q plus Cholesky pivot info."""
    L, d, ok = pallas_chol(Q, interpret=interpret)
    return pallas_tri_inv_gram(L, interpret=interpret), d, ok


def blocked_tri_inv(L, block: int = 256):
    """L^-1 for lower-triangular L via block-column recursion on a single
    loop-carried buffer.

    XLA:TPU's TriangularSolveExpander lowers solve_triangular(L, I) on an
    (n, n) RHS into a staircase of per-128-block partial concatenations
    that buffer assignment cannot alias — at n=2048, batch 96 those
    partials alone are ~10 GiB of HLO temps and the program OOMs HBM at
    COMPILE time (`results/compile_2048.md`, the bench-sweep b>=128 crash).
    This routine replaces it: invert the diagonal blocks (one batched
    small solve), then fill the strictly-lower block columns with MXU
    matmuls + in-place dynamic-update-slice on one (n, n) buffer, which
    XLA aliases.  Cost is the same O(n^3/3) flops; peak extra memory is
    O(n*block) instead of O(n^2 * n/128)."""
    n = L.shape[-1]
    if n <= block:
        eye = jnp.eye(n, dtype=L.dtype)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    nb = -(-n // block)
    n_p = nb * block
    if n_p != n:
        Lp = jnp.zeros(L.shape[:-2] + (n_p, n_p), L.dtype)
        Lp = Lp.at[..., :n, :n].set(L)
        idx = jnp.arange(n, n_p)
        Lp = Lp.at[..., idx, idx].set(1.0)
        L = Lp
    # batched inversion of the nb diagonal blocks (small solves: the
    # expander staircase is harmless at (block, block))
    diag = jnp.stack([L[..., j * block:(j + 1) * block,
                        j * block:(j + 1) * block] for j in range(nb)],
                     axis=-3)
    eye_b = jnp.broadcast_to(jnp.eye(block, dtype=L.dtype), diag.shape)
    dinv = jax.scipy.linalg.solve_triangular(diag, eye_b, lower=True)
    X = jnp.zeros_like(L)
    for j in range(nb):
        X = X.at[..., j * block:(j + 1) * block,
                 j * block:(j + 1) * block].set(dinv[..., j, :, :])
    # left-looking fill: X[i,j] = -Dinv[i] @ L[i, j..i-1] @ X[j..i-1, j]
    for j in range(nb):
        c0, c1 = j * block, (j + 1) * block
        for i in range(j + 1, nb):
            r0, r1 = i * block, (i + 1) * block
            S = L[..., r0:r1, c0:r0] @ X[..., c0:r0, c0:c1]
            X = X.at[..., r0:r1, c0:c1].set(
                -(dinv[..., i, :, :] @ S))
    return X[..., :n, :n] if n_p != n else X


def xla_chol_inv_from_L(L):
    """XLA fallback for the finalize step: M = L^-T L^-1 via blocked
    triangular inversion + a Gram matmul (see blocked_tri_inv for why not
    solve_triangular against the identity)."""
    Li = blocked_tri_inv(L)
    return jnp.swapaxes(Li, -1, -2) @ Li


@_custom_batching.custom_vmap
def chol_auto(Q):
    """(L, d, ok) = blocked Cholesky; batch-aware under vmap."""
    return pallas_chol(Q)


@chol_auto.def_vmap
def _chol_auto_vmap(axis_size, in_batched, Q):
    from . import INTERPRET
    if INTERPRET:
        out = jax.lax.map(pallas_chol, Q)
    else:
        # Batched dispatch goes to XLA: the committed profile
        # (results/profile_kernels_tpu.md) showed XLA's batched Cholesky
        # winning at every size tried while the hand-written batched
        # kernels crashed Mosaic (remote-compile HTTP 500) at b=1 and
        # n>=512 — those kernels were deleted (VERDICT r3: no in-tree
        # kernel that both loses and crashes); the profile remains the
        # record.
        L = jnp.linalg.cholesky(Q)
        d = jnp.diagonal(L, axis1=-2, axis2=-1)
        ok = jnp.all(jnp.isfinite(d), axis=-1) & jnp.all(d > 0, axis=-1)
        out = (L, d, ok)
    return out, (True, True, True)


@_custom_batching.custom_vmap
def tri_inv_gram_auto(L):
    """M = L^-T L^-1; batch-aware under vmap."""
    return pallas_tri_inv_gram(L)


@tri_inv_gram_auto.def_vmap
def _tig_auto_vmap(axis_size, in_batched, L):
    from . import INTERPRET
    if INTERPRET:
        out = jax.lax.map(pallas_tri_inv_gram, L)
    else:
        # same rationale as _chol_auto_vmap: XLA wins + Mosaic crash
        out = xla_chol_inv_from_L(L)
    return out, True
