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


def xla_chol_inv_from_L(L):
    """XLA fallback for the finalize step: M = L^-T L^-1 via one
    triangular solve against the identity + a Gram matmul."""
    eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
    Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.swapaxes(Li, -1, -2) @ Li


# ===========================================================================
# Batch-vectorized kernels.
#
# XLA's batched `cholesky` (and trisolves) serialize per batch element on
# TPU — measured 2.7 ms for (64, 256, 256) f32 on v5e, worse than linear in
# batch.  These kernels instead carry the whole batch chunk through the
# factorization: each serial step-j update works on (bc, ., .) arrays, so
# the VPU lanes amortize the step latency across instances and the
# panel/trailing updates are batched MXU matmuls.  The batch is chunked by a
# grid so VMEM holds ~4 MB per program.
#
# The batched `ok` flag rides inside d: d_j = sign(pivot_j)*sqrt(|pivot_j|),
# so callers recover inertia as all(d > 0) without an SMEM output.
# ===========================================================================

def _batched_unblocked_chol(A0):
    """Masked Cholesky of a (bc, bs, bs) tile batch; d entries signed.

    Per-batch scalars are carried as (bc, 1) 2-D arrays — Mosaic's layout
    assignment aborts on (bc, 1, 1) reductions (verified on v5e) — and the
    rank-1 outer product goes through dot_general (batched MXU)."""
    bc, bs = A0.shape[0], A0.shape[1]
    dt = A0.dtype
    row = lax.broadcasted_iota(jnp.int32, (1, bs, bs), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, bs, bs), 2)
    crow2 = lax.broadcasted_iota(jnp.int32, (1, bs), 1)
    tiny = jnp.asarray(1e-38 if dt == jnp.float32 else 1e-300, dt)

    def body(j, carry):
        A, dsg = carry
        pr = jnp.sum(jnp.where((row == j) & (col == j), A, 0.0), axis=2)
        p1 = jnp.sum(pr, axis=1, keepdims=True)              # (bc,1)
        good = (p1 > 0.0) & jnp.isfinite(p1)
        djs = jnp.where(good, jnp.sqrt(jnp.abs(p1) + tiny),
                        -jnp.sqrt(jnp.abs(p1) + tiny))
        dinv = lax.rsqrt(jnp.maximum(p1, tiny))
        colj = jnp.sum(jnp.where(col == j, A, 0.0), axis=2)  # (bc,bs)
        Lcol = jnp.where(crow2 >= j, colj * dinv, 0.0)
        below = jnp.where(crow2 > j, Lcol, 0.0)[:, :, None]  # (bc,bs,1)
        A = A - lax.dot_general(
            below, below, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=dt)
        A = jnp.where(col == j, Lcol[:, :, None], A)
        dsg = jnp.where(crow2 == j, djs, dsg)                # (bc,bs)
        return A, dsg

    dsg0 = jnp.zeros((bc, bs), dt)
    A, dsg = lax.fori_loop(0, bs, body, (A0, dsg0))
    return jnp.where(row >= col, A, 0.0), dsg


def _batched_tri_inv_unblocked(L):
    """Batched inverse of (bc, bs, bs) lower-triangular tiles."""
    bs = L.shape[1]
    dt = L.dtype
    row = lax.broadcasted_iota(jnp.int32, (1, bs, bs), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, bs, bs), 2)
    crow2 = lax.broadcasted_iota(jnp.int32, (1, bs), 1)

    def body(j, Inv):
        lrow = jnp.sum(jnp.where(row == j, L, 0.0), axis=1)  # (bc,bs)
        lrow = jnp.where(crow2 < j, lrow, 0.0)
        # LHS must keep a non-contracting dim (Mosaic rejects an empty
        # lhs_non_contracting_dims attribute), so run (bc,1,bs) @ (bc,bs,bs)
        contrib = lax.dot_general(
            lrow[:, None, :], Inv,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt)[:, 0, :]             # (bc,bs)
        ej = jnp.where(crow2 == j, 1.0, 0.0).astype(dt)
        pj = jnp.sum(jnp.where((row == j) & (col == j), L, 0.0), axis=2)
        d1 = jnp.sum(pj, axis=1, keepdims=True)              # (bc,1)
        newrow = (ej - contrib) / d1                         # (bc,bs)
        return jnp.where(row == j, newrow[:, None, :], Inv)

    return lax.fori_loop(0, bs, body, jnp.zeros_like(L))


def _bmm(a, b):
    return lax.dot_general(a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=a.dtype)


def _bT(a):
    return jnp.swapaxes(a, 1, 2)


def _batched_chol_kernel(a_ref, l_ref):
    n = a_ref.shape[1]
    bs = min(BS, n)
    nb = n // bs
    l_ref[:] = a_ref[:]
    # The signed pivots ride in l_ref's DIAGONAL (d_j = sign*sqrt|pivot_j|):
    # a separate (b, n) output would need a dynamic batch-offset store that
    # Mosaic rejects when the VMEM batch chunk bc < 8 ("index in dimension 0
    # must be a multiple of 8"), and a (bc, n) block violates the
    # sublane-divisible-by-8 rule at small bc.  The caller extracts d from
    # the diagonal and restores |d| in XLA.
    rowb = lax.broadcasted_iota(jnp.int32, (1, bs, bs), 1)
    colb = lax.broadcasted_iota(jnp.int32, (1, bs, bs), 2)

    for kb in range(nb):
        o = kb * bs
        Lkk, dsg = _batched_unblocked_chol(l_ref[:, o:o + bs, o:o + bs])
        l_ref[:, o:o + bs, o:o + bs] = jnp.where(
            rowb == colb, dsg[:, None, :], Lkk)
        if kb < nb - 1:
            Ikk = _batched_tri_inv_unblocked(Lkk)
            L21 = _bmm(l_ref[:, o + bs:, o:o + bs], _bT(Ikk))
            l_ref[:, o + bs:, o:o + bs] = L21
            l_ref[:, o + bs:, o + bs:] -= _bmm(L21, _bT(L21))

    row = lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    l_ref[:] = jnp.where(row >= col, l_ref[:], 0.0)


def _batched_tri_inv_gram_kernel(l_ref, m_ref, li_ref):
    n = l_ref.shape[1]
    bs = min(BS, n)
    nb = n // bs
    dt = l_ref.dtype
    bc = l_ref.shape[0]

    for i in range(nb):
        o = i * bs
        li_ref[:, o:o + bs, o:o + bs] = _batched_tri_inv_unblocked(
            l_ref[:, o:o + bs, o:o + bs])
        for j in range(i):
            oj = j * bs
            acc = jnp.zeros((bc, bs, bs), dt)
            for k in range(j, i):
                ok_ = k * bs
                acc += _bmm(l_ref[:, o:o + bs, ok_:ok_ + bs],
                            li_ref[:, ok_:ok_ + bs, oj:oj + bs])
            li_ref[:, o:o + bs, oj:oj + bs] = -_bmm(
                li_ref[:, o:o + bs, o:o + bs], acc)
        for j in range(i + 1, nb):
            li_ref[:, o:o + bs, j * bs:(j + 1) * bs] = jnp.zeros((bc, bs, bs), dt)

    Li = li_ref[:]
    m_ref[:] = _bmm(_bT(Li), Li)


def _batch_chunk(b, n, n_bufs):
    """Instances per grid program: as many as VMEM holds.

    The factorization's ~n sequential steps are latency-bound, so the win
    comes from amortizing each step over the largest possible instance
    chunk — a 4 MB chunk (bc=8 at n=256) measured SLOWER than XLA's batched
    cholesky on v5e; a ~96 MB chunk makes each VPU/MXU step 8-16x wider for
    the same step count.  bc is kept a multiple of 8 (sublane rule) when
    possible; the wrappers pad b up to a multiple of bc.
    """
    per = n * n * 4 * n_bufs
    # ~40 MB of VMEM for the block working set: Pallas double-buffers the
    # in/out blocks for pipelining, so the effective footprint is ~2x this
    # (v5e VMEM = 128 MB; a 96 MB budget OOMed the Mosaic compile).
    bc = max(1, (40 * 1024 * 1024) // per)
    bc = min(bc, b, 256)
    if bc > 8:
        bc -= bc % 8
    return bc


def _pad_batch(Qp, bc):
    """Pad the batch dim up to a multiple of bc with identity matrices."""
    b, n_p = Qp.shape[0], Qp.shape[1]
    b_p = _round_up(b, bc)
    if b_p == b:
        return Qp, b
    pad = jnp.broadcast_to(jnp.eye(n_p, dtype=Qp.dtype), (b_p - b, n_p, n_p))
    return jnp.concatenate([Qp, pad], axis=0), b


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol_batched(Q, interpret: bool = None):
    """Batched blocked Cholesky of (B, n, n) SPD matrices.

    Returns (L, d, ok) with batch-leading shapes; d is the signed-pivot
    diagonal (negative entries mark non-PD instances)."""
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    b, n = Q.shape[0], Q.shape[-1]
    bs = _block_size(n)
    n_p = _round_up(n, bs)
    if n_p != n:
        Qp = jnp.zeros((b, n_p, n_p), Q.dtype).at[:, :n, :n].set(Q)
        idx = jnp.arange(n, n_p)
        Qp = Qp.at[:, idx, idx].set(1.0)
    else:
        Qp = Q
    bc = _batch_chunk(b, n_p, 2)
    Qp, b_real = _pad_batch(Qp, bc)
    b = Qp.shape[0]
    L = pl.pallas_call(
        _batched_chol_kernel,
        grid=(b // bc,),
        in_specs=[pl.BlockSpec((bc, n_p, n_p), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bc, n_p, n_p), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_p, n_p), Q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * n_p ** 3 // 3, transcendentals=b * n_p,
            bytes_accessed=2 * b * n_p * n_p * Q.dtype.itemsize),
    )(Qp)
    # signed pivots ride in the diagonal (see _batched_chol_kernel)
    L = L[:b_real]
    dsg = jnp.diagonal(L, axis1=1, axis2=2)[:, :n]
    ok = jnp.all(dsg > 0, axis=-1)
    d = jnp.abs(dsg)
    L = L[:, :n, :n]
    idx = jnp.arange(n)
    L = L.at[:, idx, idx].set(d)
    return L, d, ok


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_tri_inv_gram_batched(L, interpret: bool = None):
    """Batched M = L^-T L^-1 for (B, n, n) lower-triangular factors."""
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    b, n = L.shape[0], L.shape[-1]
    bs = _block_size(n)
    n_p = _round_up(n, bs)
    if n_p != n:
        Lp = jnp.zeros((b, n_p, n_p), L.dtype).at[:, :n, :n].set(L)
        idx = jnp.arange(n, n_p)
        Lp = Lp.at[:, idx, idx].set(1.0)
    else:
        Lp = L
    bc = _batch_chunk(b, n_p, 3)
    Lp, b_real = _pad_batch(Lp, bc)
    b = Lp.shape[0]
    M = pl.pallas_call(
        _batched_tri_inv_gram_kernel,
        grid=(b // bc,),
        in_specs=[pl.BlockSpec((bc, n_p, n_p), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bc, n_p, n_p), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_p, n_p), L.dtype),
        scratch_shapes=[pltpu.VMEM((bc, n_p, n_p), L.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (n_p ** 3 // 3 + 2 * n_p ** 3), transcendentals=0,
            bytes_accessed=3 * b * n_p * n_p * L.dtype.itemsize),
    )(Lp)
    return M[:b_real, :n, :n]


# ---------------------------------------------------------------------------
# custom-vmap dispatchers: single-instance Pallas kernel at rank 2, the
# batch-vectorized kernel when the caller vmaps (parallel/batch.BatchSolver).
# ---------------------------------------------------------------------------
import jax.custom_batching as _custom_batching


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
        # Batched dispatch goes to XLA, not pallas_chol_batched: the
        # profile (results/profile_kernels_tpu.md) shows XLA's batched
        # Cholesky wins at every size tried, and the Mosaic compile of the
        # batched kernel crashes (remote-compile HTTP 500) at b=1 and
        # n>=512.  The Pallas batched kernels remain covered in interpret
        # mode (tests/test_kkt.py) for the m >> 4096 regime where
        # re-measurement could flip the default.
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
