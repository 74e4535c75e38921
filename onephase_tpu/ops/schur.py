"""Fused Schur-complement formation kernel: Q = H + Jc^T diag(w) Jc + diag(b).

This is the reference's hottest line item — 42.1% of total runtime spent in
`eval_J_T_J + get_lag_hess` sparse triple products (schur.jl:47-62,
docs/one-phase.tex:901-912).  The TPU design computes it as one Pallas
kernel: the row scaling by `w`, the (MXU) J^T J contraction, the H add and
the diagonal add are fused in VMEM — one HBM read of Jc per k-tile, one HBM
write of Q, no intermediates.

An XLA fallback (`_xla_fused_q`) expresses the same computation as a scaled
matmul, letting the XLA fusion engine do its best; `fused_q` picks the
implementation from config/backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fused_q_kernel(ji_ref, jj_ref, w_ref, h_ref, b_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        ti = out_ref.shape[0]
        tj = out_ref.shape[1]
        i0 = pl.program_id(0)
        j0 = pl.program_id(1)
        row = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0) + i0 * ti
        col = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1) + j0 * tj
        diag = jnp.where(row == col, b_ref[0, :], 0.0)
        out_ref[:] = h_ref[:] + diag

    out_ref[:] += jax.lax.dot_general(
        ji_ref[:] * w_ref[:], jj_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def pallas_fused_q(Jc, w, H, bnd, tile_n: int = 256, tile_k: int = 512,
                   interpret: bool = None):
    """Q = H + Jc^T diag(w) Jc + diag(bnd) via a single fused Pallas kernel."""
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    m, n = Jc.shape
    dt = H.dtype
    tn = min(tile_n, _round_up(n, 128))
    tk = min(tile_k, _round_up(max(m, 1), 8))
    n_p = _round_up(n, tn)
    m_p = _round_up(max(m, 1), tk)
    Jp = jnp.zeros((m_p, n_p), dt).at[:m, :n].set(Jc)
    wp = jnp.zeros((m_p, 1), dt).at[:m, 0].set(w)
    Hp = jnp.zeros((n_p, n_p), dt).at[:n, :n].set(H)
    bp = jnp.zeros((1, n_p), dt).at[0, :n].set(bnd)

    grid = (n_p // tn, n_p // tn, m_p // tk)
    out = pl.pallas_call(
        _fused_q_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),   # Jc k-tile, i columns
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),   # Jc k-tile, j columns
            pl.BlockSpec((tk, 1), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),   # w k-tile
            pl.BlockSpec((tn, tn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),   # H tile
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),   # bnd j-tile
        ],
        out_specs=pl.BlockSpec((tn, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, n_p), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * n_p + n_p * n_p,
            bytes_accessed=(m_p * n_p + n_p * n_p * 2) * Jp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(Jp, Jp, wp, Hp, bp)
    return out[:n, :n]


def _fused_q_tri_kernel(ji_ref, jj_ref, w_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :, :] += jax.lax.dot_general(
        ji_ref[:] * w_ref[:], jj_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def pallas_fused_q_tri(Jc, w, H, bnd, tile_n: int = 128, tile_k: int = 512,
                       interpret: bool = None):
    """Triangle-tiled Q = H + Jc^T diag(w) Jc + diag(bnd).

    Exploits the symmetry of J^T D J, which XLA's matmul cannot: the Pallas
    grid enumerates only the nb*(nb+1)/2 lower-triangular (i, j) tile pairs
    — each an MXU contraction over the constraint axis — into a compact
    (T, tn, tn) tile stack; the O(n^2) mirror/reassembly (block scatter,
    block-transpose mirror, H + diagonal add) happens in XLA where it fuses.
    Saves up to 2x of the formation MXU time at nb >> 1 (the reference's
    single hottest line item, 42.1% of runtime, docs/one-phase.tex:901-912).

    Measured on v5e (f32, 2026-08): at n,m <= 2048 the formation op is
    bandwidth-bound, and the compact-stack write + XLA reassembly costs more
    than the skipped upper-triangle MXU work (tri 276us vs xla 161us at
    m=2048,n=1024) — so `fused_q` does NOT dispatch here by default; this
    kernel is kept for the compute-bound regime (m >> 4096) and as the
    symmetric-tiling building block.
    """
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    m, n = Jc.shape
    dt = H.dtype
    tn = min(tile_n, _round_up(n, 128))
    tk = min(tile_k, _round_up(max(m, 1), 8))
    n_p = _round_up(n, tn)
    m_p = _round_up(max(m, 1), tk)
    nb = n_p // tn
    rows_np = np.concatenate([np.full(i + 1, i) for i in range(nb)])
    cols_np = np.concatenate([np.arange(i + 1) for i in range(nb)])
    T = len(rows_np)

    Jp = jnp.zeros((m_p, n_p), dt).at[:m, :n].set(Jc)
    wp = jnp.zeros((m_p, 1), dt).at[:m, 0].set(w)

    def _tri_ij(t):
        """Decode flat lower-triangular index t -> (block_i, block_j).

        Index maps must be closed-form in the grid indices (no captured
        arrays), so invert t = i(i+1)/2 + j arithmetically with an exact
        integer fix-up of the f32 sqrt."""
        i = ((jnp.sqrt(8.0 * t.astype(jnp.float32) + 1.0) - 1.0) / 2.0
             ).astype(jnp.int32)
        i = jnp.where(i * (i + 1) // 2 > t, i - 1, i)
        i = jnp.where((i + 1) * (i + 2) // 2 <= t, i + 1, i)
        return i, t - i * (i + 1) // 2

    tiles = pl.pallas_call(
        _fused_q_tri_kernel,
        grid=(T, m_p // tk),
        in_specs=[
            pl.BlockSpec((tk, tn), lambda t, k: (k, _tri_ij(t)[0]),
                         memory_space=pltpu.VMEM),   # Jc k-tile, row-block cols
            pl.BlockSpec((tk, tn), lambda t, k: (k, _tri_ij(t)[1]),
                         memory_space=pltpu.VMEM),   # Jc k-tile, col-block cols
            pl.BlockSpec((tk, 1), lambda t, k: (k, 0),
                         memory_space=pltpu.VMEM),   # w k-tile
        ],
        out_specs=pl.BlockSpec((1, tn, tn), lambda t, k: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tn, tn), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * tn * tn * T,
            bytes_accessed=(2 * T * (m_p // tk) * tk * tn
                            + T * tn * tn) * Jp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(Jp, Jp, wp)

    # XLA reassembly: block scatter + symmetric mirror + H + diag adds
    Qb = jnp.zeros((nb, nb, tn, tn), dt).at[rows_np, cols_np].set(tiles)
    mirror = jnp.swapaxes(jnp.swapaxes(Qb, 0, 1), 2, 3)
    diag_b = jnp.arange(nb)
    mirror = mirror.at[diag_b, diag_b].set(0.0)
    Q = (Qb + mirror).swapaxes(1, 2).reshape(n_p, n_p)[:n, :n]
    return Q + H + jnp.diag(bnd)


def xla_fused_q(Jc, w, H, bnd, mxu_dtype=None):
    """Q = H + J^T diag(w) J + diag(bnd).

    `mxu_dtype` (e.g. jnp.bfloat16): run the rank-m update — the 42.1% cost
    item (docs/one-phase.tex:901-912) — at the MXU's fast dtype with f32
    accumulation, via the scale-split J'WJ = (sqrt(w)J)'(sqrt(w)J).  sqrt
    halves the exponent range of the y/s weights so bf16's 8-bit exponent
    holds them; the ~3e-3 relative error is absorbed by the factorization's
    role as a refinement preconditioner (ipm/core.refine_solve uses the
    full-precision H/Jc for residuals).
    """
    # H is None for declared-zero Hessians (NLPSpec.zero_hess — LPs):
    # no (n, n) H exists anywhere, Q is the rank-m update + bound diagonal
    if Jc.shape[0] > 0:
        if mxu_dtype is not None:
            sw = jnp.sqrt(w)
            Js = (Jc * sw[:, None]).astype(mxu_dtype)
            upd = jnp.matmul(
                Js.T, Js,
                preferred_element_type=jnp.float32).astype(bnd.dtype)
        else:
            upd = (Jc * w[:, None]).T @ Jc
        Q = upd if H is None else H + upd
    else:
        Q = (jnp.zeros((bnd.shape[0], bnd.shape[0]), bnd.dtype)
             if H is None else H)
    return Q + jnp.diag(bnd)


def fused_q(Jc, w, H, bnd, use_pallas: bool, mxu_dtype=None):
    """Dispatch: Pallas fused kernel on TPU, XLA fusion elsewhere.

    Interpreter mode (ops.INTERPRET) cannot emulate grid/program_id in this
    JAX version, so it falls back to the XLA expression — the grid-free
    cholesky/solve kernels are the ones interpret-mode tests exercise.
    """
    from . import INTERPRET
    if (use_pallas and Jc.shape[0] > 0 and not INTERPRET
            and mxu_dtype is None and H is not None):
        return pallas_fused_q(Jc, w, H, bnd)
    return xla_fused_q(Jc, w, H, bnd, mxu_dtype)
