"""Pallas block-tridiagonal solve (+ a full factor kernel, kept with its
measured verdict).

Measured on v5e (results/profile_tridiag_tpu.md, chained-apply timing):

- `pallas_tridiag_solve` — the two solve sweeps as sequential-grid Pallas
  kernels whose per-step work is a single (nb, nb) MXU matmul against the
  block INVERSES — **wins 1.2-3.6x over the XLA two-scan triangular
  solves, growing with K** (triangular solves are latency-bound on TPU;
  same explicit-inverse design as the dense `invchol` backend).  With ~10
  backsolves per outer iteration (docs/one-phase.tex:908) this is the hot
  op of the chain/banded paths.
- `pallas_tridiag_factor` — the whole K-step recursion in one launch —
  **loses 0.2-0.9x**: XLA's `lax.scan` factor is already on-chip and
  fused, while the in-kernel unblocked Cholesky is VPU-bound masked
  arithmetic.  Kept as the measured record and for interpret-mode tests;
  production uses the hybrid: XLA `tridiag_factor` + `block_inverses`
  (one K-batched trisolve) + the Pallas solve, which is what
  ChainKernel/BandedKernel dispatch under `kkt.linear_solver_type=
  "pallas"`.

Numerical protocol matches `tridiag_factor` (julia.jl:28-46 blockwise):
    C_0 = chol(A_0 + delta I)
    E_k = B_k C_k^{-T}
    C_{k+1} = chol(A_{k+1} + delta I - E_k E_k^T)
ok = every block pivot positive; signalled through the signed diagonal
(d < 0 on the failing block), so no scalar output is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cholesky import _round_up, _tri_inv_unblocked, _unblocked_chol


def block_inverses(Ck):
    """C_k^{-1} for every diagonal Cholesky block — one K-batched
    triangular solve against the identity (parallel over K).  Feeds
    `pallas_tridiag_solve` from an XLA `tridiag_factor`: the profiled
    hybrid backend (results/profile_tridiag_tpu.md — XLA wins the factor,
    the Pallas matmul sweeps win the solve 1.2-3.6x)."""
    K, nb, _ = Ck.shape
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=Ck.dtype), (K, nb, nb))
    return jax.scipy.linalg.solve_triangular(Ck, eye, lower=True)


def _factor_kernel(ad_ref, bs_ref, ck_ref, ci_ref, ek_ref, d_ref, e_scr):
    k = pl.program_id(0)
    K = pl.num_programs(0)
    nb = ad_ref.shape[0]
    dt = ad_ref.dtype

    @pl.when(k == 0)
    def _init():
        e_scr[:] = jnp.zeros((nb, nb), dt)

    E_prev = e_scr[:]
    S = ad_ref[:] - jnp.dot(E_prev, E_prev.T, preferred_element_type=dt)
    C, ok = _unblocked_chol(S, jnp.asarray(True))
    ck_ref[:] = C
    row = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    col = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    diag = jnp.sum(jnp.where(row == col, C, 0.0), axis=0, keepdims=True)
    d_ref[:] = jnp.where(ok, diag, -jnp.abs(diag) - 1.0)
    Ci = _tri_inv_unblocked(C)
    ci_ref[:] = Ci
    # E_k = B_k C_k^{-T}; the k = K-1 row of Ek is junk (no coupling below)
    E = jnp.dot(bs_ref[:], Ci.T, preferred_element_type=dt)
    ek_ref[:] = E
    e_scr[:] = E


def _pad_band(Ad, Bs, nb_p):
    """Pad blocks to (nb_p, nb_p): identity tail on the diagonal blocks
    (decoupled), zero coupling."""
    K, nb, _ = Ad.shape
    if nb == nb_p:
        return Ad, Bs
    pad = nb_p - nb
    Adp = jnp.pad(Ad, ((0, 0), (0, pad), (0, pad)))
    idx = jnp.arange(nb, nb_p)
    Adp = Adp.at[:, idx, idx].set(1.0)
    Bsp = jnp.pad(Bs, ((0, 0), (0, pad), (0, pad)))
    return Adp, Bsp


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_tridiag_factor(Ad, Bs, delta, interpret: bool = None):
    """Factor tridiag(B, A + delta I, B^T).  Ad (K, nb, nb), Bs (K-1, nb, nb).

    Returns (Ck, Ci, Ek, ok): diagonal Cholesky blocks, their inverses,
    subdiagonal blocks of L ((K-1, nb, nb)), and the inertia flag.
    """
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    K, nb, _ = Ad.shape
    dt = Ad.dtype
    nb_p = _round_up(max(nb, 8), 8)
    eye = jnp.eye(nb, dtype=dt)
    Adp, Bsp = _pad_band(Ad + delta * eye,
                         jnp.concatenate([Bs, jnp.zeros((1, nb, nb), dt)])
                         if K > 1 else jnp.zeros((1, nb, nb), dt), nb_p)
    if K == 1:
        Bsp = jnp.zeros((1, nb_p, nb_p), dt)

    blk = pl.BlockSpec((1, nb_p, nb_p), lambda k: (k, 0, 0))
    Ck, Ci, Ek, D = pl.pallas_call(
        _factor_kernel_squeeze,
        out_shape=(jax.ShapeDtypeStruct((K, nb_p, nb_p), dt),
                   jax.ShapeDtypeStruct((K, nb_p, nb_p), dt),
                   jax.ShapeDtypeStruct((K, nb_p, nb_p), dt),
                   jax.ShapeDtypeStruct((K, 1, nb_p), dt)),
        grid=(K,),
        in_specs=[blk, blk],
        out_specs=(blk, blk, blk,
                   pl.BlockSpec((1, 1, nb_p), lambda k: (k, 0, 0))),
        scratch_shapes=[pltpu.VMEM((nb_p, nb_p), dt)],
        interpret=interpret,
    )(Adp, Bsp)
    d = D[:, 0, :nb] if nb == nb_p else D[:, 0, :nb]
    ok = jnp.all(d > 0)
    return (Ck[:, :nb, :nb], Ci[:, :nb, :nb],
            Ek[:-1, :nb, :nb] if K > 1 else jnp.zeros((0, nb, nb), dt), ok)


def _factor_kernel_squeeze(ad_ref, bs_ref, ck_ref, ci_ref, ek_ref, d_ref,
                           e_scr):
    """Adapter: block shapes are (1, nb, nb); strip the leading axis."""

    class _View:
        def __init__(self, ref):
            self._r = ref
            self.shape = ref.shape[1:]
            self.dtype = ref.dtype

        def __getitem__(self, idx):
            return self._r[0] if idx == slice(None) else self._r[(0,) + idx]

        def __setitem__(self, idx, val):
            if idx == slice(None):
                self._r[0] = val
            else:
                self._r[(0,) + idx] = val

    _factor_kernel(_View(ad_ref), _View(bs_ref), _View(ck_ref),
                   _View(ci_ref), _View(ek_ref), _View(d_ref), e_scr)


def _fwd_kernel(ci_ref, ek_ref, b_ref, y_ref, y_scr):
    k = pl.program_id(0)
    nb = ci_ref.shape[1]
    dt = ci_ref.dtype

    @pl.when(k == 0)
    def _init():
        y_scr[:] = jnp.zeros((1, nb), dt)

    # y_k = C_k^{-1} (b_k - E_{k-1} y_{k-1});  Ek block here is E_{k-1}
    # (shifted feed), zeros at k = 0
    r = b_ref[0] - jnp.dot(y_scr[:], ek_ref[0].T,
                           preferred_element_type=dt)
    y = jnp.dot(r, ci_ref[0].T, preferred_element_type=dt)
    y_ref[0] = y
    y_scr[:] = y


def _bwd_kernel(ci_ref, ek_ref, y_ref, x_ref, x_scr):
    k = pl.program_id(0)
    nb = ci_ref.shape[1]
    dt = ci_ref.dtype

    @pl.when(k == 0)
    def _init():
        x_scr[:] = jnp.zeros((1, nb), dt)

    # reverse order: program k handles block K-1-k
    # x_k = C_k^{-T} (y_k - E_k^T x_{k+1}); Ek block is E_k (zeros at the
    # last block = program 0)
    r = y_ref[0] - jnp.dot(x_scr[:], ek_ref[0], preferred_element_type=dt)
    x = jnp.dot(r, ci_ref[0], preferred_element_type=dt)
    x_ref[0] = x
    x_scr[:] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_tridiag_solve(Ci, Ek, b, interpret: bool = None):
    """Solve L L^T x = b given the factor's block inverses.  b (K, nb)."""
    if interpret is None:
        from . import INTERPRET
        interpret = INTERPRET
    K, nb, _ = Ci.shape
    dt = Ci.dtype
    nb_p = _round_up(max(nb, 8), 8)
    pad = nb_p - nb
    Cip = jnp.pad(Ci, ((0, 0), (0, pad), (0, pad)))
    if pad:
        idx = jnp.arange(nb, nb_p)
        Cip = Cip.at[:, idx, idx].set(1.0)
    Ekp = jnp.pad(Ek, ((0, 0), (0, pad), (0, pad))) if K > 1 else \
        jnp.zeros((0, nb_p, nb_p), dt)
    bp = jnp.pad(b, ((0, 0), (0, pad)))[:, None, :]        # (K, 1, nb_p)
    z1 = jnp.zeros((1, nb_p, nb_p), dt)
    # forward feed: program k reads E_{k-1}; prepend zeros
    Ek_fwd = jnp.concatenate([z1, Ekp])                    # (K, nb_p, nb_p)

    blk = pl.BlockSpec((1, nb_p, nb_p), lambda k: (k, 0, 0))
    row = pl.BlockSpec((1, 1, nb_p), lambda k: (k, 0, 0))
    y = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((K, 1, nb_p), dt),
        grid=(K,),
        in_specs=[blk, blk, row],
        out_specs=row,
        scratch_shapes=[pltpu.VMEM((1, nb_p), dt)],
        interpret=interpret,
    )(Cip, Ek_fwd, bp)

    # backward: program k handles block K-1-k; needs E_k at that block
    # (zeros for the last block)
    Ek_bwd = jnp.concatenate([Ekp, z1])                    # (K, nb_p, nb_p)
    rev = pl.BlockSpec((1, nb_p, nb_p), lambda k: (K - 1 - k, 0, 0))
    rev_row = pl.BlockSpec((1, 1, nb_p), lambda k: (K - 1 - k, 0, 0))
    x = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((K, 1, nb_p), dt),
        grid=(K,),
        in_specs=[rev, rev, rev_row],
        out_specs=rev_row,
        scratch_shapes=[pltpu.VMEM((1, nb_p), dt)],
        interpret=interpret,
    )(Cip, Ek_bwd, y)
    return x[:, 0, :nb]
