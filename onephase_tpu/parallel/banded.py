"""RCM-banded one-phase IPM: general unstructured sparsity on the MXU.

The general-sparsity scaling path (SURVEY.md §5 "scaling-axis"; reference
`Class_iterate.jl:4-20` sparse cache + `julia.jl:34,52` sparse CHOLMOD):
instead of a general sparse factorization — irregular gather/scatter the
MXU cannot tile — the structural pattern of Q = H + J' D J is
Reverse-Cuthill-McKee reordered ONCE at construction (host-side symbolic
analysis in C++/numpy, `native.rcm_order` / `native/structure.cpp` — the
role AMD/symbolic analysis plays inside SuiteSparse for the reference).
A banded matrix with bandwidth <= nb IS block-tridiagonal with (nb, nb)
dense blocks, so the permuted Q is assembled directly in block-band form
and factored by `ops/block_tridiag` at O(K nb^3) — sequential block
recursion or the partitioned nested-dissection variant
(`kkt.chain_partitions`), every step an MXU-dense matmul.  The (n, n)
dense Q is never materialized: band assembly costs O(m n nb) instead of
the dense path's O(m n^2) (the 42.1% cost item,
docs/one-phase.tex:901-912), and the factorization O(n nb^2) per stage
instead of O(n^3).

Pattern caveat: sparsity structure is detected from |J|/|H| at sample
points at construction time; entries structurally zero at every sample
but nonzero elsewhere would be dropped — the standard AD-structure
assumption (the reference trusts CUTEst's declared structure the same
way).  Problems whose RCM bandwidth approaches n gain nothing; use the
dense `OnePhaseKernel` there.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Params
from ..ipm.core import OnePhaseKernel
from ..ipm.state import Cache, Factor, Point
from ..native import rcm_order
from ..nlp import CanonNLP
from ..ops.block_tridiag import (TridiagFactor, check_mesh_partitions,
                                 partitioned_factor, partitioned_solve,
                                 shard_partitioned, tridiag_factor,
                                 tridiag_solve)


def _structural_pattern(nlp: CanonNLP, n_samples: int, pdata) -> np.ndarray:
    """Union of |J|/|H| nonzero patterns at sample points (host-side)."""
    rng = np.random.default_rng(0)
    x0 = np.asarray(nlp.x0, np.float64)
    pat = np.eye(nlp.n, dtype=bool)
    for i in range(max(1, n_samples)):
        if i == 0:
            x = x0
        else:
            x = x0 * (1.0 + 0.01 * rng.standard_normal(nlp.n)) \
                + 0.01 * rng.standard_normal(nlp.n)
        xj = jnp.asarray(x, nlp.dtype)
        y = jnp.asarray(rng.uniform(0.5, 1.5, nlp.m), nlp.dtype)
        if nlp.m_orig > 0:
            B = np.abs(np.asarray(nlp.jac_orig(xj, pdata))) > 0
            pat |= (B.astype(np.int64).T @ B.astype(np.int64)) > 0
        pat |= np.abs(np.asarray(nlp.lag_hess(xj, y, pdata))) > 0
    return pat


class BandedKernel(OnePhaseKernel):
    """OnePhaseKernel whose Schur complement is RCM-banded block-tridiag.

    `block_size` overrides the detected bandwidth (must be >= it).  With
    `pars.kkt.chain_partitions > 1` the band factors via the parallel
    nested-dissection path (mesh-shardable chunk axis, see ChainKernel).
    """

    def __init__(self, nlp: CanonNLP, pars: Params,
                 block_size: int = None, n_samples: int = 2,
                 sample_pdata=None, mesh=None, chain_axis: str = "chain",
                 matrix_free: bool = False, pattern: np.ndarray = None):
        if pars.kkt.kkt_solver_type != "schur":
            raise ValueError("BandedKernel implements the schur path only")
        if pars.kkt.linear_solver_type not in ("xla", "pallas"):
            raise ValueError("BandedKernel has its own block solve path; "
                             "set kkt.linear_solver_type='xla' (scan) or "
                             "'pallas' (single-kernel VMEM recursion)")
        self.use_pallas = pars.kkt.linear_solver_type == "pallas"
        if self.use_pallas and int(pars.kkt.chain_partitions) > 1:
            raise ValueError("pallas tridiag backend is sequential; "
                             "incompatible with chain_partitions > 1")
        if pars.kkt.factor_precision != "same":
            raise ValueError("BandedKernel supports factor_precision='same'")
        if matrix_free:
            if pars.kkt.it_refine_highprec:
                raise ValueError("matrix_free mode has no materialized J/H "
                                 "for the double-single residual path")
            if nlp.parametric:
                raise ValueError("matrix_free mode supports non-parametric "
                                 "problems (pdata-free oracles)")
        self.matrix_free = matrix_free
        self._skip_const_fold = matrix_free
        super().__init__(nlp, pars)

        # host-side symbolic analysis: RCM ordering + bandwidth.  A caller-
        # supplied `pattern` (n, n bool, structural nonzeros of H + J'J)
        # skips the sample-based detection — required for truly matrix-free
        # construction at scales where even one dense J would not fit.
        if pattern is None:
            pattern = _structural_pattern(nlp, n_samples, sample_pdata)
        perm = np.asarray(rcm_order(pattern), np.int64)
        pp = pattern[perm][:, perm]
        ii, jj = np.nonzero(pp)
        bw = int(np.abs(ii - jj).max()) if ii.size else 1
        nb = int(block_size) if block_size is not None else max(bw, 1)
        if nb < bw:
            raise ValueError(f"block_size {nb} < RCM bandwidth {bw}")
        K = -(-nlp.n // nb)
        self.partitions = int(pars.kkt.chain_partitions)
        if self.partitions > 1:
            # partitioned factor needs K = P * Kc with Kc >= 2
            Kc = max(2, -(-K // self.partitions))
            K = self.partitions * Kc
        self.nb, self.K, self.n_pad = nb, K, K * nb
        self.bandwidth = bw
        self.perm = perm
        self.iperm = np.argsort(perm)
        self.mesh = mesh
        self.chain_axis = chain_axis
        if mesh is not None:
            check_mesh_partitions(self.partitions, mesh, chain_axis)

        if matrix_free:
            # probing basis for band extraction: G = min(3, K) block colors;
            # same-color blocks are >= 3 apart, so the +-1-block reads of
            # one source block cannot overlap another source's band
            # (bandwidth <= nb by construction).  G*nb operator
            # applications recover the exact (Qd, Qs) block band.
            K, nb, n = self.K, self.nb, nlp.n
            G = min(3, K)
            P = np.zeros((G, nb, n), dtype=np.asarray(nlp.x0).dtype)
            for k in range(K):
                c = k % G
                for r in range(nb):
                    j = k * nb + r
                    if j < n:
                        P[c, r, self.perm[j]] = 1.0
            self._probes = jnp.asarray(P.reshape(G * nb, n), self.dtype)
            self._ncolors = G
            tail = (np.arange(self.n_pad) >= n).astype(np.float64)
            self._tail_diag = jnp.asarray(tail.reshape(K, nb), self.dtype)

    def _shard_chunks(self, pf):
        return shard_partitioned(pf, self.mesh, self.chain_axis)

    # ---------------- matrix-free product hooks ----------------------
    # In matrix_free mode the Factor never holds a dense J or H: the Jc
    # slot carries the factorization point x (n,), the H slot carries mu
    # (scalar) — together with the stored y_f these reconstruct the exact
    # linearization point, and all products are AD oracle calls
    # (nlp.jprod/jtprod/hess_prod_fn).  Memory is O(n*nb), never O(n^2)
    # or O(m*n)  (VERDICT r2 item 6).
    def fact_jprod(self, fact, v):
        if not self.matrix_free:
            return super().fact_jprod(fact, v)
        return self.nlp.jprod(fact.Jc, v)

    def fact_jtprod(self, fact, w):
        if not self.matrix_free:
            return super().fact_jtprod(fact, w)
        return self.nlp.jtprod(fact.Jc, w)

    def fact_hmul(self, fact, v):
        if not self.matrix_free:
            return super().fact_hmul(fact, v)
        y_eff = fact.y_f + fact.H * self.pars.a_norm_penalty
        return self.nlp.hess_prod_fn(fact.Jc, y_eff)(v)

    # ---------------- banded assembly --------------------------------
    def _banded_blocks(self, H, Jc, wc, bnd):
        """(Qd, Qs) block bands of P (H + J' diag(wc) J + diag(bnd)) P'."""
        K, nb, n, n_pad = self.K, self.nb, self.n, self.n_pad
        perm = jnp.asarray(self.perm)
        pad = n_pad - n

        Hp = H[perm][:, perm]
        if pad:
            Hp = jnp.pad(Hp, ((0, pad), (0, pad)))
            idx = jnp.arange(n, n_pad)
            Hp = Hp.at[idx, idx].set(1.0)   # decoupled identity tail
        Hb = Hp.reshape(K, nb, K, nb)
        kk = jnp.arange(K)
        Qd = Hb[kk, :, kk, :]
        Qs = Hb[kk[1:], :, kk[:-1], :] if K > 1 \
            else jnp.zeros((0, nb, nb), H.dtype)

        bnd_p = bnd[perm]
        if pad:
            bnd_p = jnp.pad(bnd_p, (0, pad))
        Qd = Qd + jax.vmap(jnp.diag)(bnd_p.reshape(K, nb))

        if self.nlp.m_orig > 0:
            Jp = Jc[:, perm]
            if pad:
                Jp = jnp.pad(Jp, ((0, 0), (0, pad)))
            Jb = Jp.reshape(-1, K, nb)
            JW = Jb * wc[:, None, None]
            Qd = Qd + jnp.einsum("mki,mkj->kij", JW, Jb)
            if K > 1:
                Qs = Qs + jnp.einsum("mki,mkj->kij", JW[:, 1:], Jb[:, :-1])
        return Qd, Qs

    # ---------------- overridden KKT path ----------------------------
    def _form_factor_matrix_free(self, p: Point, prev: Factor) -> Factor:
        """Probe the Schur operator S(v) = H v + J'(wc*(J v)) + bnd*v for
        its block-tridiagonal band — G*nb linearized oracle applications,
        no dense J (m, n) or H (n, n) ever exists.  The band blocks are
        exact (same nb >= bandwidth precondition as the dense assembly)."""
        nlp = self.nlp
        K, nb, n, n_pad = self.K, self.nb, self.n, self.n_pad
        G = self._ncolors
        y_eff = p.y + p.mu * self.pars.a_norm_penalty
        wc_y, _ = nlp.split_canonical(y_eff)
        wc, bnd = nlp.split_canonical_sq(p.y / p.s)

        def lag(xx):
            val = nlp.f(xx)
            if nlp.m_orig > 0:
                val = val - jnp.dot(wc_y, nlp.c(xx))
            return val

        _, hvp_lin = jax.linearize(jax.grad(lag), p.x)
        if nlp.m_orig > 0:
            cfun = lambda xx: nlp.c(xx)  # noqa: E731
            _, jvp_c = jax.linearize(cfun, p.x)
            _, vjp_c = jax.vjp(cfun, p.x)

        def S_op(v):
            out = hvp_lin(v) + bnd * v
            if nlp.m_orig > 0:
                out = out + vjp_c(wc * jvp_c(v))[0]
            return out

        V = jax.vmap(S_op)(self._probes)              # (G*nb, n)
        Vp = V[:, jnp.asarray(self.perm)]             # permuted coords
        if n_pad != n:
            Vp = jnp.pad(Vp, ((0, 0), (0, n_pad - n)))
        Vb = Vp.reshape(G, nb, K, nb)                 # [color, r, block, i]
        kk = jnp.arange(K)
        cc = kk % G
        Qd = Vb[cc, :, kk, :].transpose(0, 2, 1)      # (K, i, r)
        Qd = Qd + jax.vmap(jnp.diag)(self._tail_diag)
        if K > 1:
            Qs = Vb[cc[:-1], :, kk[:-1] + 1, :].transpose(0, 2, 1)
        else:
            Qs = jnp.zeros((0, nb, nb), self.dtype)
        schur_diag = jax.vmap(jnp.diagonal)(Qd).reshape(-1)[
            jnp.asarray(self.iperm)]
        # Jc slot <- x, H slot <- mu: the linearization point for the
        # matrix-free product hooks
        return Factor(Jc=p.x, H=jnp.asarray(p.mu, self.dtype),
                      Q=(Qd, Qs), schur_diag=schur_diag,
                      L=prev.L, D=prev.D, delta=prev.delta,
                      s_f=p.s, y_f=p.y, ok=jnp.asarray(False))

    def form_factor(self, p: Point, cache: Cache, prev: Factor,
                    pdata=None) -> Factor:
        if self.matrix_free:
            return self._form_factor_matrix_free(p, prev)
        nlp = self.nlp
        y_eff = p.y + p.mu * self.pars.a_norm_penalty
        if self._H_const is not None:
            H = self._H_const
        elif self._param_const_hess:
            H = prev.H
        else:
            H = nlp.lag_hess(p.x, y_eff, pdata)
        if self._Jc_const is not None:
            Jc = self._Jc_const
        elif self._param_const_jac:
            Jc = prev.Jc
        else:
            Jc = nlp.jac_orig(p.x, pdata)

        wc, bnd = nlp.split_canonical_sq(p.y / p.s)
        Qd, Qs = self._banded_blocks(H, Jc, wc, bnd)
        # same multiset as diag(Q) up to the identity tail -> tau test and
        # delta zero-try behave as in the dense kernel
        schur_diag = jax.vmap(jnp.diagonal)(Qd).reshape(-1)[
            jnp.asarray(self.iperm)]
        return Factor(Jc=Jc, H=H, Q=(Qd, Qs), schur_diag=schur_diag,
                      L=prev.L, D=prev.D, delta=prev.delta,
                      s_f=p.s, y_f=p.y, ok=jnp.asarray(False))

    def finalize_solver(self, L):
        # the structured factor IS the solve operator (block tuple); the
        # dense kernel's pallas/invchol finalize paths do not apply
        return L

    def factor(self, Q, delta, rescale=None, fact=None):
        Qd, Qs = Q
        if self.partitions > 1:
            pf = partitioned_factor(Qd, Qs, delta, self.partitions)
            return (self._shard_chunks(pf), jnp.zeros(1, Qd.dtype)), pf.ok
        if self.use_pallas:
            # hybrid: XLA scan factor + Pallas matmul-sweep solve
            # (results/profile_tridiag_tpu.md)
            from ..ops.tridiag_pallas import block_inverses
            f = tridiag_factor(Qd, Qs, delta)
            return ((block_inverses(f.Ck), f.Ek),
                    jnp.zeros(1, Qd.dtype)), f.ok
        f = tridiag_factor(Qd, Qs, delta)
        return ((f.Ck, f.Ek), jnp.zeros(1, Qd.dtype)), f.ok

    def chol_solve(self, L, b):
        """Permute -> banded block solve -> unpermute."""
        n, n_pad, K, nb = self.n, self.n_pad, self.K, self.nb
        bp = b[jnp.asarray(self.perm)]
        if n_pad != n:
            bp = jnp.pad(bp, (0, n_pad - n))
        bp = bp.reshape(K, nb)
        if self.partitions > 1:
            xp = partitioned_solve(L, bp)
        elif self.use_pallas:
            from ..ops.tridiag_pallas import pallas_tridiag_solve
            Ci, Ek = L
            xp = pallas_tridiag_solve(Ci, Ek, bp)
        else:
            Ck, Ek = L
            xp = tridiag_solve(TridiagFactor(Ck, Ek, jnp.asarray(True)), bp)
        return xp.reshape(-1)[:n][jnp.asarray(self.iperm)]

    def _empty_factor(self) -> Factor:
        n, m = self.n, self.m
        dt = self.dtype
        K, nb = self.K, self.nb
        eyeK = jnp.broadcast_to(jnp.eye(nb, dtype=dt), (K, nb, nb))
        zsub = jnp.zeros((max(K - 1, 0), nb, nb), dt)
        if self.partitions > 1:
            L0 = partitioned_factor(eyeK, zsub, 0.0, self.partitions)
        else:
            L0 = (eyeK, zsub)
        if self.matrix_free:
            return Factor(Jc=jnp.zeros(n, dt),       # x slot
                          H=jnp.zeros((), dt),       # mu slot
                          Q=(eyeK, zsub),
                          schur_diag=jnp.zeros(n, dt),
                          L=L0, D=jnp.zeros(1, dt),
                          delta=jnp.asarray(0.0, dt),
                          s_f=jnp.ones(m, dt), y_f=jnp.ones(m, dt),
                          ok=jnp.asarray(False))
        return Factor(Jc=jnp.zeros((self.nlp.m_orig, n), dt),
                      H=jnp.zeros((n, n), dt),
                      Q=(eyeK, zsub),
                      schur_diag=jnp.zeros(n, dt),
                      L=L0, D=jnp.zeros(1, dt),
                      delta=jnp.asarray(0.0, dt),
                      s_f=jnp.ones(m, dt), y_f=jnp.ones(m, dt),
                      ok=jnp.asarray(False))
