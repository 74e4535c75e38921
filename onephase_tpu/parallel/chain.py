"""Chain-structured (multiple-shooting / OCP) one-phase IPM.

The structured-sparsity path of the framework (VERDICT item 10 /
SURVEY.md §5 scaling-axis): stage-chained NLPs

    min  sum_k fk(x_k, x_{k+1}; d_k)               k = 0..K-2
    s.t. lcon <= ck(x_k, x_{k+1}; d_k) <= ucon     per stage pair
         lx <= x_k <= ux

(discretized optimal control, chained Rosenbrock / CHAIN-style problems,
reference test/CUTEst.jl:11-30) run the full one-phase algorithm with the
Schur complement kept in block-tridiagonal form (ops/block_tridiag.py):
O(K nb^3) factorization instead of O((K nb)^3) dense — the TPU-native
replacement for the reference's sparse CHOLMOD path (julia.jl:34,52) on
this problem class.  All stage work (jacobian/hessian blocks, Q assembly)
is vmapped over k; only the K-step block recursion is sequential.

`ChainSpec.to_nlpspec()` lowers to a flat NLPSpec so the generic dense
solver cross-checks the structured path (tests/test_chain.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..ipm.core import OnePhaseKernel, _norm_inf
from ..ipm.state import Cache, Dir, Factor, Point
from ..nlp import NLPSpec, canonicalize
from ..ops.block_tridiag import (PartitionedFactor, TridiagFactor,
                                 check_mesh_partitions, partitioned_factor,
                                 partitioned_solve, shard_partitioned,
                                 tridiag_factor, tridiag_matvec,
                                 tridiag_solve)


@dataclass
class ChainSpec:
    fk: Callable            # (xk, xk1, data_k) -> scalar stage cost
    ck: Callable            # (xk, xk1, data_k) -> (mc,) stage constraints
    data: Any               # pytree with leading axis K-1
    K: int                  # number of stages (variables x_0..x_{K-1})
    nx: int                 # per-stage variable count
    mc: int                 # per-stage-pair constraint count
    lcon: np.ndarray        # (mc,)
    ucon: np.ndarray
    lx: np.ndarray          # (nx,) per-stage bounds
    ux: np.ndarray
    x0: np.ndarray          # (nx,) replicated start or (K, nx)
    name: str = "chain"

    def to_nlpspec(self) -> NLPSpec:
        K, nx, mc = self.K, self.nx, self.mc
        fk, ck, data = self.fk, self.ck, self.data

        def split(xflat):
            return xflat.reshape(K, nx)

        def f(xflat):
            X = split(xflat)
            vals = jax.vmap(fk)(X[:-1], X[1:], data)
            return jnp.sum(vals)

        def c(xflat):
            X = split(xflat)
            C = jax.vmap(ck)(X[:-1], X[1:], data)
            return C.reshape((K - 1) * mc)

        x0 = np.broadcast_to(self.x0, (K, nx)).reshape(-1)
        return NLPSpec(
            f=f, c=c,
            lcon=np.tile(self.lcon, K - 1), ucon=np.tile(self.ucon, K - 1),
            lvar=np.tile(self.lx, K), uvar=np.tile(self.ux, K),
            x0=x0, name=self.name)


class ChainKernel(OnePhaseKernel):
    """OnePhaseKernel whose KKT linear algebra is block-tridiagonal."""

    def __init__(self, spec: ChainSpec, pars: Params, dtype=None,
                 mesh=None, chain_axis: str = "chain"):
        """mesh/chain_axis: optional jax.sharding.Mesh whose `chain_axis`
        shards the chunk axis of the partitioned factorization (requires
        kkt.chain_partitions > 1 divisible by the axis size) — the
        cross-device scaling path for chain NLPs (GSPMD inserts the
        collectives, scaling-book recipe)."""
        self.spec = spec
        nlp = canonicalize(spec.to_nlpspec(), dtype=dtype)
        if pars.kkt.kkt_solver_type != "schur":
            raise ValueError("ChainKernel implements the schur path only")
        if pars.kkt.linear_solver_type not in ("xla", "pallas"):
            raise ValueError("ChainKernel has its own block solve path; "
                             "set kkt.linear_solver_type='xla' (scan) or "
                             "'pallas' (single-kernel VMEM recursion)")
        self.use_pallas = pars.kkt.linear_solver_type == "pallas"
        if self.use_pallas and int(pars.kkt.chain_partitions) > 1:
            raise ValueError("pallas tridiag backend is sequential; "
                             "incompatible with chain_partitions > 1")
        self.partitions = int(pars.kkt.chain_partitions)
        if self.partitions > 1 and (spec.K % self.partitions
                                    or spec.K // self.partitions < 2):
            raise ValueError(
                f"chain_partitions={self.partitions} needs K={spec.K} "
                "= P*Kc with Kc>=2")
        self.mesh = mesh
        self.chain_axis = chain_axis
        if mesh is not None:
            check_mesh_partitions(self.partitions, mesh, chain_axis)
        super().__init__(nlp, pars)

    def _shard_chunks(self, pf: PartitionedFactor) -> PartitionedFactor:
        return shard_partitioned(pf, self.mesh, self.chain_axis)

    # ---------------- structured pieces ------------------------------
    def _split_x(self, x):
        sp = self.spec
        return x.reshape(sp.K, sp.nx)

    def _split_wc(self, wc):
        sp = self.spec
        return wc.reshape(sp.K - 1, sp.mc)

    def _stage_jacs(self, x):
        """Ja, Jb (K-1, mc, nx): d ck / d x_k and / d x_{k+1}."""
        sp = self.spec
        X = self._split_x(x)

        def one(xa, xb, d):
            ja = jax.jacrev(lambda a: sp.ck(a, xb, d))(xa)
            jb = jax.jacrev(lambda b: sp.ck(xa, b, d))(xb)
            return ja, jb

        return jax.vmap(one)(X[:-1], X[1:], sp.data)

    def _hess_blocks(self, x, y_eff):
        """Lagrangian Hessian as (Hd (K,nx,nx), Hs (K-1,nx,nx)) where
        Hs[k] = d2L / d x_{k+1} d x_k (the subdiagonal block)."""
        sp = self.spec
        X = self._split_x(x)
        wc, _ = self.nlp.split_canonical(y_eff)
        W = self._split_wc(wc)

        def lag_k(xa, xb, d, w):
            return sp.fk(xa, xb, d) - jnp.dot(w, sp.ck(xa, xb, d))

        def blocks(xa, xb, d, w):
            haa = jax.hessian(lambda a: lag_k(a, xb, d, w))(xa)
            hbb = jax.hessian(lambda b: lag_k(xa, b, d, w))(xb)
            # hba[i, j] = d2 L / d xb_i d xa_j
            hba = jax.jacfwd(lambda a: jax.grad(
                lambda b: lag_k(a, b, d, w))(xb))(xa)
            return haa, hbb, hba

        Haa, Hbb, Hba = jax.vmap(blocks)(X[:-1], X[1:], sp.data, W)
        nx = sp.nx
        Hd = jnp.zeros((sp.K, nx, nx), x.dtype)
        Hd = Hd.at[:-1].add(Haa).at[1:].add(Hbb)
        return Hd, Hba

    def _hess_mv(self, H, v):
        Hd, Hs = H
        V = self._split_x(v)
        return tridiag_matvec(Hd, Hs, V).reshape(-1)

    # ---------------- overridden KKT path ----------------------------
    def form_factor(self, p: Point, cache: Cache, prev: Factor,
                    pdata=None) -> Factor:
        sp = self.spec
        nlp = self.nlp
        y_eff = p.y + p.mu * self.pars.a_norm_penalty
        Hd, Hs = self._hess_blocks(p.x, y_eff)
        Ja, Jb = self._stage_jacs(p.x)

        d = p.y / p.s
        wc, bnd = nlp.split_canonical_sq(d)
        W = self._split_wc(wc)
        bnd_X = self._split_x(bnd)

        # Q diagonal blocks: H + Ja'W Ja (stage k) + Jb'W Jb (stage k-1)
        Qd = Hd + jax.vmap(jnp.diag)(bnd_X)
        Qd = Qd.at[:-1].add(jnp.einsum("kma,km,kmb->kab", Ja, W, Ja))
        Qd = Qd.at[1:].add(jnp.einsum("kma,km,kmb->kab", Jb, W, Jb))
        # subdiagonal block Q[k+1, k]: Jb[k]' W_k Ja[k] + Hba[k]
        Qs = Hs + jnp.einsum("kmi,km,kmj->kij", Jb, W, Ja)

        schur_diag = jax.vmap(jnp.diagonal)(Qd).reshape(-1)
        return Factor(Jc=(Ja, Jb), H=(Hd, Hs), Q=(Qd, Qs),
                      schur_diag=schur_diag,
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
            # hybrid backend (profiled: results/profile_tridiag_tpu.md):
            # XLA's scan FACTOR wins, the Pallas matmul-sweep SOLVE wins
            # 1.2-3.6x — so factor with the scan, invert the diagonal
            # blocks (one K-batched trisolve), and hand (Ci, Ek) to the
            # Pallas solve.  Backsolves are the hot op (~10/outer it).
            from ..ops.tridiag_pallas import block_inverses
            f = tridiag_factor(Qd, Qs, delta)
            return ((block_inverses(f.Ck), f.Ek),
                    jnp.zeros(1, Qd.dtype)), f.ok
        f = tridiag_factor(Qd, Qs, delta)
        return ((f.Ck, f.Ek), jnp.zeros(1, Qd.dtype)), f.ok

    def _tri_solve(self, fact, rhs):
        if self.partitions > 1:
            return partitioned_solve(fact.L, self._split_x(rhs)).reshape(-1)
        if self.use_pallas:
            from ..ops.tridiag_pallas import pallas_tridiag_solve
            Ci, Ek = fact.L
            return pallas_tridiag_solve(Ci, Ek,
                                        self._split_x(rhs)).reshape(-1)
        Ck, Ek = fact.L
        f = TridiagFactor(Ck=Ck, Ek=Ek, ok=jnp.asarray(True))
        return tridiag_solve(f, self._split_x(rhs)).reshape(-1)

    def _struct_jprod(self, fact, v):
        Ja, Jb = fact.Jc
        V = self._split_x(v)
        jc_v = (jnp.einsum("kma,ka->km", Ja, V[:-1])
                + jnp.einsum("kma,ka->km", Jb, V[1:])).reshape(-1)
        return self.nlp.jprod_from(jc_v, v)

    def _struct_jtprod(self, fact, w):
        Ja, Jb = fact.Jc
        wc, bnd = self.nlp.split_canonical(w)
        W = self._split_wc(wc)
        out = jnp.zeros((self.spec.K, self.spec.nx), w.dtype)
        out = out.at[:-1].add(jnp.einsum("kma,km->ka", Ja, W))
        out = out.at[1:].add(jnp.einsum("kma,km->ka", Jb, W))
        return out.reshape(-1) + bnd

    def compute_direction(self, fact: Factor, p: Point, cache: Cache,
                          eta_P, eta_D, eta_mu, pdata=None):
        dual_r, primal_r, comp_r = self.build_rhs(p, cache, eta_P, eta_D,
                                                  eta_mu, pdata)
        y_f, s_f = fact.y_f, fact.s_f
        S_vec = y_f / s_f
        sym_primal = primal_r + comp_r / y_f
        schur_rhs = dual_r + self._struct_jtprod(
            fact, primal_r * S_vec + comp_r / s_f)

        dx = jnp.zeros_like(schur_rhs)
        res = schur_rhs
        for _ in range(self.pars.kkt.it_refine_num):
            dx = dx + self._tri_solve(fact, res)
            jac_res = self._struct_jtprod(
                fact, S_vec * self._struct_jprod(fact, dx))
            res = schur_rhs - (jac_res + self._hess_mv(fact.H, dx)
                               + fact.delta * dx)

        jdx = self._struct_jprod(fact, dx)
        dy = -(jdx - sym_primal) * S_vec
        ds = jdx - primal_r
        dmu = -(1.0 - eta_mu) * p.mu
        dbeta = -(1.0 - eta_P) * p.beta
        direction = Dir(x=dx, y=dy, s=ds, mu=dmu, beta=dbeta)

        pred_lag = (fact.delta * dx + self._hess_mv(fact.H, dx)
                    - self._struct_jtprod(fact, dy))
        err = jnp.concatenate([pred_lag - dual_r, jdx - ds - primal_r,
                               s_f * dy + y_f * ds - comp_r])
        rhs_norm = _norm_inf(jnp.concatenate([dual_r, primal_r, comp_r]))
        return direction, _norm_inf(err) / rhs_norm

    def _empty_factor(self) -> Factor:
        sp = self.spec
        dt = self.dtype
        n, m = self.n, self.m
        nx, K, mc = sp.nx, sp.K, sp.mc
        if self.partitions > 1:
            # identity-block factorization fixes the pytree structure for
            # the while_loop carry; ok=False marks it stale
            L0 = partitioned_factor(
                jnp.stack([jnp.eye(nx, dtype=dt)] * K),
                jnp.zeros((K - 1, nx, nx), dt), 0.0, self.partitions)
        else:
            L0 = (jnp.stack([jnp.eye(nx, dtype=dt)] * K),
                  jnp.zeros((K - 1, nx, nx), dt))
        return Factor(
            Jc=(jnp.zeros((K - 1, mc, nx), dt),
                jnp.zeros((K - 1, mc, nx), dt)),
            H=(jnp.zeros((K, nx, nx), dt), jnp.zeros((K - 1, nx, nx), dt)),
            Q=(jnp.zeros((K, nx, nx), dt), jnp.zeros((K - 1, nx, nx), dt)),
            schur_diag=jnp.zeros(n, dt),
            L=L0,
            D=jnp.zeros(1, dt),
            delta=jnp.asarray(0.0, dt),
            s_f=jnp.ones(m, dt), y_f=jnp.ones(m, dt),
            ok=jnp.asarray(False))
