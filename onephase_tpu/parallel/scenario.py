"""Scenario-structured (two-stage) one-phase IPM with arrow KKT.

TPU-first capability (SURVEY.md §7 item 5, no reference counterpart beyond
the ECON models themselves): problems

    min  f0(z) + sum_k fk(x_k, z; d_k)
    s.t. lcon <= ck(x_k, z; d_k) <= ucon   for each scenario k
         bounds on z and x_k

run the *same* one-phase algorithm (all of ipm/core.py's step control, line
search, certificates), but the KKT linear algebra never materializes the
dense (nz + K*nx)^2 Schur complement: it is kept in arrow form
(ops/block_schur.py), with per-scenario Cholesky factors vmapped over k and
the coupling border assembled by summation — a psum over ICI when the
scenario axis is sharded over a mesh.

`TwoStageSpec.to_nlpspec()` lowers to a flat NLPSpec so the generic solver
cross-checks the structured path (tests/test_scenario.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Params
from ..ipm.core import OnePhaseKernel, _norm_inf
from ..ipm.state import Cache, Dir, Factor, Point
from ..nlp import NLPSpec, canonicalize
from ..ops.block_schur import ArrowFactor, arrow_factor, arrow_solve


@dataclass
class TwoStageSpec:
    f0: Callable            # z -> scalar
    fk: Callable            # (xk, z, data_k) -> scalar
    ck: Callable            # (xk, z, data_k) -> (mc,)
    data: Any               # pytree with leading scenario axis K
    K: int
    nz: int
    nx: int
    mc: int
    lcon: np.ndarray        # (mc,) per-scenario constraint bounds
    ucon: np.ndarray
    lz: np.ndarray          # (nz,)
    uz: np.ndarray
    lx: np.ndarray          # (nx,)
    ux: np.ndarray
    z0: np.ndarray
    x0: np.ndarray          # (nx,) replicated start (or (K, nx))
    name: str = "two_stage"

    def to_nlpspec(self) -> NLPSpec:
        K, nz, nx, mc = self.K, self.nz, self.nx, self.mc
        fk, ck, f0, data = self.fk, self.ck, self.f0, self.data

        def split(xflat):
            return xflat[:nz], xflat[nz:].reshape(K, nx)

        def f(xflat):
            z, X = split(xflat)
            vals = jax.vmap(lambda xk, d: fk(xk, z, d))(X, data)
            return f0(z) + jnp.sum(vals)

        def c(xflat):
            z, X = split(xflat)
            C = jax.vmap(lambda xk, d: ck(xk, z, d))(X, data)
            return C.reshape(K * mc)

        x0 = np.broadcast_to(self.x0, (K, nx)).reshape(-1)
        return NLPSpec(
            f=f, c=c,
            lcon=np.tile(self.lcon, K), ucon=np.tile(self.ucon, K),
            lvar=np.concatenate([self.lz, np.tile(self.lx, K)]),
            uvar=np.concatenate([self.uz, np.tile(self.ux, K)]),
            x0=np.concatenate([self.z0, x0]),
            name=self.name)


class ScenarioKernel(OnePhaseKernel):
    """OnePhaseKernel whose KKT path is the arrow factorization.

    Variable layout is the flat [z; vec(X)] of `to_nlpspec`, so the whole
    state/line-search machinery is inherited unchanged; only the block
    linear algebra is overridden.
    """

    def __init__(self, spec: TwoStageSpec, pars: Params, dtype=None,
                 mesh: Optional[Mesh] = None, scen_axis: str = "blk"):
        """With `mesh`, the scenario axis is sharded over `scen_axis` under
        GSPMD: every K-leading tensor (jacobian/hessian blocks, Q_kk, B_k,
        scenario Cholesky factors) carries a sharding constraint, so the
        per-scenario factorizations run device-local and the border sums
        (sum_k B_k^T Q_kk^{-1} B_k and its solve-side twin) lower to one
        all-reduce over ICI — the GSPMD form of
        ops/block_schur.sharded_arrow_factor_solve.
        """
        self.spec = spec
        self.mesh = mesh
        self.scen_axis = scen_axis
        if mesh is not None:
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                                 if a == scen_axis]))
            if spec.K % max(n_dev, 1) != 0:
                raise ValueError(
                    f"K={spec.K} not divisible by mesh axis "
                    f"'{scen_axis}' size {n_dev}")
            # scenario data lives sharded on device from the start
            spec.data = jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    jnp.asarray(a), self._k_sharding(jnp.asarray(a).ndim)),
                spec.data)
        nlp = canonicalize(spec.to_nlpspec(), dtype=dtype)
        if pars.kkt.kkt_solver_type != "schur":
            raise ValueError("ScenarioKernel implements the schur path only")
        super().__init__(nlp, pars)

    def _k_sharding(self, ndim):
        return NamedSharding(self.mesh,
                             P(self.scen_axis, *([None] * (ndim - 1))))

    def _shard_k(self, arr):
        """Sharding constraint on a K-leading tensor (no-op without mesh)."""
        if self.mesh is None:
            return arr
        return jax.lax.with_sharding_constraint(
            arr, self._k_sharding(arr.ndim))

    # ---------------- structured pieces ------------------------------
    def _split_x(self, x):
        sp = self.spec
        return x[:sp.nz], self._shard_k(x[sp.nz:].reshape(sp.K, sp.nx))

    def _scenario_jacs(self, x):
        """Jx (K, mc, nx), Jz (K, mc, nz) of ck at (x)."""
        sp = self.spec
        z, X = self._split_x(x)

        def one(xk, d):
            jx = jax.jacrev(lambda a: sp.ck(a, z, d))(xk)
            jz = jax.jacrev(lambda b: sp.ck(xk, b, d))(z)
            return jx, jz

        Jx, Jz = jax.vmap(one)(X, sp.data)
        return self._shard_k(Jx), self._shard_k(Jz)

    def _split_wc(self, wc):
        """(K*mc,) original-constraint weights -> (K, mc)."""
        return wc.reshape(self.spec.K, self.spec.mc)

    def _hess_blocks(self, x, y_eff):
        """(Hzz, Hkk (K,nx,nx), Hkz (K,nx,nz)) of the Lagrangian."""
        sp = self.spec
        z, X = self._split_x(x)
        wc, _ = self.nlp.split_canonical(y_eff)
        W = self._split_wc(wc)

        def lag_k(xk, zz, d, w):
            return sp.fk(xk, zz, d) - jnp.dot(w, sp.ck(xk, zz, d))

        def blocks(xk, d, w):
            hxx = jax.hessian(lambda a: lag_k(a, z, d, w))(xk)
            hxz = jax.jacfwd(lambda b: jax.grad(
                lambda a: lag_k(a, b, d, w))(xk))(z)
            hzz = jax.hessian(lambda b: lag_k(xk, b, d, w))(z)
            return hxx, hxz, hzz

        Hkk, Hkz, Hzz_k = jax.vmap(blocks)(X, sp.data, W)
        # the K-sum lowers to an all-reduce when scenarios are sharded
        Hzz = jax.hessian(sp.f0)(z) + jnp.sum(self._shard_k(Hzz_k), 0)
        return Hzz, self._shard_k(Hkk), self._shard_k(Hkz)

    def _hess_mv(self, H, v):
        Hzz, Hkk, Hkz = H
        vz, vX = self._split_x(v)
        out_z = Hzz @ vz + jnp.einsum("kxz,kx->z", Hkz, vX)
        out_X = jnp.einsum("kxy,ky->kx", Hkk, vX) + Hkz @ vz
        return jnp.concatenate([out_z, out_X.reshape(-1)])

    # ---------------- overridden KKT path ----------------------------
    def form_factor(self, p: Point, cache: Cache, prev: Factor,
                    pdata=None) -> Factor:
        sp = self.spec
        nlp = self.nlp
        y_eff = p.y + p.mu * self.pars.a_norm_penalty
        H = self._hess_blocks(p.x, y_eff)
        Jx, Jz = self._scenario_jacs(p.x)

        d = p.y / p.s
        wc, bnd = nlp.split_canonical_sq(d)
        W = self._split_wc(wc)
        bnd_z, bnd_X = self._split_x(bnd)

        Hzz, Hkk, Hkz = H
        Qkk = Hkk + jnp.einsum("kmx,km,kmy->kxy", Jx, W, Jx)
        Qkk = self._shard_k(Qkk + jax.vmap(jnp.diag)(bnd_X))
        Bk = self._shard_k(Hkz + jnp.einsum("kmx,km,kmz->kxz", Jx, W, Jz))
        Qzz = (Hzz + jnp.sum(jnp.einsum("kmz,km,kmw->kzw", Jz, W, Jz), 0)
               + jnp.diag(bnd_z))
        schur_diag = jnp.concatenate([
            jnp.diagonal(Qzz), jax.vmap(jnp.diagonal)(Qkk).reshape(-1)])
        return Factor(Jc=(Jx, Jz), H=H, Q=(Qzz, Qkk, Bk),
                      schur_diag=schur_diag,
                      L=prev.L, D=prev.D, delta=prev.delta,
                      s_f=p.s, y_f=p.y, ok=jnp.asarray(False))

    def factor(self, Q, delta, rescale=None, fact=None):
        # rescale is a clever_symmetric-only concept; the arrow path never
        # rescales (kkt_system_rescale is ignored for kkt_solver_type=schur).
        Qzz, Qkk, Bk = Q
        f = arrow_factor(Qzz, self._shard_k(Qkk), self._shard_k(Bk), delta)
        return ((self._shard_k(f.Lk), f.LS),
                jnp.zeros(1, Qzz.dtype)), f.ok

    def _arrow_solve(self, fact, rhs):
        Lk, LS = fact.L
        _, _, Bk = fact.Q
        rz, rX = self._split_x(rhs)
        f = ArrowFactor(Lk=Lk, LS=LS, ok=jnp.asarray(True))
        dz, dxk = arrow_solve(f, Bk, rz, rX)
        return jnp.concatenate([dz, dxk.reshape(-1)])

    def _struct_jprod(self, fact, v):
        """Canonical J v via scenario jacobian blocks."""
        Jx, Jz = fact.Jc
        vz, vX = self._split_x(v)
        jc_v = (jnp.einsum("kmx,kx->km", Jx, vX) + Jz @ vz).reshape(-1)
        return self.nlp.jprod_from(jc_v, v)

    def _struct_jtprod(self, fact, w):
        Jx, Jz = fact.Jc
        wc, bnd = self.nlp.split_canonical(w)
        W = self._split_wc(wc)
        out_z = jnp.sum(jnp.einsum("kmz,km->kz", Jz, W), 0)
        out_X = jnp.einsum("kmx,km->kx", Jx, W)
        return jnp.concatenate([out_z, out_X.reshape(-1)]) + bnd

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
            dx = dx + self._arrow_solve(fact, res)
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
        return Factor(
            Jc=(jnp.zeros((sp.K, sp.mc, sp.nx), dt),
                jnp.zeros((sp.K, sp.mc, sp.nz), dt)),
            H=(jnp.zeros((sp.nz, sp.nz), dt),
               jnp.zeros((sp.K, sp.nx, sp.nx), dt),
               jnp.zeros((sp.K, sp.nx, sp.nz), dt)),
            Q=(jnp.zeros((sp.nz, sp.nz), dt),
               jnp.zeros((sp.K, sp.nx, sp.nx), dt),
               jnp.zeros((sp.K, sp.nx, sp.nz), dt)),
            schur_diag=jnp.zeros(n, dt),
            L=(jnp.stack([jnp.eye(sp.nx, dtype=dt)] * sp.K),
               jnp.eye(sp.nz, dtype=dt)),
            D=jnp.zeros(1, dt),
            delta=jnp.asarray(0.0, dt),
            s_f=jnp.ones(m, dt), y_f=jnp.ones(m, dt),
            ok=jnp.asarray(False))
