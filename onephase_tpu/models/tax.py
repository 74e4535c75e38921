"""Mirrlees optimal-tax design NLPs (the ECON50/125/250 scenario problems).

Reference: benchmark/Tax-problem/tax1D.jl:6-36 — `na` agent types with
utility u_i(c, y) = log(c) - (y/w_i)^(mu_i+1)/(mu_i+1); maximize total
welfare subject to incentive-compatibility constraints u_i(c_i,y_i) >=
u_i(c_p,y_p) for all i != p and a resource constraint sum lambda_i (y_i -
c_i) >= 0.

Baseline parity targets (benchmark-tables/table_ECON_one-phase.csv:2-4):
ECON50 268 it / ECON125 250 it / ECON250 326 it, all Optimal.

The na(na-1) incentive rows are vectorized (one (na, na) utility matrix, no
Python loops) so the constraint Jacobian is MXU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..nlp import NLPSpec

INF = np.inf


def _offdiag(M, na):
    """Row-major off-diagonal elements of an (na, na) matrix WITHOUT a
    gather: flat[1:].reshape(na-1, na+1)[:, :-1] is exactly the
    nonzero(~eye) row-major order.  Gathers over 62k indices are slow on
    TPU (especially under emulated f64); this lowers to strided slices."""
    return M.reshape(-1)[1:].reshape(na - 1, na + 1)[:, :-1].reshape(-1)


def tax1d(na: int = 50, mu_exp: float = 1.0, lam: float = 1.0) -> NLPSpec:
    w = np.linspace(1.0, float(na), na)          # wages w_i = 1..na
    w_j = jnp.asarray(w)
    mu1 = mu_exp + 1.0                            # mu_i + 1 (all ones)

    def util_matrix(c, y):
        # U[i, p] = u_i(c_p, y_p) = log(c_p) - (y_p / w_i)^(mu+1)/(mu+1)
        return (jnp.log(c)[None, :]
                - (y[None, :] / w_j[:, None]) ** mu1 / mu1)

    def f(z):
        c, y = z[:na], z[na:]
        own = jnp.log(c) - (y / w_j) ** mu1 / mu1
        return -lam * jnp.sum(own)

    # na*(na-1) incentive rows in nonzero(~eye) row-major order
    iu = np.nonzero(~np.eye(na, dtype=bool))
    iu_r = jnp.asarray(iu[0])
    iu_c = jnp.asarray(iu[1])

    def c_fn(z):
        c, y = z[:na], z[na:]
        U = util_matrix(c, y)
        own = jnp.diagonal(U)
        ic = _offdiag(own[:, None] - U, na)       # u_i(own) - u_i(p's bundle)
        resource = lam * jnp.sum(y - c)
        return jnp.concatenate([ic, resource[None]])

    # NOTE a hand-built analytic Jacobian (4 scatter-adds over the na(na-1)
    # rows) was measured 2.9x SLOWER than jacfwd of the strided c_fn on
    # TPU at na=250 under f64 emulation (51.6 vs 18.1 ms) — scatters are
    # the slow primitive, jvp lanes of reshape/log/pow are fast.  AD it is.
    m = na * (na - 1) + 1
    return NLPSpec(
        f=f, c=c_fn,
        lcon=np.zeros(m), ucon=np.full(m, INF),
        lvar=np.zeros(2 * na), uvar=np.full(2 * na, INF),
        x0=np.ones(2 * na), name=f"ECON{na}")


def tax_grouped(G: int = 8, na_g: int = 16, mu_exp: float = 1.0,
                lam: float = 1.0, wage_spread: str = "additive"):
    """Block-angular ECON variant for the arrow-KKT path
    (parallel/scenario.py): G agent groups (regions), each with its own
    wage grid and WITHIN-group incentive-compatibility rows, coupled
    through a shared demogrant z (a lump-sum transfer added to every
    agent's consumption, funded group-by-group).

    Economically: regional Mirrlees design with a common transfer; agents
    compare bundles only within their region.  Structurally: per-group
    variables x_k = (c, y), per-group constraints (IC + regional budget
    net of the transfer), coupling variable z — the scenario-structured
    analogue of the dense tax1d/ECON models
    (benchmark/Tax-problem/tax1D.jl:6-36) that the generic kernel solves.
    """
    from ..parallel.scenario import TwoStageSpec

    mu1 = mu_exp + 1.0
    # per-group wage grids.  "additive": group g covers wages offset by g
    # (the original design) — note the RELATIVE within-group spread shrinks
    # like 1/g, so at large G the high groups' incentive-compatibility rows
    # become near-parallel and the dual endgame degenerates (measured at
    # G=64: scaled dual feasibility plateaus above tol and one line-search
    # failure sends delta into the lag_delta_inc spiral; see
    # delta.lag_cap in config.py and __graft_entry__).  "banded": group g
    # reuses the wage band of g % 8 — every group has the conditioning of
    # the small-G case that converges robustly, while the block count (and
    # the sharded arrow structure) still scales with G.
    if wage_spread == "banded":
        w = np.stack([np.linspace(1.0 + (g % 8), float(na_g) + (g % 8),
                                  na_g) for g in range(G)])   # (G, na_g)
    else:
        w = np.stack([np.linspace(1.0 + g, float(na_g) + g, na_g)
                      for g in range(G)])          # (G, na_g)
    iu = np.nonzero(~np.eye(na_g, dtype=bool))
    iu_r = jnp.asarray(iu[0])
    iu_c = jnp.asarray(iu[1])
    data = {"w": jnp.asarray(w)}
    mc = na_g * (na_g - 1) + 1

    def split(xk):
        return xk[:na_g], xk[na_g:]

    def fk(xk, z, d):
        c, y = split(xk)
        ce = c + z[0]
        own = jnp.log(ce) - (y / d["w"]) ** mu1 / mu1
        return -lam * jnp.sum(own)

    def f0(z):
        return 0.0 * z[0]

    def ck(xk, z, d):
        c, y = split(xk)
        ce = c + z[0]
        U = (jnp.log(ce)[None, :]
             - (y[None, :] / d["w"][:, None]) ** mu1 / mu1)
        own = jnp.diagonal(U)
        ic = own[iu_r] - U[iu_r, iu_c]
        resource = lam * jnp.sum(y - c) - na_g * z[0]
        return jnp.concatenate([ic, resource[None]])

    return TwoStageSpec(
        f0=f0, fk=fk, ck=ck, data=data, K=G, nz=1, nx=2 * na_g, mc=mc,
        lcon=np.zeros(mc), ucon=np.full(mc, np.inf),
        lz=np.zeros(1), uz=np.full(1, 10.0),
        lx=np.concatenate([np.full(na_g, 1e-6), np.zeros(na_g)]),
        ux=np.full(2 * na_g, np.inf),
        z0=np.full(1, 0.1), x0=np.ones(2 * na_g),
        name=f"ECON_G{G}x{na_g}")
