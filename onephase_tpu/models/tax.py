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

    # off-diagonal mask for the na*(na-1) incentive rows
    iu = np.nonzero(~np.eye(na, dtype=bool))
    iu_r = jnp.asarray(iu[0])
    iu_c = jnp.asarray(iu[1])

    def c_fn(z):
        c, y = z[:na], z[na:]
        U = util_matrix(c, y)
        own = jnp.diagonal(U)
        ic = own[iu_r] - U[iu_r, iu_c]            # u_i(own) - u_i(p's bundle)
        resource = lam * jnp.sum(y - c)
        return jnp.concatenate([ic, resource[None]])

    m = na * (na - 1) + 1
    return NLPSpec(
        f=f, c=c_fn,
        lcon=np.zeros(m), ucon=np.full(m, INF),
        lvar=np.zeros(2 * na), uvar=np.full(2 * na, INF),
        x0=np.ones(2 * na), name=f"ECON{na}")
