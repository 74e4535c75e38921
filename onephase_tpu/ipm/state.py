"""Solver state pytrees and status codes.

The reference carries a mutable `Class_iterate` (src/utils/Class_iterate.jl:40-84)
with an eval cache and a mutable `Class_point` (src/utils/Class_point.jl:2-13).
The TPU design is a flat immutable pytree threaded through `lax.while_loop`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# status codes (reference: symbols returned by one_phase_IPM / terminate,
# src/IPM/one_phase.jl + src/IPM/terminate.jl:3-23)
RUNNING = 0
OPTIMAL = 1                # :Optimal
PRIMAL_INFEASIBLE = 2      # :primal_infeasible
DUAL_INFEASIBLE = 3        # :dual_infeasible (unbounded)
MAX_GRADIENT = 4           # :max_gradient
MAX_IT = 5                 # :MAX_IT
MAX_TIME = 6               # :MAX_TIME
MAX_DELTA = 7              # :MAX_DELTA
NAN_ERR = 8                # :NaN_ERR (harness-level in the reference)
STALLED = 9                # TPU addition: per-instance no-progress exit
                           # (term.stall_patience) — batched campaigns hand
                           # these to the f64 escalation pass early instead
                           # of burning masked whole-batch iterations

STATUS_NAMES = {
    RUNNING: "RUNNING",
    OPTIMAL: "Optimal",
    PRIMAL_INFEASIBLE: "primal_infeasible",
    DUAL_INFEASIBLE: "dual_infeasible",
    MAX_GRADIENT: "max_gradient",
    MAX_IT: "MAX_IT",
    MAX_TIME: "MAX_TIME",
    MAX_DELTA: "MAX_DELTA",
    NAN_ERR: "NaN_ERR",
    STALLED: "STALLED",
}

# line-search / step statuses (internal)
LS_NONE = 0
LS_SUCCESS = 1
LS_PREDICT_RED_NON_NEG = 2
LS_MIN_ALPHA = 3
LS_MAX_LS_IT = 4
LS_S_BOUND = 5
LS_DUAL_INFEASIBLE = 6
LS_NAN_ERR = 7
LS_NOT_ENOUGH_PROGRESS = 8
LS_NAN_DIR = 9


class Point(NamedTuple):
    """(x, y, s, mu, beta) — beta is `primal_scale` (Class_point.jl:2-13)."""

    x: jnp.ndarray
    y: jnp.ndarray
    s: jnp.ndarray
    mu: jnp.ndarray
    beta: jnp.ndarray


class Cache(NamedTuple):
    """Oracle evaluations at the current (x, y) (reference Class_cache).

    jt_y = canonical J(x)^T y; jt_ones = canonical J(x)^T 1 (regularizer
    gradient direction, eval.jl:59-63).  Together with g these give
    grad-of-Lagrangian at any mu without re-evaluating oracles.
    """

    fval: jnp.ndarray
    cons: jnp.ndarray     # original c(x), (m_orig,)
    a: jnp.ndarray        # canonical a(x), (m,)
    g: jnp.ndarray        # grad f, (n,)
    jt_y: jnp.ndarray     # (n,)
    jt_ones: jnp.ndarray  # (n,)


class Factor(NamedTuple):
    """KKT factorization state at the factorization point
    (reference Schur_KKT_solver, src/kkt_system_solver/schur.jl:3-31).
    """

    Jc: jnp.ndarray          # original Jacobian at factor point, (m_orig, n)
    H: jnp.ndarray           # Lagrangian Hessian (n, n), full symmetric
    Q: jnp.ndarray           # Schur complement H + J^T diag(y/s) J, no delta
    schur_diag: jnp.ndarray  # diag(Q)
    L: jnp.ndarray           # Cholesky factor (schur) / unit-lower L (ldlt)
    D: jnp.ndarray           # LDL^T pivots (symmetric path; ones for schur)
    delta: jnp.ndarray       # delta used in L
    s_f: jnp.ndarray         # slacks at factor point
    y_f: jnp.ndarray         # duals at factor point
    ok: jnp.ndarray          # bool: factorization has correct inertia
    # diagonal rescaling vector r of the clever-symmetric system — Q stores
    # R K R with R = diag(r) (reference kkt_system_rescale :u_only/:u_and_x,
    # clever_symmetric.jl:310-338,383-393).  None when rescaling is off or
    # for the schur/symmetric paths (no pytree leaf).
    rescale: jnp.ndarray = None


class Dir(NamedTuple):
    """Newton direction (a `Class_point` used as a direction in the reference)."""

    x: jnp.ndarray
    y: jnp.ndarray
    s: jnp.ndarray
    mu: jnp.ndarray
    beta: jnp.ndarray   # primal_scale component


class Filter(NamedTuple):
    """Filter entries (merit, scaled kkt err, primal_scale) —
    reference Class_filter, src/line_search/filter_ls.jl:44-66."""

    merit: jnp.ndarray   # (cap,)
    kkt: jnp.ndarray     # (cap,)
    beta: jnp.ndarray    # (cap,)
    count: jnp.ndarray   # int32


class History(NamedTuple):
    buf: jnp.ndarray     # (cap, NCOLS)
    count: jnp.ndarray   # int32


class LSInfo(NamedTuple):
    """Line-search outcome (reference abstract_ls_info)."""

    status: jnp.ndarray       # int32, LS_* code
    alpha_P: jnp.ndarray
    alpha_D: jnp.ndarray
    num_steps: jnp.ndarray    # int32


class State(NamedTuple):
    p: Point
    cache: Cache
    fact: Factor
    dir: Dir
    filt: Filter
    hist: History
    r0: jnp.ndarray            # primal_residual_initial (Class_iterate.jl:41,83)
    delta: jnp.ndarray         # local_info.delta
    t: jnp.ndarray             # outer iteration counter (int32)
    status: jnp.ndarray        # int32 status code
    step_ok: jnp.ndarray       # bool: last step succeeded
    last_superlinear: jnp.ndarray  # bool
    kkt_ratio: jnp.ndarray     # a-posteriori KKT error ratio of last direction
    eta: jnp.ndarray           # (3,) last reduction factors (P, D, mu)
    ls: LSInfo
    agg_mask: jnp.ndarray      # bool: last step was aggressive
    num_fac_inertia: jnp.ndarray  # int32, factorizations in last inertia search
    tot_num_fac: jnp.ndarray   # int32, factorizations in last outer iteration
    cum_fac: jnp.ndarray       # int32, total factorizations this solve
    bvals: dict                # bound VALUES {l,u,lv,uv} (traced; enables
                               # batching over bound data, nlp.a_of)
    pdata: dict                # parametric problem data pytree (traced;
                               # enables batching over instance data — {} for
                               # non-parametric problems, see nlp.NLPSpec)
    # stall-exit tracking (term.stall_patience > 0 only; None otherwise so
    # the pytree stays unchanged for existing configs)
    best_prog: jnp.ndarray = None   # best mu + max_vio seen
    last_prog_t: jnp.ndarray = None  # outer iteration of last improvement
