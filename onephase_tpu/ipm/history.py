"""Iteration history recording + console progress table.

Reference: src/IPM/display_progress.jl (`alg_history2` — 30 metrics per inner
iteration — `record_progress!`, `head_progress`; column meanings documented in
the reference README.md:62-103).

In the TPU design the history is a fixed-capacity device ring written inside
the jitted loop; decoding/printing happens host-side between chunks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# column order (alg_history2 fields, display_progress.jl:7-42)
COLUMNS = [
    "t", "step_type", "eta_P", "eta_D", "eta_mu",
    "ls_num_steps", "alpha_P", "alpha_D",
    "dir_x_norm", "dir_y_norm", "dir_s_norm", "kkt_ratio",
    "mu", "fval", "dual_scaled", "norm_grad_lag",
    "primal_residual", "con_vio", "comp", "sy_inf", "comp_ratio", "sy_mean",
    "farkas", "delta", "merit", "phi", "grad_phi_norm",
    "y_norm", "x_norm", "tot_num_fac", "num_fac_inertia", "strict_comp",
]
NCOLS = len(COLUMNS)
IDX = {c: i for i, c in enumerate(COLUMNS)}


def record(kernel, st, step_type):
    """Compute the 32 metrics at the current state and append to the ring."""
    p, cache = st.p, st.cache
    mu = p.mu
    sy = p.s * p.y
    comp = sy - mu
    comp_inf = jnp.max(jnp.abs(comp))
    grad_lag = kernel.grad_lag(cache, p.y, mu)
    gl_inf = jnp.max(jnp.abs(grad_lag))
    scale = kernel.dual_scale(p.y, p.s)
    jt_y_1 = jnp.sum(jnp.abs(cache.jt_y))
    feas_obj = -jnp.sum(cache.a * p.y)
    fark1 = jnp.where(feas_obj > 0.0, jt_y_1 / feas_obj, jnp.inf)
    fark2 = (jt_y_1 + jnp.dot(p.s, p.y)) / jnp.sum(jnp.abs(p.y))
    phi = kernel.eval_phi(p, cache, mu)
    # grad phi = grad_lag with y_tilde = mu/s
    jt_mus = kernel.nlp.jtprod(p.x, mu / p.s)
    gphi = cache.g - jt_mus + mu * kernel.pars.a_norm_penalty * cache.jt_ones
    s_n = jnp.max(jnp.abs(p.s))
    y_n = jnp.max(jnp.abs(p.y))
    strict = jnp.max(jnp.minimum(p.s / s_n, p.y / y_n))
    dt = p.x.dtype

    row = jnp.stack([
        st.t.astype(dt), jnp.asarray(step_type, dt),
        st.eta[0], st.eta[1], st.eta[2],
        st.ls.num_steps.astype(dt), st.ls.alpha_P, st.ls.alpha_D,
        jnp.max(jnp.abs(st.dir.x)), jnp.max(jnp.abs(st.dir.y)),
        jnp.max(jnp.abs(st.dir.s)), st.kkt_ratio,
        mu, cache.fval, gl_inf * scale, gl_inf,
        jnp.max(jnp.abs(cache.a - p.s)),
        -jnp.minimum(0.0, jnp.min(cache.a)),
        comp_inf, jnp.max(sy),
        jnp.maximum(jnp.max(sy / mu), jnp.max(mu / sy)),
        jnp.mean(sy),
        jnp.maximum(fark1, fark2), st.delta,
        kernel.eval_merit(p, cache), phi, jnp.max(jnp.abs(gphi)),
        y_n, jnp.max(jnp.abs(p.x)),
        st.tot_num_fac.astype(dt), st.num_fac_inertia.astype(dt), strict,
    ])
    h = st.hist
    i = jnp.minimum(h.count, h.buf.shape[0] - 1)
    return h._replace(buf=h.buf.at[i].set(row),
                      count=jnp.minimum(h.count + 1, h.buf.shape[0]))


# ---------------------------------------------------------------------------
# host-side decoding / printing
# ---------------------------------------------------------------------------
STEP_NAMES = {0: "it0", 1: "agg", 2: "stb"}

HEADER = ("  it step    eta_mu    α_P      α_D    ls    |dx|     |dy|    N err"
          " |    mu      dual    primal   cmp scl  infeas? |  delta   #fac"
          "   |x|     |y|")


def rows_to_records(buf: np.ndarray, count: int):
    """Convert the ring buffer to a list of dict records."""
    out = []
    for i in range(int(count)):
        row = buf[i]
        rec = {c: float(row[j]) for j, c in enumerate(COLUMNS)}
        rec["t"] = int(rec["t"])
        rec["step_type"] = STEP_NAMES.get(int(rec["step_type"]), "?")
        rec["ls_num_steps"] = int(rec["ls_num_steps"])
        rec["tot_num_fac"] = int(rec["tot_num_fac"])
        rec["num_fac_inertia"] = int(rec["num_fac_inertia"])
        out.append(rec)
    return out


def _rd(v):
    if not np.isfinite(v):
        return f"{str(v):>9}"
    return f"{v:9.1e}"


def format_row(r, scale) -> str:
    comp_scaled = r["sy_inf"] * scale
    return (f"{r['t']:4d} {r['step_type']:<4s}{_rd(r['eta_mu'])}"
            f"{_rd(r['alpha_P'])}{_rd(r['alpha_D'])} {r['ls_num_steps']:3d}"
            f"{_rd(r['dir_x_norm'])}{_rd(r['dir_y_norm'])}{_rd(r['kkt_ratio'])}"
            f" |{_rd(r['mu'])}{_rd(r['dual_scaled'])}{_rd(r['primal_residual'])}"
            f"{_rd(comp_scaled)}{_rd(r['farkas'])}"
            f" |{_rd(r['delta'])} {r['tot_num_fac']:4d}"
            f"{_rd(r['x_norm'])}{_rd(r['y_norm'])}")
