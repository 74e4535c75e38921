"""mu-scale autotuning sweep.

Reference: src/utils/autotune.jl:1-30 — sweep `init.mu_scale` over
10^-2..10^5 and keep the scale with the fewest iterations to :Optimal.
(The reference version is dead code — it calls an undefined `init`
function; this is the working equivalent.)

TPU twist: the sweep members are independent solves of the same problem, so
they run as one vmapped batch when `parallel=True` — the autotune sweep
costs roughly one solve of wall-clock instead of eight.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .config import Params
from .ipm.state import OPTIMAL
from .nlp import NLPSpec, canonicalize
from .solver import one_phase_solve


def autotune(problem, pars: Optional[Params] = None,
             exponents=range(-2, 6), parallel: bool = False
             ) -> Tuple[bool, int, float]:
    """Returns (success, best_iterations, best_mu_scale)."""
    pars = pars or Params()
    best_it = np.inf
    best_scale = 0.0
    nlp = problem if not isinstance(problem, NLPSpec) else canonicalize(problem)

    if parallel:
        return _autotune_batched(nlp, pars, exponents)

    for e in exponents:
        scale = 10.0 ** e
        p = pars.with_overrides({"init.mu_scale": scale})
        if pars.output_level >= 1:
            print(f"--------  MU_SCALE = {scale} ----------")
        r = one_phase_solve(nlp, p)
        if r.status_code == OPTIMAL and r.iterations < best_it - 1:
            best_it = r.iterations
            best_scale = scale
    return best_scale > 0.0, int(best_it) if np.isfinite(best_it) else -1, best_scale


def _autotune_batched(nlp, pars, exponents):
    """All mu_scale candidates as one vmapped batch (shared structure)."""
    import jax
    import jax.numpy as jnp

    from .ipm.core import OnePhaseKernel
    from .ipm.state import RUNNING

    # mu_scale enters only through the initial state's mu; we reuse one
    # kernel and scale mu after init (correct_guess3: mu *= mu_scale).
    p = pars.with_overrides({"output_level": 0, "history_capacity": 2})
    kernel = OnePhaseKernel(nlp, p)
    scales = jnp.asarray([10.0 ** e for e in exponents], kernel.dtype)

    def init_with_scale(scale):
        st = kernel._initial_state(jnp.asarray(nlp.x0, kernel.dtype))
        pt = st.p._replace(mu=st.p.mu * scale)
        # re-center duals for the scaled mu (change_mu!, guess-vars.jl:179-189)
        cf = p.ls.comp_feas * 2.0
        y_c = pt.mu / pt.s
        y = jnp.minimum(y_c / cf, jnp.maximum(pt.y, cf * y_c))
        pt = pt._replace(y=y)
        return st._replace(p=pt,
                           cache=st.cache._replace(
                               jt_y=kernel.nlp.jtprod(pt.x, y)))

    st = jax.vmap(init_with_scale)(scales)
    run = jax.jit(jax.vmap(kernel._run_chunk))
    for _ in range(1 + p.term.max_it // p.chunk_size):
        if not bool(jnp.any(st.status == RUNNING)):
            break
        st = run(st)
    its = np.asarray(st.t) - 1
    ok = np.asarray(st.status) == OPTIMAL
    if not ok.any():
        return False, -1, 0.0
    best_idx = int(np.argmin(np.where(ok, its, np.inf)))
    return True, int(its[best_idx]), float(np.asarray(scales)[best_idx])
