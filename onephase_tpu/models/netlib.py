"""Netlib-style LP test set.

The true Netlib instances are not redistributable inside this repo (and the
build environment has no network egress), so this module provides:

1. `load_netlib(dir)` — load real instances from a directory of MPS files
   via `lp.read_mps` (drop the Netlib archive there for full parity runs
   against benchmark-tables/table_netlib_infeasible_*.csv).
2. Synthetic stand-in families with the same *character* as the benchmark
   sets (reference: benchmark/Netlib/run_netlib.jl):
   - `feasible_suite()` — small degenerate feasible LPs (AFIRO-scale),
   - `infeasible_suite()` — LPs made infeasible by conflicting rows /
     range shifts, mirroring the lpi_* set's failure modes (empty polytope
     from contradictory inequalities, over-determined equalities, bound
     conflicts surfaced through Farkas certificates).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List

import numpy as np

from ..nlp import NLPSpec
from .lp import lp_spec, perturb_infeasible, read_mps

INF = np.inf


def load_netlib(directory: str) -> Dict[str, NLPSpec]:
    out = {}
    for path in sorted(glob.glob(os.path.join(directory, "*"))):
        base = os.path.basename(path).lower()
        if not (base.endswith(".mps") or base.endswith(".mps.gz")
                or base.endswith(".sif")):
            continue
        name = base.split(".")[0]
        out[name] = read_mps(path, name=name)
    return out


def _rng(seed):
    return np.random.default_rng(seed)


def feasible_suite(sizes=((27, 32), (56, 97), (50, 48)),
                   seed: int = 0) -> Dict[str, NLPSpec]:
    """Random feasible LPs at (AFIRO, ADLITTLE, SC50A)-like sizes with a
    known interior feasible point, mixed equality/inequality rows."""
    names = ["afiro_like", "adlittle_like", "sc50a_like"]
    out = {}
    for k, (m, n) in enumerate(sizes):
        rng = _rng(seed + k)
        A = np.round(rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.3), 3)
        A[np.all(A == 0, axis=1), 0] = 1.0   # no empty rows
        x_feas = rng.random(n)
        b = A @ x_feas
        lcon = np.where(np.arange(m) % 3 == 0, b, b - 1.0)   # every 3rd row eq
        ucon = np.where(np.arange(m) % 3 == 0, b, b + 1.0)
        cvec = rng.normal(size=n)
        out[names[k]] = lp_spec(cvec, A, lcon, ucon,
                                lvar=np.zeros(n), uvar=np.full(n, 10.0),
                                x0=np.full(n, 0.5), name=names[k])
    return out


def infeasible_suite(seed: int = 3) -> Dict[str, NLPSpec]:
    """Synthetic infeasible LPs in the spirit of the lpi_* Netlib set."""
    out = {}

    # conflicting parallel inequalities (lpi_itest6 spirit)
    rng = _rng(seed)
    n = 8
    A1 = rng.normal(size=(4, n))
    A = np.vstack([A1, A1[0]])
    lcon = np.concatenate([np.full(4, -INF), [2.0]])   # row0 <= 1, row0 >= 2
    ucon = np.concatenate([np.full(4, 1.0), [INF]])
    out["syn_parallel_conflict"] = lp_spec(
        rng.normal(size=n), A, lcon, ucon, lvar=np.zeros(n),
        uvar=np.full(n, 50.0), name="syn_parallel_conflict")

    # over-determined inconsistent equalities (lpi_woodinfe spirit)
    rng = _rng(seed + 1)
    n = 12
    A = rng.normal(size=(14, n))
    b = rng.normal(size=14)
    out["syn_overdetermined_eq"] = lp_spec(
        rng.normal(size=n), A, b, b, lvar=np.zeros(n),
        name="syn_overdetermined_eq")

    # nonnegativity vs negative row-sum requirement (lpi_bgprtr spirit)
    rng = _rng(seed + 2)
    n = 10
    A = np.abs(rng.normal(size=(3, n)))
    lcon = np.full(3, -INF)
    ucon = np.full(3, -1.0)     # sum of nonnegatives <= -1: empty
    out["syn_sign_conflict"] = lp_spec(
        np.ones(n), A, lcon, ucon, lvar=np.zeros(n), name="syn_sign_conflict")

    # feasible LP pushed infeasible by the range shift (infeas.jl mechanism)
    base = feasible_suite(seed=seed + 3)["afiro_like"]
    shifted = perturb_infeasible(base, scale=25.0)
    shifted.name = "syn_shifted_afiro"
    out["syn_shifted_afiro"] = shifted
    return out
