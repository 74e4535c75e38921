"""Modeling front-end tests (reference tier-3: test_moi_nlp_solver.jl +
JuMP-built models in test/problems.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu.model import Model


OPTS = {"output_level": 0, "term!max_it": 81}


def test_linear_model():
    m = Model(options=dict(OPTS))
    x = m.add_variable(lb=0.0, ub=1.0, name="x")
    y = m.add_variable(lb=0.0, ub=1.0, name="y")
    m.add_linear_constraint({x: 1.0, y: 1.0}, lb=1.0, ub=2.0)
    m.set_objective({x: 1.0})
    m.optimize()
    assert m.termination_status == "LOCALLY_SOLVED"
    assert abs(m.value(x)) < 1e-3
    assert abs(m.value(y) - 1.0) < 1e-3
    assert m.objective_value < 1e-3


def test_maximize_and_quadratic_constraint():
    m = Model(options=dict(OPTS))
    x = m.add_variable(lb=0.0)
    y = m.add_variable(lb=0.0)
    m.add_quadratic_constraint([(x, x, 1.0), (y, y, 1.0)], ub=1.0)
    m.maximize(lambda v: v[0] + v[1])
    m.optimize()
    assert m.termination_status == "LOCALLY_SOLVED"
    s = np.sqrt(0.5)
    assert abs(m.value(x) - s) < 1e-3 and abs(m.value(y) - s) < 1e-3
    assert abs(m.objective_value - 2 * s) < 1e-3


def test_nonlinear_constraint_and_fixed_var():
    m = Model(options=dict(OPTS))
    x = m.add_variable(start=1.0)
    y = m.add_variable(start=1.0)
    z = m.add_variable()
    m.fix_variable(z, 3.0)
    m.add_nonlinear_constraint(lambda v: v[0] ** 2 + v[1] ** 2, lb=1.0, ub=1.0)
    m.minimize(lambda v: v[0] + 0.0 * v[2])
    m.optimize()
    assert m.termination_status == "LOCALLY_SOLVED"
    assert abs(m.value(x) + 1.0) < 1e-3
    assert m.value(z) == 3.0


def test_infeasible_status_mapping():
    m = Model(options=dict(OPTS))
    x = m.add_variable(lb=0.0)
    y = m.add_variable(lb=0.0)
    m.add_linear_constraint({x: 1.0, y: 2.0}, ub=-1.0)
    m.set_objective({x: 1.0, y: 100.0})
    m.optimize()
    assert m.termination_status == "INFEASIBLE"


def test_duals_sign_lp():
    # min x s.t. x >= 4 (toy_lp0): lambda = 1 at optimum, rc = 0
    m = Model(options=dict(OPTS))
    x = m.add_variable()
    m.add_linear_constraint({x: 1.0}, lb=4.0)
    m.set_objective({x: 1.0})
    m.optimize()
    assert abs(m.dual(0) - 1.0) < 1e-4
    assert abs(m.value(x) - 4.0) < 1e-3


def test_iteration_limit_status():
    m = Model(options={"output_level": 0, "term!max_it": 1})
    x = m.add_variable(lb=0.0, start=5.0)
    m.add_nonlinear_constraint(lambda v: (v[0] - 2.0) ** 4, ub=10.0)
    m.minimize(lambda v: (v[0] - 2.0) ** 2)
    m.optimize()
    assert m.termination_status in ("ITERATION_LIMIT", "LOCALLY_SOLVED")
