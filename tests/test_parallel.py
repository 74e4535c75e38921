"""Batch + mesh-sharding tests (8 virtual CPU devices, conftest.py).

No reference counterpart (SURVEY.md §2.4: parallelism is an additive
capability); these are the multi-device tests the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu.config import Params
from onephase_tpu.ipm.state import OPTIMAL, RUNNING
from onephase_tpu.models import zoo
from onephase_tpu.models.tax import tax1d
from onephase_tpu.nlp import canonicalize
from onephase_tpu.parallel.batch import BatchSolver
from onephase_tpu.parallel.mesh import ShardedBatchSolver, make_mesh


def _pars():
    return Params().with_overrides({
        "output_level": 0, "term.max_it": 81, "chunk_size": 30,
        "history_capacity": 2})


def test_batch_multistart_matches_single():
    nlp = canonicalize(zoo.starting_point_prob(0.5))
    solver = BatchSolver(nlp, _pars())
    x0s = np.array([[0.5], [-0.5], [0.9], [-0.9]])
    st = solver.solve(x0s)
    stats = solver.statuses(st)
    assert all(s == "Optimal" for s in stats)
    xs = np.asarray(st.p.x)[:, 0]
    # every start converges to one of the two local optima |x| = 1
    assert np.all(np.abs(np.abs(xs) - 1.0) < 1e-3)


def test_batch_mixed_termination():
    """Instances finishing at different iterations are masked correctly."""
    nlp = canonicalize(zoo.circle_nc2())
    solver = BatchSolver(nlp, _pars())
    x0s = np.array([[1.0, 1.0], [0.3, 2.0], [-1.5, 0.2], [2.0, -2.0]])
    st = solver.solve(x0s)
    assert all(s == "Optimal" for s in solver.statuses(st))
    ts = np.asarray(st.t)
    assert ts.min() >= 2


def test_sharded_batch_runs_on_mesh():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual devices"
    nlp = canonicalize(tax1d(na=4))
    mesh = make_mesh(8)
    solver = ShardedBatchSolver(nlp, _pars(), mesh=mesh)
    x0s = np.ones((8, nlp.n)) * (1.0 + 0.05 * np.arange(8))[:, None]
    st = solver.init(x0s)
    # the state really is sharded over dp
    shard_devs = {d for d in st.p.x.sharding.device_set}
    assert len(shard_devs) == 8
    st = solver.solve_sharded(st) if hasattr(solver, "solve_sharded") else st
    for _ in range(20):
        if solver.num_running(st) == 0:
            break
        st = solver.run_chunk(st)
    stats = solver.statuses(st)
    assert all(s == "Optimal" for s in stats), stats


def test_sharded_indivisible_batch_rejected():
    nlp = canonicalize(zoo.toy_lp1())
    solver = ShardedBatchSolver(nlp, _pars(), mesh=make_mesh(8))
    with pytest.raises(ValueError, match="not divisible"):
        solver.init(np.zeros((5, nlp.n)))


def test_batched_bound_shift_campaign():
    """The on-device analogue of the perturbed-infeasible campaign
    (infeas.jl): one compiled solver, batch over shifted bound data."""
    from onephase_tpu.models.netlib import feasible_suite
    nlp = canonicalize(feasible_suite(sizes=((12, 16),))["afiro_like"])
    solver = BatchSolver(nlp, Params().with_overrides({
        "output_level": 0, "term.max_it": 200, "chunk_size": 50,
        "history_capacity": 2}))
    shifts = jnp.asarray([0.0, 25.0, 30.0])
    bvals = jax.vmap(nlp.shifted_bvals)(shifts)
    st = solver.solve(np.tile(nlp.x0, (3, 1)), bvals)
    stats = solver.statuses(st)
    assert stats[0] == "Optimal"
    assert stats[1] == "primal_infeasible"
    assert stats[2] == "primal_infeasible"
