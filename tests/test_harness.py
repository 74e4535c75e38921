"""Harness + model-family tests (reference H2/H3/H7 behaviors)."""

import json
import os

import numpy as np
import pytest

from onephase_tpu import one_phase_solve
from onephase_tpu.harness import run_problems, compare_to_reference
from onephase_tpu.models import examples, netlib
from onephase_tpu.models.lp import lp_spec, perturb_infeasible, read_mps


def test_infeasible_suite(base_pars):
    probs = netlib.infeasible_suite()
    pars = base_pars.with_overrides({"term!max_it": 200})
    for name in ("syn_parallel_conflict", "syn_overdetermined_eq",
                 "syn_sign_conflict"):
        r = one_phase_solve(probs[name], pars)
        assert r.status == "primal_infeasible", name


def test_feasible_suite_smoke(base_pars):
    probs = netlib.feasible_suite(sizes=((12, 16),))
    pars = base_pars.with_overrides({"term!max_it": 200})
    r = one_phase_solve(probs["afiro_like"], pars)
    assert r.status == "Optimal"
    assert r.max_violation < 1e-6


def test_harness_resume_and_csv(tmp_path, base_pars):
    from onephase_tpu.models import zoo
    probs = {"lp1": zoo.toy_lp1(), "inf1": zoo.toy_lp_inf1()}
    s1 = run_problems(probs, "campaign", pars=base_pars,
                      out_root=str(tmp_path))
    assert s1["lp1"].status == "optimal"
    assert s1["inf1"].status == "primal_infeasible"
    csv_path = tmp_path / "campaign" / "summary.csv"
    lines = csv_path.read_text().strip().split("\n")
    assert lines[0] == "name,it,time,fval,con,status"
    assert len(lines) == 3
    # resume: nothing re-runs, summary unchanged
    s2 = run_problems(probs, "campaign", pars=base_pars,
                      out_root=str(tmp_path))
    assert {k: v.status for k, v in s2.items()} == \
        {k: v.status for k, v in s1.items()}
    # logs + history snapshots exist
    assert (tmp_path / "campaign" / "log" / "lp1.txt").exists()
    assert (tmp_path / "campaign" / "hist" / "lp1.json").exists()
    assert (tmp_path / "campaign" / "par.txt").exists()


def test_multihost_campaign_shard_and_merge(tmp_path, base_pars):
    """Two simulated hosts each solve their round-robin shard; the last
    one to finish merges the campaign summary (shared-filesystem
    semantics, reference SLURM-array + resume-by-skip)."""
    from onephase_tpu.harness import run_problems_multihost
    from onephase_tpu.models import zoo
    probs = {"lp1": zoo.toy_lp1(), "inf1": zoo.toy_lp_inf1(),
             "lp2": zoo.toy_lp2()}
    # host 0 finishes first: merge must report "still waiting" (None)
    out0 = run_problems_multihost(probs, "mh", pars=base_pars,
                                  out_root=str(tmp_path),
                                  process_index=0, process_count=2)
    assert out0 is None
    # host 1 finishes last and performs the merge
    merged = run_problems_multihost(probs, "mh", pars=base_pars,
                                    out_root=str(tmp_path),
                                    process_index=1, process_count=2)
    assert set(merged) == set(probs)
    assert merged["lp1"].status == "optimal"
    assert merged["inf1"].status == "primal_infeasible"
    csv_lines = (tmp_path / "mh" / "summary.csv").read_text().strip().split("\n")
    assert len(csv_lines) == 4
    # per-host shards are disjoint and complete
    h0 = json.load(open(tmp_path / "mh" / "host0" / "summary.json"))
    h1 = json.load(open(tmp_path / "mh" / "host1" / "summary.json"))
    assert set(h0).isdisjoint(h1) and set(h0) | set(h1) == set(probs)


def test_multihost_empty_shard_still_merges(tmp_path, base_pars):
    """process_count > #problems: a host with an EMPTY round-robin shard
    must still write its summary.json up front, or the merge scan waits
    forever (ADVICE r2 medium fix)."""
    from onephase_tpu.harness import run_problems_multihost
    from onephase_tpu.models import zoo
    probs = {"lp1": zoo.toy_lp1(), "lp2": zoo.toy_lp2()}
    outs = []
    for pi in range(3):          # 3 hosts, 2 problems: host 2's shard empty
        outs.append(run_problems_multihost(
            probs, "mh_empty", pars=base_pars, out_root=str(tmp_path),
            process_index=pi, process_count=3))
    merged = next(o for o in outs if o is not None)
    assert set(merged) == set(probs)
    # the empty shard produced its (empty) summary file
    h2 = json.load(open(tmp_path / "mh_empty" / "host2" / "summary.json"))
    assert h2 == {}


def test_compare_to_reference(tmp_path, base_pars):
    from onephase_tpu.models import zoo
    ref_csv = tmp_path / "ref.csv"
    ref_csv.write_text("name,it,time,fval,con,status\n"
                       "lp1,7,0.1,-100.0,0.0,optimal\n")
    s = run_problems({"lp1": zoo.toy_lp1()}, "cmp", pars=base_pars,
                     out_root=str(tmp_path))
    rep = compare_to_reference(s, str(ref_csv))
    assert rep["lp1"]["status_match"]


def test_mps_roundtrip(tmp_path):
    mps = """NAME          TESTLP
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1        COST         1.0   LIM1         1.0
    X1        LIM2         1.0
    X2        COST         2.0   LIM1         1.0
    X2        MYEQN       -1.0
    X3        COST        -1.0   MYEQN        1.0
RHS
    RHS       LIM1         4.0   LIM2         1.0
    RHS       MYEQN        7.0
BOUNDS
 UP BND       X1           4.0
 LO BND       X2          -1.0
ENDATA
"""
    path = tmp_path / "test.mps"
    path.write_text(mps)
    spec = read_mps(str(path))
    assert spec.name == "TESTLP"
    assert spec.lcon.tolist() == [-np.inf, 1.0, 7.0]
    assert spec.ucon.tolist() == [4.0, np.inf, 7.0]
    assert spec.lvar.tolist() == [0.0, -1.0, 0.0]
    assert spec.uvar[0] == 4.0
    # solve it: min x1 + 2 x2 - x3 s.t. x1+x2<=4, x1>=1, -x2+x3=7
    r = one_phase_solve(spec, options={"output_level": 0})
    assert r.status == "Optimal"
    # x3 = 7 + x2; obj = x1 + 2x2 - 7 - x2 = x1 + x2 - 7 -> x1=1, x2=-1
    assert abs(r.obj - (1.0 - 1.0 - 7.0 + 1.0 * 0)) < 1e-3 or r.obj < -6.9


def test_perturb_infeasible():
    spec = lp_spec([1.0], [[1.0]], [0.0], [0.0], lvar=[0.0], uvar=[1.0])
    shifted = perturb_infeasible(spec, scale=2.0)
    assert shifted.lcon[0] == -2.0 and shifted.ucon[0] == -2.0
    r = one_phase_solve(shifted, options={"output_level": 0})
    assert r.status == "primal_infeasible"   # x = -2 violates x >= 0


@pytest.mark.parametrize("family,kwargs,expect", [
    (examples.chain, {"n": 20}, "Optimal"),
    (examples.max_cut, {"n": 12, "r": 3}, "Optimal"),
    (examples.electron, {"np_": 6}, "Optimal"),
])
def test_example_families(family, kwargs, expect, base_pars):
    pars = base_pars.with_overrides({"term!max_it": 300})
    r = one_phase_solve(family(**kwargs), pars)
    assert r.status == expect
    assert r.max_violation < 1e-5


def test_checkpoint_roundtrip(tmp_path, base_pars):
    from onephase_tpu.models import zoo
    from onephase_tpu.nlp import canonicalize
    from onephase_tpu.parallel.batch import BatchSolver
    from onephase_tpu.parallel.checkpoint import save_state, load_state
    import numpy as np

    solver = BatchSolver(canonicalize(zoo.circle_nc2()),
                         base_pars.with_overrides({"chunk_size": 2,
                                                   "history_capacity": 2}))
    x0s = np.array([[1.0, 1.0], [0.5, 1.5]])
    st = solver.init(x0s)
    st = solver.run_chunk(st)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, st)
    st2 = load_state(path, solver.init(x0s))
    np.testing.assert_array_equal(np.asarray(st.p.x), np.asarray(st2.p.x))
    # resume from the checkpoint and finish
    st3 = solver.run_chunk(st2)
    for _ in range(40):
        import jax.numpy as jnp
        from onephase_tpu.ipm.state import RUNNING
        if not bool(jnp.any(st3.status == RUNNING)):
            break
        st3 = solver.run_chunk(st3)
    assert all(s == "Optimal" for s in solver.statuses(st3))


def test_woodbury_and_mineig():
    import jax.numpy as jnp
    import jax
    from onephase_tpu.ops.woodbury import woodbury_solve, min_eig_inverse_iteration
    rng = np.random.default_rng(0)
    n, k = 12, 3
    A = rng.normal(size=(n, n)); A = A @ A.T + np.eye(n)
    U = rng.normal(size=(n, k)); V = rng.normal(size=(k, n))
    C = np.diag(rng.random(k) + 0.5)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    Lw = jnp.linalg.cholesky(Aj)
    solve_A = lambda v: jax.scipy.linalg.cho_solve((Lw, True), v)
    x = woodbury_solve(solve_A, jnp.asarray(U), jnp.asarray(C),
                       jnp.asarray(V), jnp.asarray(b),
                       matvec_A=lambda v: Aj @ v)
    np.testing.assert_allclose((A + U @ C @ V) @ np.asarray(x), b, atol=1e-8)

    M = A - 3.0 * np.eye(n)
    w = np.linalg.eigvalsh(M)
    Mj = jnp.asarray(M)
    shift = float(w.min()) - 0.5
    Ls = jnp.linalg.cholesky(Mj - shift * jnp.eye(n))
    lam, _ = min_eig_inverse_iteration(
        lambda v: Mj @ v,
        lambda v: jax.scipy.linalg.cho_solve((Ls, True), v), n)
    assert abs(float(lam) - w.min()) < 1e-6


def test_cli_smoke(tmp_path, capsys):
    from onephase_tpu.cli import main
    main(["--problem-set", "netlib_infeasible", "--max-it", "200",
          "--output-level", "0", "--output-dir", str(tmp_path),
          "--test-name", "cli_smoke"])
    out = capsys.readouterr().out
    assert "4 problems" in out
    assert (tmp_path / "cli_smoke" / "summary.csv").exists()
