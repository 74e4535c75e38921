"""MPS reader/writer unit tests (VERDICT r3 item 5).

The reader (models/lp.read_mps_data) is the real-Netlib ingestion path
(reference benchmark/Netlib/run_netlib.jl:4-66); these tests pin the MPS
corner cases the synthetic campaigns never hit: RANGES on E rows (both
signs), negative RANGES on L rows, FR/MI/BV bounds, UP with a negative
value and no LO, objective-row RHS constants — plus a full write->read
round-trip on random LPData.
"""
import numpy as np
import pytest

from onephase_tpu.models.lp import LPData, read_mps_data, write_mps

INF = np.inf


def _read_str(tmp_path, text, name="t"):
    p = tmp_path / f"{name}.mps"
    p.write_text(text)
    return read_mps_data(str(p))


HEADER = """NAME test
ROWS
 N  COST
 {rows}
COLUMNS
{cols}
RHS
{rhs}
{extra}ENDATA
"""


def test_ranges_on_e_row_positive(tmp_path):
    # E row + positive range r: lcon = b, ucon = b + r
    txt = HEADER.format(
        rows="E  R1",
        cols="    X  COST  1.0\n    X  R1  2.0",
        rhs="    RHS  R1  4.0",
        extra="RANGES\n    RNG  R1  3.0\n")
    d = _read_str(tmp_path, txt)
    assert d.lcon[0] == 4.0 and d.ucon[0] == 7.0


def test_ranges_on_e_row_negative(tmp_path):
    # E row + negative range r: lcon = b + r, ucon = b
    txt = HEADER.format(
        rows="E  R1",
        cols="    X  COST  1.0\n    X  R1  2.0",
        rhs="    RHS  R1  4.0",
        extra="RANGES\n    RNG  R1  -3.0\n")
    d = _read_str(tmp_path, txt)
    assert d.lcon[0] == 1.0 and d.ucon[0] == 4.0


def test_ranges_on_l_and_g_rows_negative(tmp_path):
    # L row: lcon = b - |r| regardless of range sign; G row: ucon = b + |r|
    txt = HEADER.format(
        rows="L  R1\n G  R2",
        cols="    X  COST  1.0\n    X  R1  1.0  R2  1.0",
        rhs="    RHS  R1  5.0  R2  2.0",
        extra="RANGES\n    RNG  R1  -3.0  R2  -4.0\n")
    d = _read_str(tmp_path, txt)
    assert d.lcon[0] == 2.0 and d.ucon[0] == 5.0
    assert d.lcon[1] == 2.0 and d.ucon[1] == 6.0


def test_bounds_fr_mi_bv_up_negative(tmp_path):
    txt = HEADER.format(
        rows="L  R1",
        cols="\n".join(f"    X{j}  COST  1.0\n    X{j}  R1  1.0"
                       for j in range(5)),
        rhs="    RHS  R1  5.0",
        extra=("BOUNDS\n"
               " FR BND  X0\n"
               " MI BND  X1\n"
               " UP BND  X1  3.0\n"
               " BV BND  X2\n"
               " UP BND  X3  -2.0\n"       # negative UP, no LO: lo -> -inf
               " LO BND  X4  1.5\n"
               " UP BND  X4  2.5\n"))
    d = _read_str(tmp_path, txt)
    assert d.lvar[0] == -INF and d.uvar[0] == INF          # FR
    assert d.lvar[1] == -INF and d.uvar[1] == 3.0          # MI + UP
    assert d.lvar[2] == 0.0 and d.uvar[2] == 1.0           # BV
    assert d.lvar[3] == -INF and d.uvar[3] == -2.0         # UP < 0, no LO
    assert d.lvar[4] == 1.5 and d.uvar[4] == 2.5           # LO + UP


def test_objective_constant_and_fixed_var(tmp_path):
    txt = HEADER.format(
        rows="G  R1",
        cols="    X  COST  2.0\n    X  R1  1.0",
        rhs="    RHS  COST  3.0\n    RHS  R1  1.0",
        extra="BOUNDS\n FX BND  X  4.0\n")
    d = _read_str(tmp_path, txt)
    assert d.c0 == -3.0                                     # obj-row RHS
    assert d.lvar[0] == 4.0 and d.uvar[0] == 4.0
    assert d.lcon[0] == 1.0 and d.ucon[0] == INF


def test_objsense_max_inline_and_section(tmp_path):
    # OBJSENSE appears inline ("OBJSENSE MAX") and as a section header with
    # the sense on the next indented line; both negate cvec/c0 to min-form.
    body = HEADER.format(
        rows="L  R1",
        cols="    X  COST  2.0\n    X  R1  1.0",
        rhs="    RHS  COST  3.0\n    RHS  R1  5.0",
        extra="")
    for sense_block in ("OBJSENSE MAX\n", "OBJSENSE\n    MAXIMIZE\n"):
        d = _read_str(tmp_path, sense_block + body, name="mx")
        assert d.objsense == "max"
        assert d.cvec[0] == -2.0 and d.c0 == 3.0
    d = _read_str(tmp_path, "OBJSENSE\n    MIN\n" + body, name="mn")
    assert d.objsense == "min" and d.cvec[0] == 2.0 and d.c0 == -3.0


def test_omitted_set_names_rhs_ranges_bounds(tmp_path):
    # Real archives sometimes omit the RHS/RANGES/BOUNDS set-name column:
    # "    R1  4.0" instead of "    RHS  R1  4.0" (even token count), and
    # " UP  X  3.0" / " FR  X" in BOUNDS.
    txt = HEADER.format(
        rows="L  R1\n G  R2",
        cols="    X  COST  1.0\n    X  R1  2.0  R2  1.0\n"
             "    Y  R1  1.0  R2  1.0",
        rhs="    R1  4.0  R2  1.0",
        extra=("RANGES\n    R1  3.0\n"
               "BOUNDS\n UP  X  3.0\n FR  Y\n"))
    d = _read_str(tmp_path, txt)
    assert d.ucon[0] == 4.0 and d.lcon[0] == 1.0       # RHS + RANGES, no set
    assert d.lcon[1] == 1.0
    assert d.uvar[0] == 3.0 and d.lvar[0] == 0.0       # UP without set name
    assert d.lvar[1] == -INF and d.uvar[1] == INF      # FR without set name


def test_shared_column_out_of_order_and_second_n_row(tmp_path):
    # A column split across non-contiguous COLUMNS blocks must accumulate
    # into one column; a second N row is a free row whose entries are
    # dropped (first N row is the objective).
    txt = HEADER.format(
        rows="L  R1",
        cols="    X  COST  1.0\n    X  R1  2.0\n"
             "    Y  R1  1.0\n"
             "    X  FREE  9.0",        # X reappears after Y
        rhs="    RHS  R1  4.0",
        extra="")
    txt = txt.replace(" N  COST\n", " N  COST\n N  FREE\n")
    d = _read_str(tmp_path, txt)
    assert d.n == 2 and d.m == 1
    assert d.A[0, 0] == 2.0 and d.A[0, 1] == 1.0
    assert d.cvec[0] == 1.0 and d.cvec[1] == 0.0


def test_integer_bounds_li_ui(tmp_path):
    txt = HEADER.format(
        rows="L  R1",
        cols="    X  COST  1.0\n    X  R1  1.0",
        rhs="    RHS  R1  5.0",
        extra="BOUNDS\n LI BND  X  1.0\n UI BND  X  4.0\n")
    d = _read_str(tmp_path, txt)
    assert d.lvar[0] == 1.0 and d.uvar[0] == 4.0


def test_roundtrip_random(tmp_path):
    rng = np.random.default_rng(0)
    m, n = 13, 9
    A = np.round(rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.5), 4)
    A[np.all(A == 0.0, axis=1), 0] = 1.0
    lcon = np.full(m, -INF)
    ucon = np.full(m, INF)
    for i in range(m):
        k = i % 4
        if k == 0:
            lcon[i] = ucon[i] = rng.normal()               # E
        elif k == 1:
            ucon[i] = rng.normal()                          # L
        elif k == 2:
            lcon[i] = rng.normal()                          # G
        else:
            lo = rng.normal()
            lcon[i], ucon[i] = lo, lo + abs(rng.normal())   # ranged
    lvar = np.where(rng.random(n) < 0.3, -INF, np.round(rng.normal(size=n), 3))
    uvar = np.where(rng.random(n) < 0.3, INF,
                    np.abs(np.round(rng.normal(size=n), 3)) + 5.0)
    lvar = np.minimum(lvar, uvar)
    d = LPData(cvec=np.round(rng.normal(size=n), 4), A=A, lcon=lcon,
               ucon=ucon, lvar=lvar, uvar=uvar, name="rt", c0=1.25)
    path = str(tmp_path / "rt.mps")
    write_mps(d, path)
    d2 = read_mps_data(path)
    np.testing.assert_allclose(d2.A, d.A, atol=0)
    np.testing.assert_allclose(d2.cvec, d.cvec, atol=0)
    np.testing.assert_allclose(d2.lcon, d.lcon, atol=1e-15)
    np.testing.assert_allclose(d2.ucon, d.ucon, atol=1e-15)
    np.testing.assert_allclose(d2.lvar, d.lvar, atol=0)
    np.testing.assert_allclose(d2.uvar, d.uvar, atol=0)
    assert d2.c0 == d.c0


def test_roundtrip_gzip_and_free_row_rejected(tmp_path):
    d = LPData(cvec=np.array([1.0]), A=np.array([[2.0]]),
               lcon=np.array([0.0]), ucon=np.array([5.0]),
               lvar=np.array([0.0]), uvar=np.array([INF]), name="gz")
    path = str(tmp_path / "gz.mps.gz")
    write_mps(d, path)
    d2 = read_mps_data(path)
    assert d2.lcon[0] == 0.0 and d2.ucon[0] == 5.0
    bad = LPData(cvec=np.array([1.0]), A=np.array([[1.0]]),
                 lcon=np.array([-INF]), ucon=np.array([INF]),
                 lvar=np.array([0.0]), uvar=np.array([1.0]), name="bad")
    with pytest.raises(ValueError):
        write_mps(bad, str(tmp_path / "bad.mps"))


def test_roundtrip_solve_status(tmp_path):
    # a tiny feasible LP and its infeasible twin written to disk, read back,
    # and solved: statuses must survive the file round-trip
    import jax.numpy as jnp

    from onephase_tpu.config import Params
    from onephase_tpu.models.netlib import mixed_suite
    from onephase_tpu.parallel.buckets import solve_bucketed

    probs = mixed_suite(n_pairs=1, max_n=600)
    for name, d in probs.items():
        write_mps(d, str(tmp_path / f"{name}.mps"))
    loaded = {}
    for name in probs:
        loaded[name] = read_mps_data(str(tmp_path / f"{name}.mps"))
    pars = Params().with_overrides({
        "output_level": 0, "term.max_it": 120, "term.tol_opt": 1e-6,
        "chunk_size": 30})
    res = solve_bucketed(loaded, pars, round_to=64, dtype=jnp.float64)
    for name in probs:
        want = "Optimal" if name.endswith("_feas") else "primal_infeasible"
        assert res[name].status == want, (name, res[name].status)
