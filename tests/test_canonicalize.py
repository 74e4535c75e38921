"""Canonicalizer unit tests (reference: Class_cutest.jl behaviors)."""

import jax.numpy as jnp
import numpy as np
import pytest

from onephase_tpu.nlp import NLPSpec, canonicalize

INF = np.inf


def test_row_ordering_and_values():
    # rows: [c-l | u-c | x-lv | uv-x] (Class_cutest.jl:385-420)
    spec = NLPSpec(
        f=lambda x: x[0],
        c=lambda x: jnp.stack([x[0] + x[1], x[0] - x[1]]),
        lcon=[1.0, -INF], ucon=[2.0, 3.0],
        lvar=[0.0, -INF], uvar=[INF, 5.0],
        x0=[0.5, 0.5])
    nlp = canonicalize(spec)
    assert nlp.m == 1 + 2 + 1 + 1  # l-rows: c0; u-rows: c0,c1; lv: x0; uv: x1
    x = jnp.asarray([0.5, 0.25])
    a = np.asarray(nlp.a_of(x))
    c0, c1 = 0.75, 0.25
    np.testing.assert_allclose(
        a, [c0 - 1.0, 2.0 - c0, 3.0 - c1, 0.5 - 0.0, 5.0 - 0.25], atol=1e-14)


def test_fixed_variable_elimination():
    spec = NLPSpec(
        f=lambda x: x[0] ** 2 + x[1] ** 2 + x[2] ** 2,
        c=lambda x: jnp.stack([x[0] + x[1] + x[2]]),
        lcon=[1.0], ucon=[INF],
        lvar=[-1.0, 2.5, -1.0], uvar=[1.0, 2.5, 1.0],   # x1 fixed at 2.5
        x0=[0.0, 2.5, 0.0])
    nlp = canonicalize(spec)
    assert nlp.n == 2
    x = jnp.asarray([0.3, -0.2])
    # oracle must see the fixed value
    c = np.asarray(nlp.c(x))
    np.testing.assert_allclose(c, [0.3 + 2.5 - 0.2], atol=1e-14)
    g = np.asarray(nlp.grad_f(x))
    np.testing.assert_allclose(g, [0.6, -0.4], atol=1e-14)


def test_bounds_too_close_rejected():
    with pytest.raises(ValueError, match="too close"):
        canonicalize(NLPSpec(
            f=lambda x: x[0], c=lambda x: x[:1],
            lcon=[0.0], ucon=[INF],
            lvar=[0.0, 0.0], uvar=[1.0, 5e-9], x0=[0.0, 0.0]))


def test_unconstrained_rejected():
    with pytest.raises(ValueError, match="Unconstrained"):
        canonicalize(NLPSpec(f=lambda x: x[0] ** 2, x0=[1.0]))


def test_masks():
    spec = NLPSpec(
        f=lambda x: x[0],
        c=lambda x: jnp.stack([x[0] + x[1], x[0] * x[1]]),
        lcon=[1.0, 2.0], ucon=[1.0, INF],
        lvar=[0.0, -INF], uvar=[INF, INF],
        x0=[0.0, 0.0], lin=(0,))
    nlp = canonicalize(spec)
    # rows: l-rows [c0, c1], u-rows [c0], bounds [x0]
    np.testing.assert_array_equal(nlp.lin_mask, [True, False, True, True])
    np.testing.assert_array_equal(nlp.eqbound_mask, [True, False, True, True])
