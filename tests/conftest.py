"""Test configuration: force CPU platform with 8 virtual devices + f64.

The environment pins JAX_PLATFORMS=axon via sitecustomize, so we must
override through the config API (env vars are ignored once the axon plugin
registers).  8 virtual CPU devices let sharding tests run without a TPU pod
(SURVEY.md §4 test plan).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

from onephase_tpu.config import Params  # noqa: E402


@pytest.fixture
def base_pars():
    """Reference test options (test/runtests.jl:150-160): max_it=81, quiet."""
    return Params().with_overrides({
        "term!max_it": 81,
        "a_norm_penalty": 1e-4,
        "output_level": 0,
    })
