"""autotune tests (reference src/utils/autotune.jl — fixed here)."""

from onephase_tpu.autotune import autotune
from onephase_tpu.models import zoo


def test_autotune_serial(base_pars):
    ok, best_it, best_scale = autotune(zoo.circle_nc1(), base_pars,
                                       exponents=range(-1, 2))
    assert ok and best_it > 0 and best_scale > 0


def test_autotune_batched(base_pars):
    ok, best_it, best_scale = autotune(zoo.circle_nc1(), base_pars,
                                       exponents=range(-1, 2), parallel=True)
    assert ok and best_it > 0 and best_scale > 0
