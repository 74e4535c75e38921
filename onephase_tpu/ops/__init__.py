"""Kernel library. Set INTERPRET=True to run all Pallas kernels in
interpreter mode (CPU testing without a TPU)."""

INTERPRET = False


def interpret_mode():
    return INTERPRET
