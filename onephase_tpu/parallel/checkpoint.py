"""Device-state checkpoint/resume for long batched campaigns.

The reference only has harness-level resume (skip problems already in
summary.jld, run_cutest.jl:116-134) — kept in harness.py.  This module adds
what SURVEY.md §5 calls for: snapshotting the solver *state pytree* itself
so a large batched run can resume mid-solve (e.g. after preemption on a
shared TPU pod).

States are plain pytrees of arrays; .npz keeps this dependency-free and
host-readable.  Sharded states are gathered on save and re-sharded by the
caller on load (via ShardedBatchSolver.shard_state).
"""

from __future__ import annotations

import numpy as np

import jax


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, n_leaves=len(leaves), **arrays)


def load_state(path: str, like):
    """Load a state saved by save_state; `like` provides the treedef/dtypes
    (e.g. a freshly initialized state of the same kernel/batch shape)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = int(data["n_leaves"])
    if n != len(leaves_like):
        raise ValueError(f"checkpoint has {n} leaves, expected "
                         f"{len(leaves_like)} — incompatible kernel/config")
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        if arr.shape != ref.shape:
            raise ValueError(f"leaf {i}: shape {arr.shape} != {ref.shape}")
        leaves.append(jax.numpy.asarray(arr, ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
