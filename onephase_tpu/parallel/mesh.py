"""Device-mesh sharding of batched solves.

TPU-first capability (SURVEY.md §2.4, no reference counterpart): the batch
axis of a `BatchSolver` is sharded over a `jax.sharding.Mesh`; XLA inserts
any needed collectives over ICI/DCN.  Multi-host initialization goes through
`jax.distributed` (distributed_init below).

Mesh axes:
- "dp": data parallel over problem instances (the SLURM-array replacement)
- "blk": reserved for block-angular scenario Schur sharding (ECON/Tax models)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Params
from ..ipm.core import OnePhaseKernel
from ..ipm.state import RUNNING, State
from ..nlp import CanonNLP
from .batch import BatchSolver


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up via jax.distributed (no-op when single-host)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


class ShardedBatchSolver(BatchSolver):
    """BatchSolver whose batch axis is sharded over a device mesh.

    The whole batched `State` pytree carries a leading batch dimension;
    every leaf is sharded on that dimension (`PartitionSpec('dp', ...)`).
    Each device runs its shard's full IPM loop; no cross-instance
    communication is needed until harness-level reductions, which XLA
    lowers to `psum`-style collectives over ICI.
    """

    def __init__(self, nlp: CanonNLP, pars: Optional[Params] = None,
                 mesh: Optional[Mesh] = None):
        super().__init__(nlp, pars)
        self.mesh = mesh or make_mesh()

        def shard_leaf(x):
            spec = P("dp", *([None] * (x.ndim - 1)))
            return NamedSharding(self.mesh, spec)

        self._shard_leaf = shard_leaf
        self._run_pinned = None

    def shard_state(self, st: State) -> State:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._shard_leaf(x)), st)

    def init(self, x0s, bvals=None, pdata=None) -> State:
        x0s = jnp.asarray(x0s, self.kernel.dtype)
        b = x0s.shape[0]
        n_dev = len(self.mesh.devices.flat)
        if b % n_dev != 0:
            raise ValueError(f"batch {b} not divisible by mesh size {n_dev}")

        def put(x):
            x = jnp.asarray(x)
            return jax.device_put(x, NamedSharding(
                self.mesh, P("dp", *([None] * (x.ndim - 1)))))

        x0s = put(x0s)
        if bvals is not None:
            bvals = jax.tree_util.tree_map(put, bvals)
        if pdata is not None:
            pdata = jax.tree_util.tree_map(put, pdata)
        # Pin EVERY state leaf to the 'dp' sharding.  The init program only
        # receives sharded x0s, so XLA marks the leaves it creates from
        # broadcast constants (dir/filt/counters) as replicated; run_chunk
        # then emits those same leaves 'dp'-sharded, and the signature
        # change forced a SECOND full compile on the next run_chunk call —
        # measured as the "22x sharding overhead" in the r4 scaling table
        # (chunk walls 15.8s / 10.1s / 0.049s / 0.004s on the 2-device CPU
        # mesh; see results/scaling_efficiency.md).  One device_put pass
        # here makes every run_chunk call hit the same executable.
        return self.shard_state(BatchSolver.init(self, x0s, bvals, pdata))

    def run_chunk(self, st: State) -> State:
        # Pin in/out shardings so every chunk call hits ONE executable.
        # Left to GSPMD, leaves that are constant through the chunk come
        # back replicated while the rest come back 'dp'-sharded; the
        # signature flip between consecutive calls forced a second full
        # compile inside the solve loop (the r4 "22x sharding overhead").
        if self._run_pinned is None:
            sh = jax.tree_util.tree_map(self._shard_leaf, st)
            self._run_pinned = jax.jit(
                jax.vmap(self.kernel._run_chunk),
                in_shardings=(sh,), out_shardings=sh)
        return self._run_pinned(st)

    def num_running(self, st: State) -> int:
        # cross-device reduction (lowers to a psum over ICI)
        return int(jnp.sum(st.status == RUNNING))
