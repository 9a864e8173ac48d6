"""Multi-chip sharding for AGBNP MD: replica data parallelism + atom-sharded
pair phases.

The reference is strictly single-device (multiple OpenCL contexts are
rejected, reference OpenCLAGBNPKernels.cpp:412-413); its parallel dimension
is intra-GPU work-groups.  On TPU the natural scale-out axes are:

  * `replica`: independent MD replicas (free-energy / ensemble workflows,
    BASELINE config 5) — pure data parallelism over ICI via vmap + sharded
    batch dimension.
  * `atoms`: the O(N^2) pair phases (Born radii / GB / descreening) sharded
    over screened-atom rows via shard_map; each device computes the partial
    sums over its row block against all screeners, with a psum only where a
    per-screener reduction (W/U accumulators, j-side forces) is needed.

Both are expressed with jax.sharding.Mesh + NamedSharding/shard_map so XLA
inserts the collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replica_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devices), axis_names=("replica",))


def make_replica_ensemble_step(step_fn, mesh: Mesh):
    """Shard a per-replica MD step over the `replica` mesh axis.

    step_fn(state_pytree) -> state_pytree for one replica; states are stacked
    on a leading replica axis and sharded across devices.
    """
    vstep = jax.vmap(step_fn)

    def sharded(tree_axis0_spec):
        return NamedSharding(mesh, tree_axis0_spec)

    rep = NamedSharding(mesh, P("replica"))

    @partial(jax.jit,
             in_shardings=(rep,),
             out_shardings=rep)
    def run(states):
        return vstep(states)

    return run


def atom_sharded_born_sums(mesh: Mesh, axis: str = "replica"):
    """Row-sharded inverse-Born-radius partial sums with a psum reduction.

    Demonstrator of the atoms-axis decomposition: rows (screened atoms) are
    sharded; each device holds its row block of the pair Q matrix and the
    full screener arrays, computes row sums locally (no collective), and the
    screener-side W/U-style column sums with a psum over the mesh axis.
    """

    shard_map = jax.shard_map

    def kernel(q_block, s_factor, brw_block):
        # row sums: local
        row = jnp.sum(q_block * s_factor[None, :], axis=1)
        # column sums: need contributions from all row blocks
        col = jax.lax.psum(jnp.sum(brw_block[:, None] * q_block, axis=0),
                           axis_name=axis)
        return row, col

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis, None), P(None), P(axis)),
        out_specs=(P(axis), P(None)),
    )
