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


def atom_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devices), axis_names=("atoms",))


def sharded_pair_phases(mesh: Mesh, a: dict, ntypes_j: int, cutoff=None,
                        box=None, axis: str = "atoms"):
    """The real AGBNP1 pair phases (Born radii -> GB -> vdW -> descreening)
    sharded over screened-atom rows via shard_map.

    Each device owns a contiguous row block and the replicated screener
    arrays; the only collectives are one all_gather (Born radii, needed by
    the GB pair term) and psums for the scalar energies, the screener-side
    W/U accumulators, and the screener-reaction forces — this is the
    multi-chip decomposition of the reference's warp-tile sweeps
    (AGBNPBornRadii.cl:181-490, AGBNPGBEnergy.cl:58-383).

    `a` is the prepare_arrays dict.  Returns fn(pos, s_factor) -> dict with
    the same fields the dense single-device path produces (gb_self, gb_pair,
    e_vdw, born_radius [N], pair_force [N, 3], evdw_der_W, egb_der_U), equal
    to it to float64 roundoff.
    """
    from ..ops import born as B

    ndev = mesh.shape[axis]
    n = int(np.asarray(a["charge"]).shape[0])
    npad = -(-n // ndev) * ndev
    pad = npad - n

    def padded(x, fill=0.0):
        return jnp.pad(jnp.asarray(x), (0, pad), constant_values=fill)

    def kernel(pos_blk, row_blk, radii_blk, ti_blk, ch_blk, al_blk,
               pos, s_factor, ish, tj, yflat, y2flat, charge):
        psum = partial(jax.lax.psum, axis_name=axis)
        gather = partial(jax.lax.all_gather, axis_name=axis, tiled=True)
        return B.pair_phases_rows(
            pos_blk, row_blk, pos, radii_blk, s_factor, ish, ti_blk, tj,
            yflat, y2flat, ntypes_j, ch_blk, charge, al_blk, cutoff=cutoff,
            box=box, psum=psum, all_gather=gather)

    smapped = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P(), P(), P(), P(), P()),
        out_specs=dict(gb_self=P(), gb_pair=P(), e_vdw=P(),
                       born_radius=P(axis), row_force=P(axis),
                       col_force=P(), evdw_der_W=P(), egb_der_U=P()),
    )

    def fn(pos, s_factor):
        dt = pos.dtype
        # padded rows sit far away with zero charge/alpha and never screen
        # (ishydrogen=1, s_factor=0), so every padded contribution is zero
        far = 1e3 * (1.0 + 0.618 * jnp.arange(pad, dtype=dt))
        pos_p = jnp.concatenate(
            [pos, jnp.stack([far, far, far], axis=-1)], axis=0)
        out = smapped(
            pos_p, jnp.arange(npad, dtype=jnp.int32),
            padded(a["radii_vdw"], 0.1).astype(dt),
            padded(a["type_i"]).astype(jnp.int32),
            padded(a["charge"]).astype(dt), padded(a["alpha"]).astype(dt),
            pos, jnp.asarray(s_factor, dt),
            jnp.asarray(a["ishydrogen"], jnp.int32),
            jnp.asarray(a["type_j"], jnp.int32),
            jnp.asarray(a["yflat"], dt), jnp.asarray(a["y2flat"], dt),
            jnp.asarray(a["charge"], dt))
        return dict(gb_self=out["gb_self"], gb_pair=out["gb_pair"],
                    e_vdw=out["e_vdw"], born_radius=out["born_radius"][:n],
                    pair_force=out["row_force"][:n] + out["col_force"],
                    evdw_der_W=out["evdw_der_W"], egb_der_U=out["egb_der_U"])

    return fn
