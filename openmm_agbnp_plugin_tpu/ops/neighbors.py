"""On-device padded neighbor lists for the tree build and MD loop.

The reference relies on OpenMM's neighbor-list tiles for its 2-body overlap
candidates and pair sweeps (reference GVolOverlapTree.cl:127-313,
OpenCLAGBNPKernels.cpp:3521-3530).  Here the analogue is a fixed-width half
list [N, kmax] rebuilt on device: candidate (i, j>i) pairs within rcut,
heavy atoms only (hydrogen Gaussians carry zero volume and can never form a
surviving overlap, gaussvol.cpp:132), padded with a validity mask and an
overflow indicator (the neighbor-list analogue of the PanicButton).

The tree's 2-body survival criterion implies a hard geometric cutoff:
s(V12) V12 > MIN_GVOL requires V12 > VOLMINA, i.e.
d^2 < ln(v1 v2 (df/pi)^1.5 / VOLMINA) / df; `tree_pair_cutoff` evaluates it
for the worst-case (largest) radii so the list provably misses no overlap.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.constants import KFC, PI, VOLMINA, sphere_volume


def tree_pair_cutoff(radii_large) -> float:
    """Max distance at which a 2-body overlap (largest radii) can survive."""
    rmax = float(np.max(np.asarray(radii_large)))
    v = sphere_volume(rmax)
    a = KFC / (rmax * rmax)
    df = 0.5 * a
    pref = v * v * (df / PI) ** 1.5
    if pref <= VOLMINA:
        return 0.0
    return math.sqrt(math.log(pref / VOLMINA) / df)


def half_neighbor_pairs(pos, heavy_mask, rcut: float, kmax: int):
    """Fixed-width half neighbor list as flat i-major candidate pairs.

    Returns (pairs_i [N*kmax], pairs_j, pairs_valid, max_neighbors).
    Invalid slots have pairs_j == pairs_i (masked out downstream).
    max_neighbors > kmax signals overflow.
    """
    n = pos.shape[0]
    dist = pos[None, :, :] - pos[:, None, :]
    d2 = jnp.sum(dist * dist, axis=-1)
    jj = jnp.arange(n)
    pair_ok = ((jj[None, :] > jj[:, None])
               & (d2 < rcut * rcut)
               & heavy_mask[:, None] & heavy_mask[None, :])
    # ascending-j order with invalid slots pushed to the end; the key IS the
    # neighbor index, so a value sort yields pj directly (no [N, kmax]
    # take_along_axis gather, which dominated the rebuild cost)
    key = jnp.where(pair_ok, jj[None, :], n).astype(jnp.int32)
    pj = jax.lax.sort(key, dimension=1)[:, :kmax]
    valid = pj < n
    pi = jnp.broadcast_to(jj[:, None], (n, kmax))
    pj = jnp.where(valid, pj, pi)
    max_neighbors = jnp.max(jnp.sum(pair_ok, axis=1))
    return (pi.reshape(-1).astype(jnp.int32),
            pj.reshape(-1).astype(jnp.int32),
            valid.reshape(-1),
            max_neighbors)
