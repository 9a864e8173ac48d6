"""Two-particle-average virtual sites (hydration sites).

The reference's Python helper places massless hydration-site particles on a
heavy-atom--hydrogen axis as OpenMM TwoParticleAverageSite virtual sites
(reference python/AGBNPUtils.py:23-35).  The MD-loop equivalents here:

  * project(pos):       pos[site] = w1 pos[p1] + w2 pos[p2]
  * spread(force):      F[p1] += w1 F[site]; F[p2] += w2 F[site]; F[site]=0
  * sites carry zero inverse mass so the integrator never moves them
    directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class VirtualSites:
    site: np.ndarray     # [S] particle indices of the sites
    parent1: np.ndarray  # [S]
    parent2: np.ndarray  # [S]
    w1: np.ndarray       # [S]
    w2: np.ndarray       # [S]

    @staticmethod
    def empty():
        z = np.zeros(0, dtype=np.int64)
        return VirtualSites(z, z, z, np.zeros(0), np.zeros(0))

    @property
    def count(self):
        return len(self.site)

    def arrays(self, dtype):
        return dict(site=jnp.asarray(self.site, jnp.int32),
                    p1=jnp.asarray(self.parent1, jnp.int32),
                    p2=jnp.asarray(self.parent2, jnp.int32),
                    w1=jnp.asarray(self.w1, dtype),
                    w2=jnp.asarray(self.w2, dtype))


def project_positions(pos, vs):
    """Set virtual-site positions from their parents."""
    new = (vs["w1"][:, None] * pos[vs["p1"]]
           + vs["w2"][:, None] * pos[vs["p2"]])
    return pos.at[vs["site"]].set(new)


def spread_forces(force, vs):
    """Redistribute site forces onto parents and zero the site forces."""
    fsite = force[vs["site"]]
    n = force.shape[0]
    add = (jax.ops.segment_sum(vs["w1"][:, None] * fsite, vs["p1"],
                               num_segments=n)
           + jax.ops.segment_sum(vs["w2"][:, None] * fsite, vs["p2"],
                                 num_segments=n))
    return force.at[vs["site"]].set(0.0) + add
