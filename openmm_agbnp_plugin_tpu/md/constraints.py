"""Holonomic X-H distance constraints (SHAKE/RATTLE) as pure JAX updates.

The reference benchmark systems carry Desmond constraint tables
(constraint_ah{1,2,3}: one heavy atom + 1-3 hydrogens at fixed distances)
which the reference applies through DesmondDMSFile.createSystem(...)
(reference example/trpcage_benchmark.py:11) as OpenMM distance constraints;
its integrators then run SHAKE on positions and RATTLE on velocities each
step.  Here the same constraints are solved with a vectorized Jacobi
iteration over all constraints at once — every constraint computes its
Lagrange correction from the current residual and the corrections are
scatter-added to the shared atoms (deterministic .at[].add), repeated under
a lax.while_loop until the worst relative residual passes tolerance.  For
the star-shaped X-H clusters these tables produce, this converges in a
handful of sweeps, and the fixed-shape formulation sits inside the jitted
lax.scan MD loop with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Constraints:
    """A fixed set of pairwise distance constraints.

    idx: [nc, 2] atom indices (heavy, hydrogen); d: [nc] target distances
    (nm); masses: [N].  tol is the relative distance tolerance (OpenMM
    integrator constraint-tolerance semantics).
    """

    def __init__(self, idx, d, masses, tol: float = 1e-8,
                 max_iter: int = 200):
        idx = np.asarray(idx, np.int32).reshape(-1, 2)
        self.n_constraints = idx.shape[0]
        self.a = jnp.asarray(idx[:, 0])
        self.b = jnp.asarray(idx[:, 1])
        self.d = jnp.asarray(np.asarray(d, np.float64))
        masses = np.asarray(masses, np.float64)
        self.inv_ma = jnp.asarray(1.0 / masses[idx[:, 0]])
        self.inv_mb = jnp.asarray(1.0 / masses[idx[:, 1]])
        self.tol = float(tol)
        self.max_iter = int(max_iter)

    def _tol(self, dtype):
        """Effective tolerance: the requested one, floored at what the
        compute dtype can express — in float32 a 1e-8 relative residual is
        below roundoff and the iteration would always run to max_iter."""
        return max(self.tol, 30.0 * float(jnp.finfo(dtype).eps))

    @staticmethod
    def from_dms(dms, tol: float = 1e-8):
        if dms.constraint_idx.size == 0:
            return None
        return Constraints(dms.constraint_idx, dms.constraint_d, dms.masses,
                           tol=tol)

    def positions(self, x, x_ref):
        """SHAKE: project x onto the constraint manifold using reference
        directions from x_ref (the pre-step constrained positions)."""
        if self.n_constraints == 0:
            return x
        a, b, d = self.a, self.b, self.d.astype(x.dtype)
        ima = self.inv_ma.astype(x.dtype)
        imb = self.inv_mb.astype(x.dtype)
        rref = x_ref[a] - x_ref[b]
        d2 = d * d
        # convergence measured as |r^2 - d^2| / (2 d^2) ~ relative distance
        # error, the OpenMM constraint-tolerance convention
        tol2 = 2.0 * self._tol(x.dtype)

        def residual(x):
            r = x[a] - x[b]
            return jnp.sum(r * r, axis=-1) - d2, r

        def cond(state):
            it, x = state
            diff, _ = residual(x)
            return (it < self.max_iter) & (
                jnp.max(jnp.abs(diff) / d2) > tol2)

        def body(state):
            it, x = state
            diff, r = residual(x)
            rr = jnp.sum(r * rref, axis=-1)
            # guard: if the bond rotated past perpendicular the linearized
            # step is invalid; fall back to the current direction
            rr = jnp.where(jnp.abs(rr) > 1e-12 * d2, rr, d2)
            g = diff / (2.0 * (ima + imb) * rr)
            dx = g[:, None] * rref
            x = x.at[a].add(-ima[:, None] * dx)
            x = x.at[b].add(imb[:, None] * dx)
            return it + 1, x

        _, x = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), x))
        return x

    def velocities(self, x, v):
        """RATTLE: remove velocity components along the (current) constraint
        directions so d/dt |r|^2 = 0."""
        if self.n_constraints == 0:
            return v
        a, b, d = self.a, self.b, self.d.astype(v.dtype)
        ima = self.inv_ma.astype(v.dtype)
        imb = self.inv_mb.astype(v.dtype)
        r = x[a] - x[b]
        d2 = d * d
        im = ima + imb

        def cdot(v):
            return jnp.sum(r * (v[a] - v[b]), axis=-1)

        # velocity tolerance: relative rate |r.dv| / d^2 (1/ps units)
        vtol = self._tol(v.dtype)

        def cond(state):
            it, v = state
            return (it < self.max_iter) & (
                jnp.max(jnp.abs(cdot(v)) / d2) > vtol)

        def body(state):
            it, v = state
            g = cdot(v) / (im * d2)
            dv = g[:, None] * r
            v = v.at[a].add(-ima[:, None] * dv)
            v = v.at[b].add(imb[:, None] * dv)
            return it + 1, v

        _, v = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), v))
        return v

    def max_violation(self, x):
        """Worst relative distance error (diagnostic)."""
        if self.n_constraints == 0:
            return jnp.zeros(())
        r = x[self.a] - x[self.b]
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))
        return jnp.max(jnp.abs(d - self.d.astype(x.dtype))
                       / self.d.astype(x.dtype))
