"""On-device MD loop: AGBNP implicit solvent + MM force field under lax.scan.

The reference benchmark protocol is 10,000 Langevin steps with wall-clock
timing (reference example/t4lysozyme_benchmark.py:30-34).  Here the whole
inner loop — AGBNP tree build + pair phases, MM forces, integrator update,
periodic on-device neighbor-list rebuild — is a single jitted nested
lax.scan with no host round-trips; the host only sees the final state and
the per-step energy trace.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.agbnp_jax import AGBNPModel, energy_forces
from ..models.oracle import AGBNPParams
from ..ops.neighbors import half_neighbor_pairs, tree_pair_cutoff
from .forces import MMForceField
from .integrators import langevin_middle_step, velocity_verlet_step


def _host_max_neighbors(pos, heavy, rcut):
    d = np.linalg.norm(pos[None, :, :] - pos[:, None, :], axis=-1)
    n = pos.shape[0]
    jj = np.arange(n)
    ok = (jj[None, :] > jj[:, None]) & (d < rcut) & heavy[:, None] & heavy[None, :]
    return int(ok.sum(axis=1).max())


class Simulation:
    """MD simulation of a DMS system with AGBNP implicit solvent.

    Mirrors the capability of the reference benchmark scripts
    (DesmondDMSFile.createSystem(implicitSolvent='AGBNP') + LangevinIntegrator
    + Simulation.step), with the entire step fused on device.
    """

    def __init__(self, dms, version: int = 1, cutoff: float | None = None,
                 dtype=np.float64, include_mm: bool = True,
                 caps=None, pairs=None, skin: float = 0.15,
                 kmax: int | None = None, vsites=None):
        self.dms = dms
        self.dtype = dtype
        self.vsites = vsites.arrays(dtype) if vsites is not None and             getattr(vsites, "count", 0) > 0 else None
        params = AGBNPParams(radius=dms.agbnp_radius, gamma=dms.agbnp_gamma,
                             alpha=dms.agbnp_alpha, charge=dms.charges,
                             ishydrogen=dms.ishydrogen)
        self.agbnp = AGBNPModel(params, version=version, cutoff=cutoff,
                                dtype=dtype, caps=caps, pairs=pairs,
                                positions=dms.positions)
        self.mm = MMForceField.from_dms(dms, cutoff=cutoff, dtype=dtype) \
            if include_mm else None
        self.masses = jnp.asarray(dms.masses, dtype)
        self.positions = jnp.asarray(dms.positions, dtype)
        self.velocities = jnp.asarray(dms.velocities, dtype)

        # neighbor-list sizing pass (the analogue of the reference's CPU
        # GaussVol pre-pass, OpenCLAGBNPKernels.cpp:566-617)
        self.rcut_list = tree_pair_cutoff(params.radii_large) + skin
        heavy = np.asarray(params.ishydrogen) == 0
        if kmax is None:
            seen = _host_max_neighbors(np.asarray(dms.positions), heavy,
                                       self.rcut_list)
            kmax = int(np.ceil(seen * 1.5 / 16) * 16)
        self.kmax = kmax
        self.heavy_mask = jnp.asarray(heavy)

    def _agbnp_force(self, pos, pairs=None):
        a = self.agbnp.arrays
        if pairs is not None:
            a = {**a, "pairs_i": pairs[0], "pairs_j": pairs[1],
                 "pairs_valid": pairs[2]}
        out = energy_forces(a, pos, caps=self.agbnp.caps,
                            version=self.agbnp.version,
                            roffset=self.agbnp.params.roffset,
                            ntypes_j=self.agbnp.ntypes_j,
                            cutoff=self.agbnp.cutoff)
        return out["energy"], out["force"], out["diag"]["counts"]

    def force_fn(self, pairs=None):
        """Returns fn(pos) -> (energy, force, tree_counts); the counts ride
        the scan outputs so overflow is detectable after an MD run (the
        in-loop PanicButton, reference OpenCLAGBNPKernels.cpp:3598-3634)."""
        from .vsites import project_positions, spread_forces

        def fn(pos):
            if self.vsites is not None:
                pos = project_positions(pos, self.vsites)
            energy, force, counts = self._agbnp_force(pos, pairs)
            if self.mm is not None:
                e_mm, g_mm = jax.value_and_grad(self.mm.energy)(pos)
                energy = energy + e_mm
                force = force - g_mm
            if self.vsites is not None:
                force = spread_forces(force, self.vsites)
            return energy, force, counts
        return fn

    def make_langevin_runner(self, dt=0.001, temperature=300.0, friction=1.0,
                             neighbor_every: int = 10):
        """Returns run(pos, vel, key, nsteps) — a nested-scan Langevin loop.

        With neighbor_every > 0, the half neighbor list is rebuilt on device
        every `neighbor_every` steps and the tree's 2-body candidates come
        from it; with 0, every step uses the full triangular pair list.
        """
        masses, rcut, kmax = self.masses, self.rcut_list, self.kmax
        heavy = self.heavy_mask

        if neighbor_every <= 0:
            step = langevin_middle_step(self.force_fn(), masses, dt,
                                        temperature, friction)

            @partial(jax.jit, static_argnames=("nsteps",))
            def run(pos, vel, key, nsteps: int):
                (pos, vel, key), (energies, counts) = jax.lax.scan(
                    step, (pos, vel, key), length=nsteps)
                return pos, vel, key, energies, (jnp.max(counts, axis=0),
                                                 jnp.zeros((), jnp.int32))

            return run

        @partial(jax.jit, static_argnames=("nsteps",))
        def run(pos, vel, key, nsteps: int):
            nouter, rem = divmod(nsteps, neighbor_every)
            assert rem == 0, "nsteps must be a multiple of neighbor_every"

            def outer(carry, _):
                pos, vel, key = carry
                pi, pj, pv, nbmax = half_neighbor_pairs(pos, heavy, rcut, kmax)
                inner = langevin_middle_step(
                    self.force_fn(pairs=(pi, pj, pv)), masses, dt,
                    temperature, friction)
                (pos, vel, key), (energies, counts) = jax.lax.scan(
                    inner, (pos, vel, key), length=neighbor_every)
                return (pos, vel, key), (energies, jnp.max(counts, axis=0),
                                         nbmax)

            (pos, vel, key), (energies, counts, nbmax) = jax.lax.scan(
                outer, (pos, vel, key), length=nouter)
            return (pos, vel, key, energies.reshape(-1),
                    (jnp.max(counts, axis=0), jnp.max(nbmax)))

        return run

    def make_verlet_runner(self, dt=0.001):
        fn = self.force_fn()
        step = velocity_verlet_step(fn, self.masses, dt)

        @partial(jax.jit, static_argnames=("nsteps",))
        def run(pos, vel, nsteps: int):
            _, force, _ = fn(pos)
            (pos, vel, force), (pe, ke, _) = jax.lax.scan(
                step, (pos, vel, force), length=nsteps)
            return pos, vel, pe, ke

        return run

    def benchmark_langevin(self, nsteps=1000, dt=0.001, temperature=300.0,
                           friction=1.0, seed=0, warmup=True,
                           neighbor_every: int = 10):
        """Timed Langevin MD, reference-benchmark style. Returns dict with
        ns/day and the energy trace."""
        run = self.make_langevin_runner(dt, temperature, friction,
                                        neighbor_every=neighbor_every)
        key = jax.random.PRNGKey(seed)
        pos, vel = self.positions, self.velocities
        if warmup:
            out = run(pos, vel, key, max(neighbor_every, 1))
            np.asarray(out[0]).ravel()[0:1]  # force full sync through the tunnel
        t0 = time.perf_counter()
        pos, vel, key, energies, (counts, nbmax) = run(pos, vel, key, nsteps)
        counts = np.asarray(counts)  # device sync
        elapsed = time.perf_counter() - t0
        ns_day = nsteps * dt * 1e-3 / elapsed * 86400.0
        overflow = bool((counts > np.asarray(self.agbnp.caps.caps)).any()
                        or int(nbmax) > self.kmax)
        return dict(ns_day=ns_day, elapsed_s=elapsed, steps_per_s=nsteps / elapsed,
                    final_pos=pos, final_vel=vel, tree_counts_max=counts,
                    neighbor_max=int(nbmax), overflow=overflow,
                    energies=np.asarray(energies))
