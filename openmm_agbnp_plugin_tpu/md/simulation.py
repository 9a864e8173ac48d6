"""On-device MD loop: AGBNP implicit solvent + MM force field under lax.scan.

The reference benchmark protocol is 10,000 Langevin steps with wall-clock
timing (reference example/t4lysozyme_benchmark.py:30-34).  Here the whole
inner loop — AGBNP tree build + pair phases, MM forces, integrator update —
is a single jitted lax.scan with no host round-trips; the host only sees the
final state and per-step energy trace.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.agbnp_jax import AGBNPModel, energy_forces
from ..models.oracle import AGBNPParams
from .forces import MMForceField
from .integrators import langevin_middle_step, velocity_verlet_step


class Simulation:
    """MD simulation of a DMS system with AGBNP implicit solvent.

    Mirrors the capability of the reference benchmark scripts
    (DesmondDMSFile.createSystem(implicitSolvent='AGBNP') + LangevinIntegrator
    + Simulation.step), with the entire step fused on device.
    """

    def __init__(self, dms, version: int = 1, cutoff: float | None = None,
                 dtype=np.float64, include_mm: bool = True,
                 caps=None, pairs=None):
        self.dms = dms
        self.dtype = dtype
        params = AGBNPParams(radius=dms.agbnp_radius, gamma=dms.agbnp_gamma,
                             alpha=dms.agbnp_alpha, charge=dms.charges,
                             ishydrogen=dms.ishydrogen)
        self.agbnp = AGBNPModel(params, version=version, cutoff=cutoff,
                                dtype=dtype, caps=caps, pairs=pairs)
        self.mm = MMForceField.from_dms(dms, cutoff=cutoff, dtype=dtype) \
            if include_mm else None
        self.masses = jnp.asarray(dms.masses, dtype)
        self.positions = jnp.asarray(dms.positions, dtype)
        self.velocities = jnp.asarray(dms.velocities, dtype)

    def force_fn(self):
        agbnp = self.agbnp

        def fn(pos):
            out = agbnp._jit_ef(agbnp.arrays, pos)
            energy, force = out["energy"], out["force"]
            if self.mm is not None:
                e_mm, g_mm = jax.value_and_grad(self.mm.energy)(pos)
                energy = energy + e_mm
                force = force - g_mm
            return energy, force

        return fn

    def make_langevin_runner(self, dt=0.001, temperature=300.0, friction=1.0):
        """Returns run(pos, vel, key, nsteps) jitted over a lax.scan."""
        step = langevin_middle_step(self.force_fn(), self.masses, dt,
                                    temperature, friction)

        @partial(jax.jit, static_argnames=("nsteps",))
        def run(pos, vel, key, nsteps: int):
            (pos, vel, key), energies = jax.lax.scan(
                step, (pos, vel, key), length=nsteps)
            return pos, vel, key, energies

        return run

    def make_verlet_runner(self, dt=0.001):
        fn = self.force_fn()
        step = velocity_verlet_step(fn, self.masses, dt)

        @partial(jax.jit, static_argnames=("nsteps",))
        def run(pos, vel, nsteps: int):
            _, force = fn(pos)
            (pos, vel, force), (pe, ke) = jax.lax.scan(
                step, (pos, vel, force), length=nsteps)
            return pos, vel, pe, ke

        return run

    def benchmark_langevin(self, nsteps=1000, dt=0.001, temperature=300.0,
                           friction=1.0, seed=0, warmup=True):
        """Timed Langevin MD, reference-benchmark style. Returns dict with
        ns/day and the energy trace."""
        run = self.make_langevin_runner(dt, temperature, friction)
        key = jax.random.PRNGKey(seed)
        pos, vel = self.positions, self.velocities
        if warmup:  # compile + 3 steps
            p, v, k, e = run(pos, vel, key, 3)
            jax.block_until_ready(p)
        t0 = time.perf_counter()
        pos, vel, key, energies = run(pos, vel, key, nsteps)
        jax.block_until_ready(pos)
        elapsed = time.perf_counter() - t0
        ns_day = nsteps * dt * 1e-3 / elapsed * 86400.0
        return dict(ns_day=ns_day, elapsed_s=elapsed, steps_per_s=nsteps / elapsed,
                    final_pos=pos, final_vel=vel,
                    energies=np.asarray(energies))
