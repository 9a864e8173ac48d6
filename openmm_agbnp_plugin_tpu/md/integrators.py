"""MD integrators as pure JAX step functions.

The reference benchmarks use OpenMM's LangevinIntegrator at 300 K / 1 fs and
VerletIntegrator for energy-conservation checks (reference
example/t4lysozyme_benchmark.py:21, example/test_agbnp.py:58-64).  Here the
integrators are middle-scheme Langevin (BAOAB-family; equal or better
configurational sampling accuracy at the same step size) and velocity
Verlet, written to live inside a lax.scan MD loop with no host round-trips.

Units: nm, ps, kJ/mol, amu.  kB = 0.00831446261815324 kJ/mol/K.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

KB = 0.00831446261815324  # kJ/mol/K


def kinetic_energy(vel, masses):
    return 0.5 * jnp.sum(masses[:, None] * vel * vel)


def temperature(vel, masses):
    ndof = vel.shape[0] * 3
    return 2.0 * kinetic_energy(vel, masses) / (ndof * KB)


def maxwell_boltzmann_velocities(key, masses, temp, dtype=None,
                                 remove_com: bool = True):
    """Draw velocities from the Maxwell-Boltzmann distribution at `temp`
    (the setVelocitiesToTemperature analogue of OpenMM's Context, which the
    reference systems' MD setup uses).  With remove_com the center-of-mass
    drift is projected out (and the sample rescaled so the kinetic
    temperature of the remaining DOF is exactly `temp`)."""
    masses = jnp.asarray(masses)
    dtype = dtype or masses.dtype
    sigma = jnp.sqrt(KB * temp / masses)[:, None].astype(dtype)
    vel = sigma * jax.random.normal(key, (masses.shape[0], 3), dtype=dtype)
    if remove_com:
        m = masses[:, None].astype(dtype)
        vel = vel - jnp.sum(m * vel, axis=0) / jnp.sum(m)
        ndof = masses.shape[0] * 3 - 3
        ke = 0.5 * jnp.sum(m * vel * vel)
        vel = vel * jnp.sqrt(0.5 * ndof * KB * temp / ke)
    return vel


def langevin_middle_step(force_fn, masses, dt, temp, friction,
                         constraints=None):
    """One step of the middle-scheme Langevin integrator.

      v <- v + dt f(x)/m           [+ RATTLE]
      x <- x + dt/2 v
      v <- a v + sqrt(1-a^2) sqrt(kT/m) xi        (a = exp(-friction dt))
      x <- x + dt/2 v              [+ SHAKE vs pre-step x, velocity fixup]

    One force evaluation per step.  With constraints (md/constraints.py),
    this is the constrained middle scheme OpenMM's LangevinMiddleIntegrator
    applies to the reference systems' Desmond X-H constraint tables: RATTLE
    after the force kick, SHAKE after the position update, and the implied
    velocity correction (x_c - x)/dt.  Returns a scan-compatible step
    function over state (pos, vel, key).
    """
    a = jnp.exp(-friction * dt)
    b = jnp.sqrt(1.0 - a * a)
    inv_m = 1.0 / masses[:, None]

    def step(state, _):
        pos, vel, key = state
        energy, force, *aux = force_fn(pos)
        vel = vel + dt * force * inv_m
        if constraints is not None:
            vel = constraints.velocities(pos, vel)
        pos0 = pos
        pos = pos + 0.5 * dt * vel
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, vel.shape, dtype=vel.dtype)
        sigma = jnp.sqrt(KB * temp * inv_m)
        vel = a * vel + b * sigma * noise
        pos = pos + 0.5 * dt * vel
        if constraints is not None:
            posc = constraints.positions(pos, pos0)
            vel = vel + (posc - pos) / dt
            pos = posc
        return (pos, vel, key), (energy, *aux)

    return step


def mts_langevin_step(slow_force_fn, fast_force_fn, masses, dt, temp,
                      friction, inner: int, constraints=None):
    """Multiple-timestep (r-RESPA) middle-scheme Langevin step.

    The expensive force class (`slow_force_fn`: the full AGBNP implicit
    solvent + MM nonbonded evaluation) is applied as one impulse per outer
    step `dt`, while the stiff cheap class (`fast_force_fn`: MM bonded +
    1-4 terms) integrates at the substep ``delta = dt/inner``:

      v <- v + dt F_slow(x)/m                        [+ RATTLE]
      repeat `inner` times (middle scheme at delta with F_fast):
        v <- v + delta F_fast(x)/m                   [+ RATTLE]
        x <- x + delta/2 v
        v <- a v + sqrt(1-a^2) sqrt(kT/m) xi         (a = e^{-friction delta})
        x <- x + delta/2 v                           [+ SHAKE, vel fixup]

    One slow evaluation and `inner` fast evaluations per outer step; with
    ``inner=1`` this reproduces `langevin_middle_step` with the summed
    force exactly (same kick at the same x, same noise stream), which the
    tests use as the regression anchor.  This is the Tuckerman r-RESPA
    splitting in the kick-at-the-start (middle/VRORV) arrangement OpenMM's
    MTSLangevinIntegrator uses; the reference plugin has no MTS capability
    (its protocol is full force evaluation every 1 fs step,
    reference example/t4lysozyme_benchmark.py:21).

    slow_force_fn(pos) -> (energy, force, counts); fast_force_fn(pos) ->
    (energy, force).  Returns a scan step over (pos, vel, key) emitting
    (energy_slow + energy_fast_at_start, counts).
    """
    delta = dt / inner
    a = jnp.exp(-friction * delta)
    b = jnp.sqrt(1.0 - a * a)
    inv_m = 1.0 / masses[:, None]

    def step(state, _):
        pos, vel, key = state
        e_slow, f_slow, *aux = slow_force_fn(pos)
        vel = vel + dt * f_slow * inv_m
        if constraints is not None:
            vel = constraints.velocities(pos, vel)
        e_fast0 = None

        for i in range(inner):
            e_fast, f_fast = fast_force_fn(pos)
            e_fast0 = e_fast if e_fast0 is None else e_fast0
            vel = vel + delta * f_fast * inv_m
            if constraints is not None:
                vel = constraints.velocities(pos, vel)
            pos0 = pos
            pos = pos + 0.5 * delta * vel
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, vel.shape, dtype=vel.dtype)
            sigma = jnp.sqrt(KB * temp * inv_m)
            vel = a * vel + b * sigma * noise
            pos = pos + 0.5 * delta * vel
            if constraints is not None:
                posc = constraints.positions(pos, pos0)
                vel = vel + (posc - pos) / delta
                pos = posc
        return (pos, vel, key), (e_slow + e_fast0, *aux)

    return step


def wu_impulse_langevin_block(split_force_fn, skip_force_fn, masses, dt,
                              temp, friction, k: int, constraints=None):
    """k-step middle-Langevin block with the WU self-volume-gradient force
    applied as an r-RESPA impulse at block start (the `mts_wu` option).

    The WU gamma-rescan force pass is the smoothest AGBNP force component
    (it differentiates switched self-volumes, which change on the
    neighbor-rebuild timescale), so it qualifies as an r-RESPA slow class
    at period k*dt while everything else integrates at dt.  Exactness
    anchor: with k=1 this reproduces langevin_middle_step with the fused
    force bit-for-bit (same kick at the same positions, same noise
    stream).

    split_force_fn(pos) -> (e, force_without_wu, force_wu, counts)
    skip_force_fn(pos)  -> (e, force_without_wu, counts)

    Returns a scan-compatible block step over (pos, vel, key) emitting
    (energies [k], counts_max) per block.  The reported per-step energies
    are exact: the WU pass contributes force only, never energy.

    Boundary note: the full k*dt impulse is applied at block START rather
    than as symmetric k/2 half-kicks at block boundaries; under the
    Langevin thermostat the first/last-block asymmetry is benign (it is a
    single-kick phase offset, bounded by the validated wu-force smoothness)
    but this splitting is not NVE-grade time-symmetric.
    """
    a = jnp.exp(-friction * dt)
    b = jnp.sqrt(1.0 - a * a)
    inv_m = 1.0 / masses[:, None]

    def block(state, _):
        pos, vel, key = state
        es = []
        cs = []
        for i in range(k):
            if i == 0:
                e, force, f_wu, counts = split_force_fn(pos)
                # impulse: k*dt worth of WU force folded into this kick
                force = force + k * f_wu
            else:
                e, force, counts = skip_force_fn(pos)
            es.append(e)
            cs.append(counts)
            vel = vel + dt * force * inv_m
            if constraints is not None:
                vel = constraints.velocities(pos, vel)
            pos0 = pos
            pos = pos + 0.5 * dt * vel
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, vel.shape, dtype=vel.dtype)
            sigma = jnp.sqrt(KB * temp * inv_m)
            vel = a * vel + b * sigma * noise
            pos = pos + 0.5 * dt * vel
            if constraints is not None:
                posc = constraints.positions(pos, pos0)
                vel = vel + (posc - pos) / dt
                pos = posc
        return ((pos, vel, key),
                (jnp.stack(es), jnp.max(jnp.stack(cs), axis=0)))

    return block


def mts_verlet_step(slow_force_fn, fast_force_fn, masses, dt, inner: int,
                    constraints=None):
    """Symmetric r-RESPA velocity Verlet (NVE): half slow kick, `inner`
    velocity-Verlet substeps with the fast force, half slow kick.  Used by
    the energy-drift validation of the MTS splitting (the NVE analogue of
    the reference's install-test Verlet drift check,
    reference example/test_agbnp.py:58-64).

    State: (pos, vel, f_slow, f_fast).  Returns (state, (pe, ke, counts))
    with pe evaluated at the step's final positions.
    """
    inv_m = 1.0 / masses[:, None]

    def step(state, _):
        pos, vel, f_slow, f_fast = state
        vel = vel + 0.5 * dt * f_slow * inv_m
        if constraints is not None:
            vel = constraints.velocities(pos, vel)
        delta = dt / inner
        e_fast = None
        for i in range(inner):
            vel_half = vel + 0.5 * delta * f_fast * inv_m
            new_pos = pos + delta * vel_half
            if constraints is not None:
                posc = constraints.positions(new_pos, pos)
                vel_half = vel_half + (posc - new_pos) / delta
                new_pos = posc
            pos = new_pos
            e_fast, f_fast = fast_force_fn(pos)
            vel = vel_half + 0.5 * delta * f_fast * inv_m
        e_slow, f_slow, *aux = slow_force_fn(pos)
        vel = vel + 0.5 * dt * f_slow * inv_m
        if constraints is not None:
            vel = constraints.velocities(pos, vel)
        ke = kinetic_energy(vel, masses)
        return (pos, vel, f_slow, f_fast), (e_slow + e_fast, ke, *aux)

    return step


def velocity_verlet_step(force_fn, masses, dt, constraints=None):
    """Velocity Verlet; carries the force to avoid re-evaluation.

    With constraints this is classic SHAKE/RATTLE Verlet: SHAKE the drifted
    positions against the previous constrained ones (with the matching
    half-kick velocity fixup), RATTLE the final velocities.
    State: (pos, vel, force).  Returns (state, (potential, kinetic)).
    """
    inv_m = 1.0 / masses[:, None]

    def step(state, _):
        pos, vel, force = state
        vel_half = vel + 0.5 * dt * force * inv_m
        new_pos = pos + dt * vel_half
        if constraints is not None:
            posc = constraints.positions(new_pos, pos)
            vel_half = vel_half + (posc - new_pos) / dt
            new_pos = posc
        energy, new_force, *aux = force_fn(new_pos)
        vel = vel_half + 0.5 * dt * new_force * inv_m
        if constraints is not None:
            vel = constraints.velocities(new_pos, vel)
        ke = kinetic_energy(vel, masses)
        return (new_pos, vel, new_force), (energy, ke, *aux)

    return step
