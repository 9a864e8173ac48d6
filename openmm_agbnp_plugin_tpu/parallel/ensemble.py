"""Replica-ensemble MD: vmapped AGBNP dynamics sharded over a device mesh.

BASELINE config 5: batched AGBNP1 MD on N replicas of one system for
free-energy workflows.  The reference has no multi-device capability at all
(one OpenCL context enforced, reference OpenCLAGBNPKernels.cpp:412-413);
here replicas are a leading batch axis, vmapped through the entire force
pipeline + integrator and sharded across the `replica` mesh axis so each
chip integrates its replicas locally with zero collectives in steady state.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..md.integrators import langevin_middle_step
from .sharding import replica_mesh


class ReplicaEnsemble:
    """N independent replicas of a Simulation, data-parallel over devices."""

    def __init__(self, sim, n_replicas: int, mesh=None):
        self.sim = sim
        self.n_replicas = n_replicas
        if mesh is None:
            ndev = len(jax.devices())
            use = max(d for d in range(1, ndev + 1) if n_replicas % d == 0)
            mesh = replica_mesh(use)
        self.mesh = mesh
        self.rep_sharding = NamedSharding(mesh, P("replica"))

    def initial_states(self, jitter: float = 0.0, seed: int = 0):
        """Replicated (pos, vel, key) stacked on the replica axis."""
        R = self.n_replicas
        pos = jnp.broadcast_to(self.sim.positions, (R,) + self.sim.positions.shape)
        if jitter > 0:
            key = jax.random.PRNGKey(seed)
            pos = pos + jitter * jax.random.normal(key, pos.shape, pos.dtype)
        vel = jnp.broadcast_to(self.sim.velocities,
                               (R,) + self.sim.velocities.shape)
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(R) + seed)
        states = (pos, vel, keys)
        return jax.tree.map(lambda x: jax.device_put(x, self.rep_sharding),
                            states)

    def make_runner(self, dt=0.001, temperature=300.0, friction=1.0):
        """run(states, nsteps) -> (states, energies [R, nsteps])."""
        step = langevin_middle_step(self.sim.force_fn(), self.sim.masses, dt,
                                    temperature, friction)

        def replica_run(state, nsteps):
            (pos, vel, key), outs = jax.lax.scan(step, state, length=nsteps)
            return (pos, vel, key), outs[0]

        vrun = jax.vmap(replica_run, in_axes=(0, None))

        @partial(jax.jit, static_argnames=("nsteps",),
                 in_shardings=(self.rep_sharding,),
                 out_shardings=(self.rep_sharding, self.rep_sharding))
        def run(states, nsteps: int):
            return vrun(states, nsteps)

        return run

    def benchmark(self, nsteps=100, dt=0.001, temperature=300.0,
                  friction=1.0, jitter=1e-3):
        run = self.make_runner(dt, temperature, friction)
        states = self.initial_states(jitter=jitter)
        out = run(states, max(1, nsteps // 10))
        np.asarray(out[1]).ravel()[:1]  # sync
        t0 = time.perf_counter()
        states, energies = run(states, nsteps)
        energies = np.asarray(energies)
        elapsed = time.perf_counter() - t0
        ns_day = nsteps * dt * 1e-3 / elapsed * 86400.0
        return dict(ns_day_per_replica=ns_day,
                    replica_ns_day_aggregate=ns_day * self.n_replicas,
                    elapsed_s=elapsed, energies=energies, states=states)
