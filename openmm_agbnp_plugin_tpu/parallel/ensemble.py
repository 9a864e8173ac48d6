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

    def make_runner(self, dt=0.001, temperature=300.0, friction=1.0,
                    neighbor_every: int = 20, scan_unroll: int = 4,
                    vdw_compact: bool = True, vdw_relax: float = 0.5):
        """run(states, nsteps) -> (states, energies [R, nsteps]).

        With neighbor_every > 0 each replica rebuilds its own neighbor list
        and overlap-tree topology every `neighbor_every` steps and runs the
        fixed-topology volume rescan in between — the vmapped analogue of
        Simulation.make_langevin_runner's stale-topology window, which is
        what makes batched replicas pay roughly one replica's build cost
        per window instead of one per step.

        With vdw_compact (the default, versions 0/1), each replica's
        rebuild also extracts the compacted vdW-live topology
        (ops/tree.py::compact_topology) and the per-step vdW-channel
        passes run on it — the same ~35-45% step-time cut as the
        single-system runner, vmapped; kept-row counts ride the diagnostics
        for the PanicButton check."""
        sim = self.sim

        if neighbor_every <= 0:
            def replica_run(ff, state, nsteps):
                step = langevin_middle_step(sim.force_fn(ff=ff), sim.masses,
                                            dt, temperature, friction,
                                            constraints=sim.constraints)
                (pos, vel, key), (energies, counts) = jax.lax.scan(
                    step, state, length=nsteps,
                    unroll=min(scan_unroll, nsteps))
                return (pos, vel, key), (
                    energies, jnp.max(counts, axis=0),
                    jnp.zeros((), jnp.int32), jnp.zeros(7, jnp.int32),
                    jnp.zeros(7, jnp.int32))

            vrun = jax.vmap(replica_run, in_axes=(None, 0, None))

            @partial(jax.jit, static_argnames=("nsteps",),
                     out_shardings=(self.rep_sharding, self.rep_sharding))
            def run_ff(ff, states, nsteps: int):
                return vrun(ff, states, nsteps)

            def run(states, nsteps: int):
                return run_ff(sim.ff_state(), states, nsteps)

            return run

        from ..ops import tree as _T

        heavy, rcut, kmax = sim.heavy_mask, sim.rcut_list, sim.kmax
        nbfn = sim.neighbor_fn
        roffset = sim.agbnp.params.roffset
        use_vdwc = (vdw_compact and sim.agbnp2 is None
                    and sim.agbnp.version in (0, 1))
        vdw_caps = sim._ensure_vdw_caps(vdw_relax) if use_vdwc else None

        def outer(carry, _, ninner, ff):
            pos, vel, key = carry
            a = ff["a"]
            pi, pj, pv, nbmax = nbfn(pos, heavy, rcut, kmax)
            gdr = a["gamma"] / roffset
            lvl1 = _T.make_level1(pos, a["radii_large"], a["vol_large"],
                                  gdr, a["ishydrogen"])
            levels, bdiag = _T.build_tree(lvl1, pi, pj, sim.agbnp.caps,
                                          pairs_valid=pv, pair_rows=True)
            topo = _T.tree_topology(levels)
            vdw_topo = None
            vdw_counts = jnp.zeros(7, jnp.int32)
            if use_vdwc:
                lvl1v = _T.make_level1(pos, a["radii_vdw"], a["vol_vdw"],
                                       -gdr, a["ishydrogen"])
                vdw_topo, vdw_counts = _T.compact_topology(
                    _T.rescan_volumes(topo, lvl1v), vdw_caps,
                    relax=vdw_relax)
                vdw_counts = vdw_counts.astype(jnp.int32)
            inner = langevin_middle_step(
                sim.force_fn(pairs=(pi, pj, pv), topology=topo, ff=ff,
                             vdw_topology=vdw_topo),
                sim.masses, dt, temperature, friction,
                constraints=sim.constraints)
            (pos, vel, key), (energies, counts) = jax.lax.scan(
                inner, (pos, vel, key), length=ninner,
                unroll=min(scan_unroll, ninner))
            # carry the overflow diagnostics like make_langevin_runner — an
            # overflowing replica must not silently run with a truncated tree
            from ..ops.tree import merge_counts
            maxcounts = merge_counts(jnp.max(counts, axis=0),
                                     bdiag["counts"])
            return (pos, vel, key), (energies, maxcounts, nbmax,
                                     bdiag["max_siblings"], vdw_counts)

        def replica_run(ff, state, nouter, ninner):
            state, (energies, counts, nbmax, sibs, vdwc) = jax.lax.scan(
                partial(outer, ninner=ninner, ff=ff), state, length=nouter)
            return state, (energies.reshape(-1), jnp.max(counts, axis=0),
                           jnp.max(nbmax), jnp.max(sibs, axis=0),
                           jnp.max(vdwc, axis=0))

        vrun = jax.vmap(replica_run, in_axes=(None, 0, None, None))

        @partial(jax.jit, static_argnames=("nsteps",),
                 out_shardings=(self.rep_sharding, self.rep_sharding))
        def run_ff(ff, states, nsteps: int):
            ne = neighbor_every if nsteps >= neighbor_every else nsteps
            nouter = nsteps // ne
            return vrun(ff, states, nouter, ne)

        def run(states, nsteps: int):
            ff = sim.ff_state()
            main = (nsteps // neighbor_every) * neighbor_every
            rem = nsteps - main
            if not rem:
                return run_ff(ff, states, nsteps)
            # nsteps need not divide into rebuild windows: run the full
            # windows, then one short remainder window (its own compiled
            # executable, reused across calls with the same remainder)
            outs = []
            if main:
                states, out = run_ff(ff, states, main)
                outs.append(out)
            states, out = run_ff(ff, states, rem)
            outs.append(out)
            if len(outs) == 1:
                return states, outs[0]
            e = jnp.concatenate([o[0] for o in outs], axis=1)
            agg = [jnp.maximum(outs[0][i], outs[1][i])
                   for i in range(1, len(outs[0]))]
            return states, (e, *agg)

        return run

    def benchmark(self, nsteps=100, dt=0.001, temperature=300.0,
                  friction=1.0, jitter=1e-3, neighbor_every: int = 20):
        run = self.make_runner(dt, temperature, friction,
                               neighbor_every=neighbor_every)
        states = self.initial_states(jitter=jitter)
        # warm with the SAME static nsteps so the timed call reuses the
        # compiled executable
        out = run(states, nsteps)
        np.asarray(out[1][0]).ravel()[:1]  # sync
        t0 = time.perf_counter()
        states, (energies, counts, nbmax, sibs, *vdwc) = run(states, nsteps)
        energies = np.asarray(energies)
        elapsed = time.perf_counter() - t0
        ns_day = nsteps * dt * 1e-3 / elapsed * 86400.0
        # overflow across all replicas (each replica's maxima were reduced
        # on device; here max over the replica axis)
        overflow = self.sim._check_overflow(
            np.asarray(counts).max(axis=0), int(np.asarray(nbmax).max()),
            np.asarray(sibs).max(axis=0),
            np.asarray(vdwc[0]).max(axis=0) if vdwc else None)
        return dict(ns_day_per_replica=ns_day,
                    replica_ns_day_aggregate=ns_day * self.n_replicas,
                    elapsed_s=elapsed, energies=energies, states=states,
                    overflow=overflow)
