"""Protocol-length validation of the mts_wu r-RESPA impulse (wu_every=4).

VERDICT r3 weak #2: the 12-step window bound is not enough to cite
mts_wu4 as a headline configuration — impulse splittings can resonance-
heat over thousands of steps.  This harness runs the reference install
test's own protocol shape (10k-step runs + an energy-conservation check,
reference example/test_agbnp.py:55-64) for the exact integrator
(wu_every=1) and the impulse (wu_every=4) side by side:

  1. NVT ensemble statistics, 10k steps Langevin 300 K: kinetic
     temperature (segment-boundary KE samples) and potential-energy
     distribution (per-step trace) — impulse vs exact.
  2. NVE drift: friction = 0 turns the langevin-middle scheme into
     velocity Verlet (a = 1, b = 0: no thermostat); total energy
     E = PE + KE sampled at 1k-step boundaries over 10k steps, drift
     slope per ns reported for both integrators.

Writes benchmarks/mts_validation.json.  Usage:
  python benchmarks/validate_mts.py [trpcage_agbnp1|1li2_agbnp1 ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openmm_agbnp_plugin_tpu.io.dms import load_dms
from openmm_agbnp_plugin_tpu.md.simulation import Simulation

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = {
    # bench.py configurations (cutoff, descreen horizon)
    "trpcage_agbnp1": dict(cutoff=None, dh=None),
    "1li2_agbnp1": dict(cutoff=1.0, dh="cutoff"),
}


def kinetic_energy(masses, vel):
    return 0.5 * float(np.sum(np.asarray(masses)[:, None]
                              * np.asarray(vel) ** 2))


def kinetic_temperature(masses, vel):
    KB = 0.00831446261815324  # kJ/mol/K
    n_dof = 3 * len(np.asarray(masses))  # no constraints in this protocol
    return 2.0 * kinetic_energy(masses, vel) / (n_dof * KB)


def run_nvt(sim, wu_every, nsteps=10000, nseg=20, seed=11, dt=0.001):
    """Segmented 10k-step Langevin run: per-step PE trace + segment-
    boundary kinetic-temperature samples."""
    run = sim.make_langevin_runner(dt, 300.0, 1.0, neighbor_every=10,
                                   wu_every=wu_every)
    key = jax.random.PRNGKey(seed)
    pos, vel = sim.positions, sim.velocities
    per = nsteps // nseg
    pe, temps = [], []
    t0 = time.time()
    for s in range(nseg):
        pos, vel, key, e, diag = run(pos, vel, key, per)
        e = np.asarray(e)  # sync
        pe.append(e)
        temps.append(kinetic_temperature(sim.masses, vel))
        if sim._check_overflow(np.asarray(diag[0]), diag[1],
                               np.asarray(diag[2]),
                               np.asarray(diag[3])):
            raise RuntimeError("overflow during validation run")
    pe = np.concatenate(pe)
    return dict(
        elapsed_s=time.time() - t0,
        pe_mean=float(pe[nsteps // 5:].mean()),
        pe_std=float(pe[nsteps // 5:].std()),
        temp_mean=float(np.mean(temps[nseg // 5:])),
        temp_std=float(np.std(temps[nseg // 5:])),
        temp_samples=[float(t) for t in temps],
    )


def run_nve(sim, wu_every, nsteps=10000, nseg=10, dt=0.001):
    """friction=0 (velocity Verlet) drift check from equilibrated state."""
    # equilibrate 2k steps at 300 K first (exact integrator)
    eq = sim.make_langevin_runner(dt, 300.0, 1.0, neighbor_every=10,
                                  wu_every=1)
    key = jax.random.PRNGKey(7)
    pos, vel, key, _, _ = eq(sim.positions, sim.velocities, key, 2000)

    run = sim.make_langevin_runner(dt, 300.0, 0.0, neighbor_every=10,
                                   wu_every=wu_every)
    # total energy at boundaries: PE from the next segment's first-step
    # energy would be off by one step; evaluate PE directly instead
    import jax as _jax
    force_fn = _jax.jit(sim.force_fn())

    def e_tot(pos, vel):
        e, _, _ = force_fn(pos)
        return float(np.asarray(e)) + kinetic_energy(sim.masses, vel)

    per = nsteps // nseg
    es = [e_tot(pos, vel)]
    for s in range(nseg):
        pos, vel, key, e, diag = run(pos, vel, key, per)
        np.asarray(e)
        es.append(e_tot(pos, vel))
    es = np.asarray(es)
    t_ns = np.arange(nseg + 1) * per * dt * 1e-3
    slope = float(np.polyfit(t_ns, es, 1)[0])  # kJ/mol per ns
    return dict(e_tot=[float(x) for x in es],
                drift_kj_per_ns=slope,
                drift_rel_per_ns=slope / abs(es[0]))


def main():
    systems = [s for s in sys.argv[1:] if not s.startswith("-")] \
        or list(CONFIGS)
    nsteps = int(os.environ.get("MTS_VALIDATE_STEPS", "10000"))
    out = {}
    path = os.path.join(HERE, "mts_validation.json")
    if os.path.exists(path):  # merge across per-system invocations
        with open(path) as f:
            out = json.load(f)
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    for name in systems:
        cfg = CONFIGS[name]
        dms = load_dms(os.path.join(HERE, "data", f"{name}.dms"))
        sim = Simulation(dms, version=1, cutoff=cfg["cutoff"], dtype=dtype,
                         descreen_horizon=cfg["dh"])
        sim.set_velocities_to_temperature(300.0, seed=1)
        res = {}
        for wu in (1, 4):
            res[f"nvt_wu{wu}"] = run_nvt(sim, wu, nsteps=nsteps,
                                         seed=11 + wu)
            print(f"{name} NVT wu_every={wu}: "
                  f"T={res[f'nvt_wu{wu}']['temp_mean']:.2f}"
                  f"+-{res[f'nvt_wu{wu}']['temp_std']:.2f} K  "
                  f"PE={res[f'nvt_wu{wu}']['pe_mean']:.1f}"
                  f"+-{res[f'nvt_wu{wu}']['pe_std']:.1f}", flush=True)
        for wu in (1, 4):
            res[f"nve_wu{wu}"] = run_nve(sim, wu, nsteps=nsteps)
            print(f"{name} NVE wu_every={wu}: drift "
                  f"{res[f'nve_wu{wu}']['drift_kj_per_ns']:.3f} kJ/mol/ns "
                  f"({res[f'nve_wu{wu}']['drift_rel_per_ns']:.2e} rel)",
                  flush=True)
        out[name] = res
        with open(os.path.join(HERE, "mts_validation.json"), "w") as f:
            json.dump(out, f, indent=1)
    print("wrote benchmarks/mts_validation.json")


if __name__ == "__main__":
    main()
