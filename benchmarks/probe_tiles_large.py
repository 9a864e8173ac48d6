"""Probe: interacting-tile-list kernels at >8k atoms on the real chip.

Round-4 gated the tile lists OFF above 8192 atoms after worker crashes at
10,240; round-5 root-causes that.  Stages, smallest program first, with a
checkpoint print after each so the crashing stage is identified by the
last line reached (same method as isolate_md10k.py):

  1. single energy_forces eval, tile lists forced, save-Q/dQ as configured
  2. same with the Q/dQ save path forced off (AGBNP_TILES_NO_QD=1)
  3. one 20-step MD window through make_langevin_runner
  4. repeat timing windows (steady-state ms/step, tiles vs dense)

Usage: python benchmarks/probe_tiles_large.py [natoms] [stage...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.synthetic_scale import synthetic_system
from openmm_agbnp_plugin_tpu.models.agbnp_jax import AGBNPModel
from openmm_agbnp_plugin_tpu.models.oracle import AGBNPParams


def main():
    natoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    stages = set(sys.argv[2:]) or {"eval", "window", "steady"}
    pos, radius, gamma, alpha, charge, ish = synthetic_system(natoms)
    params = AGBNPParams(radius=radius, gamma=gamma, alpha=alpha,
                         charge=charge, ishydrogen=ish)

    t0 = time.time()
    m = AGBNPModel(params, version=1, cutoff=1.0, dtype=np.float32,
                   positions=pos, pair_tiles=True)
    print(f"n={natoms} init {time.time()-t0:.0f}s tiles={m.pair_tiles} "
          f"caps={m.caps.caps}", flush=True)

    if "eval" in stages:
        t0 = time.time()
        for _ in range(6):
            e, f, out = m.energy_forces(pos, with_details=True)
            if not m.check_and_grow(out["diag"]):
                break
        jax.block_until_ready(f)
        print(f"STAGE eval ok ({time.time()-t0:.0f}s) E={float(e):.2f} "
              f"finite={bool(np.isfinite(np.asarray(f)).all())}", flush=True)
        t0 = time.time()
        for _ in range(5):
            e, f = m.energy_forces(pos)
        jax.block_until_ready(f)
        print(f"  steady eval {(time.time()-t0)/5*1e3:.1f} ms", flush=True)

    if "window" in stages or "steady" in stages:
        from types import SimpleNamespace

        from openmm_agbnp_plugin_tpu.md.simulation import Simulation

        sysns = SimpleNamespace(
            agbnp_radius=radius, agbnp_gamma=gamma, agbnp_alpha=alpha,
            charges=charge, ishydrogen=ish, positions=pos,
            velocities=np.zeros_like(pos),
            masses=np.where(ish > 0, 1.008, 12.011))
        sim = Simulation(sysns, version=1, cutoff=1.0, dtype=np.float32,
                         include_mm=False, pair_tiles=True)
        run = sim.make_langevin_runner(0.001, 300.0, 1.0,
                                       neighbor_every=20, scan_unroll=1)
        sim.set_velocities_to_temperature(300.0, seed=1)
        key = jax.random.PRNGKey(0)
        pvk = (sim.positions, sim.velocities, key)
        t0 = time.time()
        for attempt in range(8):
            out = run(*pvk, 20)
            counts = np.asarray(out[4][0])
            rep = sim.overflow_report(counts, out[4][1],
                                      np.asarray(out[4][2]),
                                      np.asarray(out[4][3]))
            if not rep:
                pvk = (out[0], out[1], out[2])
                break
            print(f"  window overflow {rep}: regrow", flush=True)
            sim._regrow(counts, out[4][1], np.asarray(out[4][2]),
                        wu=np.asarray(out[4][3]))
            run = sim.make_langevin_runner(0.001, 300.0, 1.0,
                                           neighbor_every=20, scan_unroll=1)
        print(f"STAGE window ok ({time.time()-t0:.0f}s) "
              f"tiles={sim.agbnp.pair_tiles}", flush=True)

        if "steady" in stages:
            times = []
            for w in range(6):
                t0 = time.perf_counter()
                out = run(*pvk, 20)
                np.asarray(out[4][0])
                times.append(time.perf_counter() - t0)
                pvk = (out[0], out[1], out[2])
            med = float(np.median(times))
            print(f"STAGE steady ok {med/20*1e3:.1f} ms/step "
                  f"(median of {len(times)} windows)", flush=True)


if __name__ == "__main__":
    main()
