"""Continuous >=1k-step 10,240-atom MD through Simulation.run_md.

VERDICT r4 item 4: the large-N window-median protocol hides rebuild
amortization and host-sync costs that the small systems' wall-clock
numbers pay.  This runs ONE continuous run_md (segmented loop + exact
PanicButton segment retries + checkpoint after every clean segment — the
production shape at this scale) and reports BOTH the end-to-end wall-clock
ns/day and the per-window median, plus the regrow count and an energy-
trace finiteness check, then exercises checkpoint/restart at this scale.

Usage: python benchmarks/synth_md_long.py [natoms] [nsteps]
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

from types import SimpleNamespace

from benchmarks.synthetic_scale import synthetic_system
from openmm_agbnp_plugin_tpu.md.simulation import Simulation


def build_sim(natoms, dtype):
    pos, radius, gamma, alpha, charge, ish = synthetic_system(natoms)
    sysns = SimpleNamespace(
        agbnp_radius=radius, agbnp_gamma=gamma, agbnp_alpha=alpha,
        charges=charge, ishydrogen=ish, positions=pos,
        velocities=np.zeros_like(pos),
        masses=np.where(ish > 0, 1.008, 12.011))
    return Simulation(sysns, version=1, cutoff=1.0, dtype=dtype,
                      include_mm=False)


def main():
    natoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    ne = 20
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    ckpt = os.path.join("/tmp", f"synth{natoms}_ck.npz")

    t0 = time.time()
    sim = build_sim(natoms, dtype)
    sim.set_velocities_to_temperature(300.0, seed=1)
    print(f"n={natoms} init {time.time()-t0:.0f}s", flush=True)

    # short heat + capacity-converge phase (not timed as production):
    # thermalizes and lets the PanicButton find steady capacities so the
    # continuous run's wall clock is not dominated by warm-up recompiles
    heat = sim.run_md(6 * ne, dt=0.001, neighbor_every=ne, segment=ne,
                      scan_unroll=1, max_regrow=12)
    sim.positions = heat["final_pos"]
    sim.velocities = heat["final_vel"]
    print(f"heat: {heat['regrows']} regrows", flush=True)

    t0 = time.perf_counter()
    res = sim.run_md(nsteps, dt=0.001, neighbor_every=ne, segment=ne,
                     scan_unroll=1, max_regrow=12,
                     checkpoint_path=ckpt)
    wall = time.perf_counter() - t0
    e = np.asarray(res["energies"])
    print(f"continuous {nsteps} steps: wall {wall:.1f}s -> "
          f"{res['ns_day']:.3f} ns/day end-to-end "
          f"({1e3*res['elapsed_s']/nsteps:.1f} ms/step), "
          f"regrows={res['regrows']}, overflow={res['overflow']}, "
          f"energies finite={bool(np.isfinite(e).all())}", flush=True)

    # checkpoint/restart at scale: resume the last segment boundary and
    # verify the restarted step runs clean from the saved state
    from openmm_agbnp_plugin_tpu.io.checkpoint import load_checkpoint
    ck = load_checkpoint(ckpt)
    res2 = sim.run_md(ne, dt=0.001, neighbor_every=ne, segment=ne,
                      scan_unroll=1, pos=ck["positions"],
                      vel=ck["velocities"], key=ck["key"])
    print(f"restart from step {ck['step']}: ran {ne} more steps clean "
          f"(overflow={res2['overflow']}), checkpoint/resume OK",
          flush=True)

    import json
    out = dict(natoms=natoms, nsteps=nsteps,
               ns_day_wallclock=round(res["ns_day"], 3),
               ms_step=round(1e3 * res["elapsed_s"] / nsteps, 2),
               regrows=int(res["regrows"]), overflow=bool(res["overflow"]),
               heat_regrows=int(heat["regrows"]))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"synth_md_long_{natoms}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
