"""A/B the compacted WU gamma-rescan pass (same process, consecutive runs).

Usage: python benchmarks/micro_vdw_compact.py [system ...] [--steps N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openmm_agbnp_plugin_tpu.io.dms import load_dms
from openmm_agbnp_plugin_tpu.md.simulation import Simulation


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = 1000
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            steps = int(a.split("=")[1])
    here = os.path.dirname(os.path.abspath(__file__))
    for system in args or ["1li2_agbnp1", "2clr_agbnp1"]:
        dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
        dtype = np.float32 if jax.devices()[0].platform != "cpu" \
            else np.float64
        sim = Simulation(dms, version=1, cutoff=1.0, dtype=dtype, skin=0.25,
                         descreen_horizon="cutoff")
        rows = []
        for wu in (False, True, False, True):
            res = sim.benchmark_langevin(nsteps=steps, neighbor_every=40,
                                         vdw_compact=wu)
            rows.append((wu, res["ns_day"]))
            print(f"{system} vdw_compact={wu}: {res['ns_day']:.2f} ns/day "
                  f"({res['elapsed_s'] * 1e3 / steps:.3f} ms/step)")
        off = np.mean([r[1] for r in rows if not r[0]])
        on = np.mean([r[1] for r in rows if r[0]])
        print(f"{system}: OFF {off:.2f} -> ON {on:.2f} ns/day "
              f"({on / off - 1:+.1%})")


if __name__ == "__main__":
    main()
