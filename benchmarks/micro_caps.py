"""A/B the MD capacity headroom (caps_boost) and rebuild window
(neighbor_every) on the headline 1li2 benchmark.

Row-indexed tree ops dominate the step and cost per ROW including the
capacity padding, so headroom is paid every step; the rebuild (neighbors +
tree build + boundary extraction) is paid once per window.

Usage: python benchmarks/micro_caps.py [system] [steps]
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
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64

    for boost, ne in ((1.25, 20), (1.10, 20), (1.25, 40), (1.10, 40)):
        sim = Simulation(dms, version=1, cutoff=1.0, dtype=dtype, skin=0.25,
                         caps_boost=boost)
        res = sim.benchmark_langevin(nsteps=steps, dt=0.001,
                                     temperature=300.0, friction=1.0,
                                     neighbor_every=ne)
        ms = 1e3 * res["elapsed_s"] / steps
        print(f"boost={boost} ne={ne}: {res['ns_day']:.2f} ns/day "
              f"({ms:.2f} ms/step) overflow={res['overflow']} "
              f"caps={sim.agbnp.caps.caps}")


if __name__ == "__main__":
    main()
