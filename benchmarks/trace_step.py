"""Device-trace attribution of the fused MD step by source line.

Runs a short windowed Langevin segment under jax.profiler.trace, parses the
TPU trace protobuf/JSON, and aggregates leaf-op durations by the Python
source line recorded in each event's metadata — the only reliable way to
attribute time inside one fused jit on this runtime (standalone jit timings
carry a 0.7-2 ms dispatch floor).

Usage: python benchmarks/trace_step.py [system] [nsteps]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=1.0, dtype=dtype, skin=0.25)
    run = sim.make_langevin_runner(neighbor_every=20)
    key = jax.random.PRNGKey(0)
    pos, vel = sim.positions, sim.velocities
    out = run(pos, vel, key, nsteps)  # compile + warm
    jax.block_until_ready(out[0])

    tdir = "/tmp/agbnp_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        out = run(pos, vel, key, nsteps)
        jax.block_until_ready(out[0])

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace files under {tdir}"
    agg = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            args = ev.get("args") or {}
            src = args.get("source") or ""
            dur = float(ev.get("dur", 0.0))
            # keep only device-lane leaf ops (they carry source attribution)
            if not src:
                continue
            agg[src] += dur
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"total attributed device time: {total / 1e3:.2f} ms "
          f"over {nsteps} steps -> {total / nsteps:.1f} us/step")
    for src, dur in rows[:40]:
        print(f"{dur / nsteps:9.1f} us/step  {src}")


if __name__ == "__main__":
    main()
