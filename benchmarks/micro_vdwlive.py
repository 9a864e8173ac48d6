"""Measure the vdW-live row fraction of the overlap tree.

The build topology uses LARGE radii (r + 0.05 nm); the WU gamma-rescan
force pass runs on the vdW-radii rescan of that topology, where any row
whose switched volume is zero (sgvol < VOLMINA) contributes exactly
nothing (volume, sfp, dv1, dvv1 all carry the switch factor).  This
micro reports, per level: valid rows, vdW-live rows (volume > 0), and
the ancestor-closed kept set (live rows plus all their ancestors — the
set a compacted WU pass must retain so parent gathers and the gamma
chain stay intact).  A low kept fraction motivates compacting the WU
pass; a high one kills the idea.

Usage: python benchmarks/micro_vdwlive.py [system ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openmm_agbnp_plugin_tpu.io.dms import load_dms
from openmm_agbnp_plugin_tpu.md.simulation import Simulation
from openmm_agbnp_plugin_tpu.models.agbnp_jax import tree_passes


def report(system):
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=1.0, dtype=dtype, skin=0.25)
    a = sim.agbnp.arrays
    caps = sim.agbnp.caps
    pos = jnp.asarray(dms.positions, dtype)
    roffset = sim.agbnp.params.roffset

    from openmm_agbnp_plugin_tpu.ops.neighbors import half_neighbor_pairs
    pi, pj, pv, _ = jax.jit(lambda p: half_neighbor_pairs(
        p, sim.heavy_mask, sim.rcut_list, sim.kmax))(pos)
    a = {**a, "pairs_i": pi, "pairs_j": pj, "pairs_valid": pv}
    out = jax.jit(lambda p: tree_passes(a, p, caps, roffset,
                                        pair_rows=True))(pos)
    levels_vdw = out[3]

    valid = [np.asarray(l["valid"]) for l in levels_vdw]
    vol = [np.asarray(l["volume"]) for l in levels_vdw]
    pm = [np.asarray(l["bnd"]["pmono"]) for l in levels_vdw]

    live = [va & (v > 0) for va, v in zip(valid, vol)]
    # ancestor closure: a kept row is live or has a kept descendant
    kept = [lv.copy() for lv in live]
    for li in range(len(kept) - 1, 0, -1):
        up = np.zeros(valid[li - 1].shape[0], bool)
        np.maximum.at(up, pm[li], kept[li])
        kept[li - 1] |= up & valid[li - 1]

    tv = tl = tk = 0
    print(f"\n{system}: n={dms.n}")
    for li in range(len(valid)):
        nv, nl, nk = int(valid[li].sum()), int(live[li].sum()), int(
            kept[li].sum())
        tv, tl, tk = tv + nv, tl + nl, tk + nk
        if nv:
            print(f"  level {li + 2}: valid {nv:7d}  vdw-live {nl:7d} "
                  f"({nl / nv:5.1%})  kept {nk:7d} ({nk / nv:5.1%})")
    print(f"  TOTAL   : valid {tv:7d}  vdw-live {tl:7d} ({tl / tv:5.1%})  "
          f"kept {tk:7d} ({tk / tv:5.1%})")


if __name__ == "__main__":
    for s in (sys.argv[1:] or ["1li2_agbnp1", "2clr_agbnp1"]):
        report(s)
