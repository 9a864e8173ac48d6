"""A/B micro-benchmark: scatter segment_sum vs sorted-segment scan for the
tree's upward reductions, measured in-scan (dependent iterations inside one
jit) on the real topology of a shipped system.

Usage: python benchmarks/micro_segsum.py [system] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openmm_agbnp_plugin_tpu.io.dms import load_dms
from openmm_agbnp_plugin_tpu.md.simulation import Simulation
from openmm_agbnp_plugin_tpu.ops import tree as T


def scan_time(fn, x0, reps, n=5):
    """ms per rep of fn, chained inside one jit (defeats dispatch floor)."""
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, length=reps)
        return out
    jax.block_until_ready(loop(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(loop(x0))
    return (time.perf_counter() - t0) / (n * reps) * 1e3


def strip_bnd(topo):
    return tuple({k: v for k, v in t.items() if k != "bnd"} for t in topo)


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=None, dtype=dtype, skin=0.25)
    a = sim.agbnp.arrays
    caps = sim.agbnp.caps
    pos = jnp.asarray(dms.positions, dtype)
    roffset = sim.agbnp.params.roffset
    print(f"n={dms.n} caps={caps.caps} platform={jax.devices()[0].platform}")

    gdr = jnp.asarray(a["gamma"]) / roffset
    from openmm_agbnp_plugin_tpu.ops.neighbors import half_neighbor_pairs
    pi, pj, pv, _ = jax.jit(lambda p: half_neighbor_pairs(
        p, sim.heavy_mask, sim.rcut_list, sim.kmax))(pos)

    def build(p):
        lvl1 = T.make_level1(p, jnp.asarray(a["radii_large"]),
                             jnp.asarray(a["vol_large"]), gdr,
                             jnp.asarray(a["ishydrogen"]))
        return T.build_tree(lvl1, pi, pj, caps, pairs_valid=pv,
                            pair_rows=True)
    levels, diag = jax.jit(build)(pos)
    print("counts:", np.asarray(diag["counts"]))
    topo_scan = T.tree_topology(levels)     # carries bnd -> sorted scan
    topo_scat = strip_bnd(topo_scan)        # no bnd -> scatter

    lvl1_l = T.make_level1(pos, jnp.asarray(a["radii_large"]),
                           jnp.asarray(a["vol_large"]), gdr,
                           jnp.asarray(a["ishydrogen"]))
    lvl1_v = T.make_level1(pos, jnp.asarray(a["radii_vdw"]),
                           jnp.asarray(a["vol_vdw"]), -gdr,
                           jnp.asarray(a["ishydrogen"]))

    for name, topo in (("scatter", topo_scat), ("sortscan", topo_scan)):
        def step(p, topo=topo):
            la, lb = T.rescan_volumes2(topo, lvl1_l, lvl1_v)
            r1, r2 = T.reduce_tree2(la, lb, lvl1_l, lvl1_v)
            # feed the result back so iterations are dependent
            return p + 0.0 * (r1["dr"] + r2["dr"])
        ms = scan_time(step, pos, reps)
        print(f"rescan2+reduce2 [{name}]: {ms:.3f} ms")

    # WU gamma pass A/B (rescan_gammas + reduce_tree)
    gwu = jnp.ones(dms.n, dtype)
    for name, topo in (("scatter", topo_scat), ("sortscan", topo_scan)):
        lb = jax.jit(lambda topo=topo: T.rescan_volumes2(
            topo, lvl1_l, lvl1_v)[1])()

        def gp(g, lb=lb):
            l1 = {**lvl1_v, "gamma1i": g}
            red = T.reduce_tree(T.rescan_gammas(lb, l1), l1,
                                with_selfvol=False)
            return g + 0.0 * red["dr"][:, 0]
        print(f"gamma rescan+reduce [{name}]: {scan_time(gp, gwu, reps):.3f} ms")

    # rebuild-boundary cost (bnd rides the build for free now)
    def bt(p):
        levels, _ = build(p)
        topo = T.tree_topology(levels)
        return p + 0.0 * topo[0]["valid"][0].astype(p.dtype)
    print(f"build+topology: {scan_time(bt, pos, 5):.3f} ms")


if __name__ == "__main__":
    main()
