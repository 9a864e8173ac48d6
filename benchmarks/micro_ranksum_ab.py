"""On-hardware A/B for the rank-space MXU kernels (ops/pallas/ranksum.py).

Builds the real system topology once (rank info attached), then times the
two hot fixed-topology passes — the cavity sweep (rescan_volumes2 +
reduce_tree2) and the WU force pass (rescan_gammas + reduce_tree) — with
RANKSUM_MODE "on" vs "off", and checks numerical parity on the real data.

Run on TPU:  python benchmarks/micro_ranksum_ab.py [system] [reps]
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
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, length=reps)
        return out
    jax.block_until_ready(loop(x0))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32
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

    lvl1_l = T.make_level1(pos, jnp.asarray(a["radii_large"]),
                           jnp.asarray(a["vol_large"]), gdr,
                           jnp.asarray(a["ishydrogen"]))
    lvl1_v = T.make_level1(pos, jnp.asarray(a["radii_vdw"]),
                           jnp.asarray(a["vol_vdw"]), -gdr,
                           jnp.asarray(a["ishydrogen"]))

    on_mode = ("on" if jax.devices()[0].platform == "tpu" else "interpret")
    T.RANKSUM_MODE = on_mode   # attach rank info at build
    levels, _ = jax.jit(lambda: T.build_tree(
        lvl1_l, pi, pj, caps, pairs_valid=pv, pair_rows=True))()
    topo = T.tree_topology(levels)
    lb = jax.jit(lambda: T.rescan_volumes2(topo, lvl1_l, lvl1_v)[1])()
    gwu = jnp.ones(dms.n, dtype)

    def cavity(p):
        # rebuild the packed level-1 tables from the carried positions so
        # the whole pass depends on the scan carry (no hoisting)
        l1a = T.make_level1(p, jnp.asarray(a["radii_large"]),
                            jnp.asarray(a["vol_large"]), gdr,
                            jnp.asarray(a["ishydrogen"]))
        l1b = T.make_level1(p, jnp.asarray(a["radii_vdw"]),
                            jnp.asarray(a["vol_vdw"]), -gdr,
                            jnp.asarray(a["ishydrogen"]))
        la, lvb = T.rescan_volumes2(topo, l1a, l1b)
        ra, rb = T.reduce_tree2(la, lvb, l1a, l1b)
        return p + 1e-30 * (ra["energy"] + rb["energy"])

    def wu(g):
        l1 = {**lvl1_v, "gamma1i": g}
        r = T.reduce_tree(T.rescan_gammas(lb, l1), l1, with_selfvol=False)
        return g + 1e-30 * (r["dr"][:, 0] + r["energy"])

    def wu_val(g):
        l1 = {**lvl1_v, "gamma1i": g}
        r = T.reduce_tree(T.rescan_gammas(lb, l1), l1, with_selfvol=False)
        return r["energy"], r["dr"]

    results = {}
    for mode in ("off", on_mode):
        T.RANKSUM_MODE = mode
        e, dr = jax.jit(wu_val)(gwu)
        results[mode] = (float(e), np.asarray(dr))
        t_wu = scan_time(wu, gwu, reps)
        t_cav = scan_time(cavity, pos, reps)
        print(f"mode={mode:4s}  WU pass: {t_wu:7.3f} ms   "
              f"cavity pass: {t_cav:7.3f} ms")

    e0, d0 = results["off"]
    e1, d1 = results[on_mode]
    rel = np.max(np.abs(d1 - d0)) / max(1e-30, np.max(np.abs(d0)))
    print(f"parity: energy {e0:.6f} vs {e1:.6f}   dr max rel {rel:.3e}")


if __name__ == "__main__":
    main()
