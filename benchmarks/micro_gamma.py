"""Decompose the WU gamma-pass cost: rescan_gammas (top-down chain) vs
reduce_tree (bottom-up force sweep), each in-scan on the real topology.

Usage: python benchmarks/micro_gamma.py [system] [reps]
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
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(loop(x0))
    return (time.perf_counter() - t0) / (n * reps) * 1e3


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
    print(f"n={dms.n} caps={caps.caps}")

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

    def build(p):
        return T.build_tree(lvl1_l, pi, pj, caps, pairs_valid=pv,
                            pair_rows=True)
    levels, _ = jax.jit(build)(pos)
    topo = T.tree_topology(levels)
    lb = jax.jit(lambda: T.rescan_volumes2(topo, lvl1_l, lvl1_v)[1])()
    lb = jax.tree.map(lambda x: x, lb)  # materialize

    gwu = jnp.ones(dms.n, dtype)

    # (a) rescan_gammas alone
    def chain(g):
        l1 = {**lvl1_v, "gamma1i": g}
        nl = T.rescan_gammas(lb, l1)
        return g + 1e-30 * sum(l["gamma1i"][0] for l in nl)
    print(f"rescan_gammas alone: {scan_time(chain, gwu, reps):.3f} ms")

    # (b) reduce_tree alone (fixed gamma levels)
    def red(g):
        l1 = {**lvl1_v, "gamma1i": g}
        lv = tuple({**l, "gamma1i": l["gamma1i"] + 1e-30 * g[0]}
                   for l in lb)
        r = T.reduce_tree(lv, l1, with_selfvol=False)
        return g + 1e-30 * r["dr"][:, 0]
    print(f"reduce_tree alone:  {scan_time(red, gwu, reps):.3f} ms")

    # (c) both (the full WU pass)
    def both(g):
        l1 = {**lvl1_v, "gamma1i": g}
        r = T.reduce_tree(T.rescan_gammas(lb, l1), l1, with_selfvol=False)
        return g + 1e-30 * r["dr"][:, 0]
    print(f"chain+reduce:       {scan_time(both, gwu, reps):.3f} ms")

    # (d) pure pmono-gather sweep (7 dependent sorted gathers, [rows, 8])
    def gsweep(g):
        n = g.shape[0]
        x = jnp.concatenate([g[:, None], jnp.zeros((n, 7), g.dtype)], axis=1)
        acc = 0.0
        for l in lb:
            x = x.at[l["bnd"]["pmono"]].get(indices_are_sorted=True)
            acc = acc + x[0, 0]
        return g + 1e-30 * acc
    print(f"pmono gathers only: {scan_time(gsweep, gwu, reps):.3f} ms")

    # (e) atom gathers only (7 independent [rows, 8] gathers)
    def asweep(g):
        n = g.shape[0]
        x = jnp.concatenate([g[:, None], jnp.zeros((n, 7), g.dtype)], axis=1)
        acc = 0.0
        for l in lb:
            acc = acc + x[l["atom"]][0, 0]
        return g + 1e-30 * acc
    print(f"atom gathers only:  {scan_time(asweep, gwu, reps):.3f} ms")


if __name__ == "__main__":
    main()
