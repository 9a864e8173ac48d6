"""Marginal-cost bisection of the AGBNP1 tree passes.

Times nested supersets of the fixed-topology pipeline in-scan so each
stage's marginal cost is a difference of two measurements that share the
same jit context (micro_gamma.py's materialized-closure numbers were not
comparable to the fused MD path):

  a) rescan2                      (parent/atom gathers + cand math)
  b) a + reduce2                  (+ cavity upward scatters + deposit)
  c) b + WU chain                 (+ 7 dependent [cap,8] gathers)
  d) b + WU chain + WU reduce     (the full MD tree work)
  e) b + WU reduce w/ fixed gamma (isolates the chain's contribution)

Usage: python benchmarks/micro_wu.py [system] [reps]
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
from openmm_agbnp_plugin_tpu.ops.neighbors import half_neighbor_pairs


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
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=None, dtype=dtype, skin=0.25)
    a = sim.agbnp.arrays
    caps = sim.agbnp.caps
    pos0 = jnp.asarray(dms.positions, dtype)
    roffset = sim.agbnp.params.roffset
    print(f"n={dms.n} caps={caps.caps} platform={jax.devices()[0].platform}")

    gdr = jnp.asarray(a["gamma"]) / roffset
    pi, pj, pv, _ = jax.jit(lambda p: half_neighbor_pairs(
        p, sim.heavy_mask, sim.rcut_list, sim.kmax))(pos0)

    def lvl1s(pos):
        ll = T.make_level1(pos, jnp.asarray(a["radii_large"]),
                           jnp.asarray(a["vol_large"]), gdr,
                           jnp.asarray(a["ishydrogen"]))
        lv = T.make_level1(pos, jnp.asarray(a["radii_vdw"]),
                           jnp.asarray(a["vol_vdw"]), -gdr,
                           jnp.asarray(a["ishydrogen"]))
        return ll, lv

    ll0, _ = lvl1s(pos0)
    levels, diag = jax.jit(lambda: T.build_tree(
        ll0, pi, pj, caps, pairs_valid=pv, pair_rows=True))()
    print("counts:", np.asarray(diag["counts"]))
    topo = T.tree_topology(levels)
    topo = jax.tree.map(lambda x: x, topo)

    gwu0 = jnp.asarray(np.random.RandomState(0).rand(dms.n), dtype)

    def fb(pos, *xs):
        """Feed a tiny function of xs back into pos so scan iterations are
        dependent and nothing is DCE'd."""
        s = sum(jnp.sum(x) if x.ndim <= 1 else jnp.sum(x[:, 0]) for x in xs)
        return pos + 1e-30 * s

    def a_rescan2(pos):
        ll, lv = lvl1s(pos)
        la, lb = T.rescan_volumes2(topo, ll, lv)
        return fb(pos, *(l["volume"] for l in la), *(l["volume"] for l in lb))

    def b_reduce2(pos):
        ll, lv = lvl1s(pos)
        la, lb = T.rescan_volumes2(topo, ll, lv)
        r1, r2 = T.reduce_tree2(la, lb, ll, lv)
        return fb(pos, r1["dr"], r2["dr"], r2["self_volume"])

    def c_chain(pos):
        ll, lv = lvl1s(pos)
        la, lb = T.rescan_volumes2(topo, ll, lv)
        r1, r2 = T.reduce_tree2(la, lb, ll, lv)
        gwu = gwu0 * (1.0 + 1e-30 * r2["self_volume"])  # real dependency
        lwu = {**lv, "gamma1i": gwu}
        nl = T.rescan_gammas(lb, lwu)
        return fb(pos, r1["dr"], r2["dr"], *(l["gamma1i"] for l in nl))

    def d_full(pos):
        ll, lv = lvl1s(pos)
        la, lb = T.rescan_volumes2(topo, ll, lv)
        r1, r2 = T.reduce_tree2(la, lb, ll, lv)
        gwu = gwu0 * (1.0 + 1e-30 * r2["self_volume"])
        lwu = {**lv, "gamma1i": gwu}
        rw = T.reduce_tree(T.rescan_gammas(lb, lwu), lwu, with_selfvol=False)
        return fb(pos, r1["dr"], r2["dr"], rw["dr"])

    def e_fixedg(pos):
        ll, lv = lvl1s(pos)
        la, lb = T.rescan_volumes2(topo, ll, lv)
        r1, r2 = T.reduce_tree2(la, lb, ll, lv)
        gwu = gwu0 * (1.0 + 1e-30 * r2["self_volume"])
        lwu = {**lv, "gamma1i": gwu}
        # reduce with per-node gammas taken from lb (no chain)
        rw = T.reduce_tree(lb, lwu, with_selfvol=False)
        return fb(pos, r1["dr"], r2["dr"], rw["dr"])

    results = {}
    for name, f in (("a_rescan2", a_rescan2), ("b_+reduce2", b_reduce2),
                    ("c_+chain", c_chain), ("d_+wu_reduce", d_full),
                    ("e_b+wured_nochain", e_fixedg)):
        ms = scan_time(f, pos0, reps)
        results[name] = ms
        print(f"{name:20s}: {ms:7.3f} ms")

    print()
    print(f"marginal reduce2     : {results['b_+reduce2'] - results['a_rescan2']:7.3f} ms")
    print(f"marginal chain       : {results['c_+chain'] - results['b_+reduce2']:7.3f} ms")
    print(f"marginal wu reduce   : {results['d_+wu_reduce'] - results['c_+chain']:7.3f} ms")
    print(f"marginal wured alone : {results['e_b+wured_nochain'] - results['b_+reduce2']:7.3f} ms")


if __name__ == "__main__":
    main()
