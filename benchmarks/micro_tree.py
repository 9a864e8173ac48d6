"""Micro-benchmarks of the tree-op primitives on the current device.

Separates the fixed-topology sweep cost into its primitive classes (row
gather by parent, segment-sum scatter, candidate Gaussian math, stacking)
to decide what a fused kernel must replace.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openmm_agbnp_plugin_tpu.io.dms import load_dms
from openmm_agbnp_plugin_tpu.md.simulation import Simulation
from openmm_agbnp_plugin_tpu.ops import tree as T


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=None, dtype=dtype, skin=0.25)
    a = sim.agbnp.arrays
    caps = sim.agbnp.caps
    pos = jnp.asarray(dms.positions, dtype)
    roffset = sim.agbnp.params.roffset
    print(f"n={dms.n} caps={caps.caps} platform={jax.devices()[0].platform}")

    gdr = a["gamma"] / roffset
    lvl1 = T.make_level1(pos, a["radii_large"], a["vol_large"], gdr,
                         a["ishydrogen"])
    lvl1_vdw = T.make_level1(pos, a["radii_vdw"], a["vol_vdw"], -gdr,
                             a["ishydrogen"])
    from openmm_agbnp_plugin_tpu.ops.neighbors import half_neighbor_pairs
    pi, pj, pv, _ = jax.jit(lambda p: half_neighbor_pairs(
        p, sim.heavy_mask, sim.rcut_list, sim.kmax))(pos)
    levels, diag = jax.jit(lambda p: T.build_tree(
        T.make_level1(p, a["radii_large"], a["vol_large"], gdr,
                      a["ishydrogen"]), pi, pj, caps, pairs_valid=pv))(pos)
    topo = T.tree_topology(levels)
    print("counts:", np.asarray(diag["counts"]))

    # individual sweeps
    f_rescan2 = jax.jit(lambda p: T.rescan_volumes2(
        topo, T.make_level1(p, a["radii_large"], a["vol_large"], gdr,
                            a["ishydrogen"]),
        T.make_level1(p, a["radii_vdw"], a["vol_vdw"], -gdr,
                      a["ishydrogen"])))
    la, lb = f_rescan2(pos)
    print(f"rescan_volumes2: {timeit(f_rescan2, pos):.3f} ms")

    f_reduce2 = jax.jit(lambda la, lb: T.reduce_tree2(la, lb, lvl1, lvl1_vdw))
    print(f"reduce_tree2: {timeit(f_reduce2, la, lb):.3f} ms")

    f_gr = jax.jit(lambda lv: T.rescan_gammas(lv, lvl1_vdw))
    print(f"rescan_gammas: {timeit(f_gr, lb):.3f} ms")
    f_red1 = jax.jit(lambda lv: T.reduce_tree(lv, lvl1_vdw,
                                              with_selfvol=False))
    print(f"reduce_tree (1 tree): {timeit(f_red1, lb):.3f} ms")

    # primitive costs at the biggest level's size
    lmax = int(np.argmax(np.asarray(diag["counts"])))
    cap = levels[lmax]["valid"].shape[0]
    parent_cap = dms.n if lmax == 0 else levels[lmax - 1]["valid"].shape[0]
    parent = levels[lmax]["parent"]
    atom = levels[lmax]["atom"]
    prev_dat = (jnp.zeros((parent_cap, 24), dtype)
                if lmax > 0 else jnp.zeros((dms.n, 24), dtype))
    up = jnp.ones((cap, 11), dtype)

    f_gather = jax.jit(lambda d, p: d[p])
    print(f"gather [{parent_cap},24] by {cap} parents: "
          f"{timeit(f_gather, prev_dat, parent):.3f} ms")
    f_gather_at = jax.jit(lambda d, i: d[i])
    at12 = jnp.zeros((dms.n, 12), dtype)
    print(f"gather [{dms.n},12] by {cap} atoms: "
          f"{timeit(f_gather_at, at12, atom):.3f} ms")
    f_seg = jax.jit(lambda u, p: jax.ops.segment_sum(u, p,
                                                     num_segments=parent_cap))
    print(f"segment_sum [{cap},11] -> {parent_cap}: "
          f"{timeit(f_seg, up, parent):.3f} ms")

    sp = prev_dat[parent]
    a2 = jnp.zeros((cap, 12), dtype)
    f_cd = jax.jit(lambda sp, a2: T._cand_dat(sp[:, 0], sp[:, 1], sp[:, 2:5],
                                              sp[:, 11], a2[:, 0:6])[0])
    print(f"_cand_dat at cap {cap}: {timeit(f_cd, sp, a2):.3f} ms")

    # build-phase primitives
    f_nz = jax.jit(lambda m: jnp.nonzero(m, size=cap, fill_value=0)[0])
    mask = jnp.ones((cap * 2,), bool)
    print(f"nonzero {cap*2}->{cap}: {timeit(f_nz, mask):.3f} ms")
    keys = jax.random.uniform(jax.random.PRNGKey(0), (cap,))
    pk = jax.random.randint(jax.random.PRNGKey(1), (cap,), 0, parent_cap)
    f_sort = jax.jit(lambda v, p: jnp.lexsort((-v, p)))
    print(f"lexsort {cap}: {timeit(f_sort, keys, pk):.3f} ms")


if __name__ == "__main__":
    main()
