"""Minimal in-process v2/v1 step-cost ratio (VERDICT r4 item 3).

Times ONLY the windowed v2 force step and the windowed + strict v1 force
steps in one process (3 jits total — the full per-part breakdown in
profile_v2.py costs ~10 jits, which the remote-compile tunnel can turn
into hours).  Usage: python benchmarks/profile_v2_ratio.py [system].
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


def _sync(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    system = sys.argv[1] if sys.argv[1:] else "trpcage_agbnp1"
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64

    sim2 = Simulation(dms, version=2, cutoff=None, dtype=dtype)
    m2 = sim2.agbnp2
    pos = jnp.asarray(sim2.positions, dtype)
    pairs_w, topo_w = sim2._v2_build(np.asarray(pos))
    fn2 = jax.jit(sim2.force_fn(pairs=pairs_w, topology=topo_w))
    t0 = time.time()
    t_v2 = timeit(fn2, pos)
    print(f"{system} n={m2.params.n} cap_ms={m2.cap_ms} "
          f"ms_sub_k={m2.ms_sub_k} pair_kernel={m2.pair_kernel}: "
          f"v2 windowed step {t_v2:.3f} ms "
          f"(compile+time {time.time()-t0:.0f}s)", flush=True)

    sim1 = Simulation(dms, version=1, cutoff=None, dtype=dtype)
    a1 = {k: jnp.asarray(v) for k, v in sim1.agbnp.arrays.items()}
    gdr1 = a1["gamma"] / sim1.agbnp.params.roffset
    pi1, pj1, pv1, _ = sim1.neighbor_fn(pos, sim1.heavy_mask,
                                        sim1.rcut_list, sim1.kmax)
    lvl1_1 = T.make_level1(pos, a1["radii_large"], a1["vol_large"], gdr1,
                           a1["ishydrogen"])
    levels1, _ = T.build_tree(lvl1_1, pi1, pj1, sim1.agbnp.caps,
                              pairs_valid=pv1, pair_rows=True)
    topo1 = T.tree_topology(levels1)
    lvl1v_1 = T.make_level1(pos, a1["radii_vdw"], a1["vol_vdw"], -gdr1,
                            a1["ishydrogen"])
    vtopo1, _ = T.compact_topology(T.rescan_volumes(topo1, lvl1v_1),
                                   sim1._ensure_vdw_caps())
    fn1 = jax.jit(sim1.force_fn(pairs=(pi1, pj1, pv1), topology=topo1,
                                vdw_topology=vtopo1))
    t_v1 = timeit(fn1, pos)
    print(f"  v1 windowed step {t_v1:.3f} ms -> v2/v1 = {t_v2/t_v1:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
