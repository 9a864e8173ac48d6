"""Isolate which MD-runner component crashes the TPU worker at 10240 atoms.

Round-4 finding: single evaluations at 10240 atoms run fine on-chip, but
the MD runner program crashes the TPU worker ("kernel fault") with or
without tile lists.  The MD window path exercises three things the
single-eval path does not: the fused two-parameterization rescan
(rescan_volumes2) + pairwise reduce (reduce_tree2), the compacted vdW
topology (compact_topology), and the integrator scan.  This script jits
each in isolation at the same scale, smallest program first, printing a
checkpoint after each so the crashing stage is identified by the last
line reached.

Usage: python benchmarks/isolate_md10k.py [natoms] [stage...]
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

from benchmarks.synthetic_scale import synthetic_system
from openmm_agbnp_plugin_tpu.models.agbnp_jax import AGBNPModel, prepare_arrays
from openmm_agbnp_plugin_tpu.models.oracle import AGBNPParams
from openmm_agbnp_plugin_tpu.ops import tree as T


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def main():
    natoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    stages = set(sys.argv[2:]) or {"rescan2", "compact", "window"}
    pos, radius, gamma, alpha, charge, ish = synthetic_system(natoms)
    params = AGBNPParams(radius=radius, gamma=gamma, alpha=alpha,
                        charge=charge, ishydrogen=ish)
    m = AGBNPModel(params, version=1, cutoff=1.0, dtype=np.float32,
                   positions=pos, pair_tiles=False)
    a = {k: jnp.asarray(v) for k, v in m.arrays.items()}
    q = jnp.asarray(pos, np.float32)
    print(f"n={natoms} caps={m.caps.caps}", flush=True)

    gamma_dr = a["gamma"] / m.params.roffset
    lvl1_l = T.make_level1(q, a["radii_large"], a["vol_large"], gamma_dr,
                           a["ishydrogen"])
    lvl1_v = T.make_level1(q, a["radii_vdw"], a["vol_vdw"], -gamma_dr,
                           a["ishydrogen"])

    from openmm_agbnp_plugin_tpu.ops.neighbors import cell_neighbor_pairs
    t0 = time.time()

    @jax.jit
    def build(q):
        pi, pj, pv, nbmax = cell_neighbor_pairs(
            q, a["ishydrogen"] == 0, m.neighbor_rcut, m.neighbor_kmax,
            grid=m.neighbor_grid)
        lvl1 = T.make_level1(q, a["radii_large"], a["vol_large"], gamma_dr,
                             a["ishydrogen"])
        levels, diag = T.build_tree(lvl1, pi, pj, m.caps, pairs_valid=pv,
                                    pair_rows=True)
        return T.tree_topology(levels), diag

    topo, diag = build(q)
    sync(diag)
    print(f"STAGE build ok ({time.time()-t0:.0f}s)", flush=True)

    if "rescan2" in stages:
        t0 = time.time()

        @jax.jit
        def rescan2(q):
            l1l = T.make_level1(q, a["radii_large"], a["vol_large"],
                                gamma_dr, a["ishydrogen"])
            l1v = T.make_level1(q, a["radii_vdw"], a["vol_vdw"], -gamma_dr,
                                a["ishydrogen"])
            ll, lv = T.rescan_volumes2(topo, l1l, l1v)
            r1, r2 = T.reduce_tree2(ll, lv, l1l, l1v)
            return r1["energy"], r2["energy"], r1["dr"], r2["dr"]

        out = rescan2(q)
        sync(out)
        print(f"STAGE rescan2 ok ({time.time()-t0:.0f}s) "
              f"e1={float(out[0]):.1f} e2={float(out[1]):.1f}", flush=True)

    if "compact" in stages:
        t0 = time.time()
        vdw_caps = tuple(max(128, c // 4) for c in m.caps.caps)

        @jax.jit
        def compact(q):
            l1v = T.make_level1(q, a["radii_vdw"], a["vol_vdw"], -gamma_dr,
                                a["ishydrogen"])
            lv = T.rescan_volumes(topo, l1v)
            vt, counts = T.compact_topology(lv, vdw_caps, relax=0.5)
            red = T.reduce_tree(T.rescan_volumes(vt, l1v), l1v,
                                with_selfvol=False)
            return counts, red["energy"]

        out = compact(q)
        sync(out)
        print(f"STAGE compact ok ({time.time()-t0:.0f}s) "
              f"counts={np.asarray(out[0])}", flush=True)

    if "window" in stages:
        from types import SimpleNamespace
        from openmm_agbnp_plugin_tpu.md.simulation import Simulation

        sysns = SimpleNamespace(
            agbnp_radius=radius, agbnp_gamma=gamma, agbnp_alpha=alpha,
            charges=charge, ishydrogen=ish, positions=pos,
            velocities=np.zeros_like(pos),
            masses=np.where(ish > 0, 1.008, 12.011))
        for label, kw in [
            ("window_vdwc_off", dict(vdw_compact=False)),
            ("window_default", dict()),
        ]:
            t0 = time.time()
            sim = Simulation(sysns, version=1, cutoff=1.0, dtype=np.float32,
                             include_mm=False, pair_tiles=False)
            res = sim.benchmark_langevin(nsteps=10, neighbor_every=5,
                                         scan_unroll=1, warmup=False, **kw)
            print(f"STAGE {label} ok ({time.time()-t0:.0f}s) "
                  f"{res['ns_day']:.2f} ns/day "
                  f"({1e3*res['elapsed_s']/10:.0f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
