"""Per-phase timing of the AGBNP2 (version 2) MD step.

Times the v2 building blocks in isolation under jit — atomic cavity
fwd/bwd, MS particle lifecycle + free volumes, MS cavity fwd/bwd, the
GB/vdW pair phases under autodiff — plus the fused full force step, to
locate where the v2 forward cost lives (VERDICT r3 item 4: target v2 step
<= 2.5x a v1 step).  Usage: python benchmarks/profile_v2.py [system].
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
from openmm_agbnp_plugin_tpu.models import agbnp2_jax as V2
from openmm_agbnp_plugin_tpu.ops import born as B
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
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    system = args[0] if args else "trpcage_agbnp1"
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    pk = None
    if "--kernels" in sys.argv:
        pk = True
    if "--nokernels" in sys.argv:
        pk = False
    sim = Simulation(dms, version=2, cutoff=None, dtype=dtype,
                     pair_kernel=pk)
    m2 = sim.agbnp2
    print(f"v2 pair_kernel={m2.pair_kernel}", flush=True)
    pos = jnp.asarray(sim.positions, dtype)
    a = {k: jnp.asarray(v) for k, v in m2.arrays.items()}

    # window build: frozen topology + MS compaction (the MD window mode)
    pairs_w, topo_w = sim._v2_build(np.asarray(pos))
    topo, _ = topo_w

    # full v2 force step (stale-window mode), as the MD loop runs it
    fn = sim.force_fn(pairs=pairs_w, topology=topo_w)
    full = timeit(jax.jit(fn), pos)
    print(f"n={m2.params.n} cap_ms={m2.cap_ms} full v2 force step: "
          f"{full:.3f} ms")

    gamma_dr = a["gamma"] / m2.params.roffset
    lvl1_args = (a["radii_large"], a["vol_large"], a["radii_vdw"],
                 a["vol_vdw"], gamma_dr,
                 jnp.asarray(a["ishydrogen"]).astype(pos.dtype))

    # 1. atomic cavity fwd and fwd+bwd
    at_fwd = jax.jit(lambda q: V2._atomic_cavity(q, lvl1_args,
                                                 topo["atoms"]))
    t_at_fwd = timeit(at_fwd, pos)

    def at_loss(q):
        e1, e2, svl, svv = V2._atomic_cavity(q, lvl1_args, topo["atoms"])
        return e1 + e2 + jnp.sum(svl) + jnp.sum(svv)
    t_at_grad = timeit(jax.jit(jax.value_and_grad(at_loss)), pos)

    # 2. MS lifecycle + free volumes (fwd and fwd+bwd), sv held fixed
    _, _, svl0, svv0 = at_fwd(pos)

    def ms_fv(q, svl, svv):
        ms = V2.ms_particles(q, a["radii_vdw"], pairs_w[0], pairs_w[1],
                             pairs_w[2], m2.cap_ms, idx=topo["ms_idx"],
                             count=topo["ms_count"])
        fvl = V2.ms_free_volumes(ms, q, a["radii_large"], svl,
                                 a["ishydrogen"])
        fvv = V2.ms_free_volumes(ms, q, a["radii_vdw"], svv,
                                 a["ishydrogen"])
        return ms, fvl, fvv

    t_msfv_fwd = timeit(jax.jit(ms_fv), pos, svl0, svv0)
    ms0, fvl0, fvv0 = jax.jit(ms_fv)(pos, svl0, svv0)

    def msfv_loss(q, svl, svv):
        _, fvl, fvv = ms_fv(q, svl, svv)
        return jnp.sum(fvl) + jnp.sum(fvv)
    t_msfv_grad = timeit(jax.jit(jax.value_and_grad(msfv_loss,
                                                    argnums=(0, 1, 2))),
                         pos, svl0, svv0)

    # 3. MS cavity fwd and fwd+bwd (frozen MS topology)
    gamma_ms = jnp.full(m2.cap_ms, -m2.common_gamma / m2.params.roffset,
                        pos.dtype)
    ish_ms = (1 - ms0["valid"].astype(jnp.int32)).astype(pos.dtype)

    ms_cav = jax.jit(lambda mp, fv, fl: V2._ms_cavity(
        mp, fv, fl, gamma_ms, ish_ms, topo["ms"]))
    t_mscav_fwd = timeit(ms_cav, ms0["pos"], fvv0, fvl0)

    def mscav_loss(mp, fv, fl):
        ev, el, sv = V2._ms_cavity(mp, fv, fl, gamma_ms, ish_ms, topo["ms"])
        return ev + el + jnp.sum(sv)
    t_mscav_grad = timeit(jax.jit(jax.value_and_grad(mscav_loss,
                                                     argnums=(0, 1, 2))),
                          ms0["pos"], fvv0, fvl0)

    # 4. GB/vdW pair phases under autodiff (s_factor from fixed sv)
    sv_fix = svv0

    def gb_loss(q, sv):
        s_factor = sv / a["vol_vdw_all"]
        geom = B.born_radii(q, a["radii_vdw"], s_factor, a["ishydrogen"],
                            a["type_i"], a["type_j"], a["yflat"],
                            a["y2flat"], m2.ntypes_j)
        gb = B.gb_energy(q, a["charge"], geom["born_radius"], geom,
                         cutoff=m2.cutoff)
        return (gb["gb_self"] + gb["gb_pair"]
                + B.vdw_energy(a["alpha"], geom["born_radius"]))

    t_gb_fwd = timeit(jax.jit(gb_loss), pos, sv_fix)
    t_gb_grad = timeit(jax.jit(jax.value_and_grad(gb_loss,
                                                  argnums=(0, 1))),
                       pos, sv_fix)

    # v1 comparison step in the same process — the WINDOWED per-step force
    # (fixed topology + compacted vdW channel), i.e. what the v1 MD loop
    # actually runs between rebuilds; a per-step-rebuild v1 force would
    # overstate the v1 cost and flatter the ratio
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
    vdw_caps1 = sim1._ensure_vdw_caps()
    vtopo1, _ = T.compact_topology(T.rescan_volumes(topo1, lvl1v_1),
                                   vdw_caps1)
    fn1 = sim1.force_fn(pairs=(pi1, pj1, pv1), topology=topo1,
                        vdw_topology=vtopo1)
    t_v1 = timeit(jax.jit(fn1), pos)
    # strict v1 (rebuild per step) for context
    t_v1_strict = timeit(jax.jit(sim1.force_fn()), pos)

    print(f"atomic cavity fwd: {t_at_fwd:.3f} ms   fwd+bwd: "
          f"{t_at_grad:.3f} ms")
    print(f"MS lifecycle+free-vol fwd: {t_msfv_fwd:.3f} ms   fwd+bwd: "
          f"{t_msfv_grad:.3f} ms")
    print(f"MS cavity fwd: {t_mscav_fwd:.3f} ms   fwd+bwd: "
          f"{t_mscav_grad:.3f} ms")
    print(f"GB/vdW phases fwd: {t_gb_fwd:.3f} ms   fwd+bwd: "
          f"{t_gb_grad:.3f} ms")
    print(f"sum of fwd+bwd parts: "
          f"{t_at_grad + t_msfv_grad + t_mscav_grad + t_gb_grad:.3f} ms")
    print(f"v1 windowed force step (same process): {t_v1:.3f} ms  "
          f"(strict rebuild-per-step: {t_v1_strict:.3f} ms)")
    print(f"v2/v1 = {full / t_v1:.2f}x windowed, "
          f"{full / t_v1_strict:.2f}x vs strict v1")


if __name__ == "__main__":
    main()
