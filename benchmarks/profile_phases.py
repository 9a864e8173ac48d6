"""Per-phase timing of the AGBNP1 MD step on the current device.

Times each pipeline stage (tree rescan+reduce, Born/GB/descreening pair
phases, gamma-rescan force pass, MM forces, integrator overhead) in
isolation under jit, plus the fused full step, to locate the hot spots
before kernel work.  Usage: python benchmarks/profile_phases.py [system].
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
from openmm_agbnp_plugin_tpu.models.agbnp_jax import energy_forces, tree_passes
from openmm_agbnp_plugin_tpu.ops import born as B
from openmm_agbnp_plugin_tpu.ops import tree as T
from openmm_agbnp_plugin_tpu.ops.neighbors import half_neighbor_pairs


def _sync(out):
    """Value-fetch sync: on the remote-TPU (axon) backend
    block_until_ready can return before execution completes; fetching a
    leaf's bytes is the reliable barrier."""
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)  # device work serializes; one end fetch bounds all n
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    # bench-matching knobs: cutoff (nm | "none") and descreen horizon
    # ("cutoff" | nm | "lut"); defaults reproduce bench.py's configuration
    cutoff = sys.argv[2] if len(sys.argv) > 2 else "1.0"
    cutoff = None if cutoff == "none" else float(cutoff)
    dh = sys.argv[3] if len(sys.argv) > 3 else "cutoff"
    dh = None if dh == "lut" else ("cutoff" if dh == "cutoff" else float(dh))
    here = os.path.dirname(os.path.abspath(__file__))
    if system.startswith("synth"):
        # synthetic protein-density ball at any size: "synth10240" etc.
        from types import SimpleNamespace

        from benchmarks.synthetic_scale import synthetic_system

        posn, radius, gamma, alpha, charge, ish = synthetic_system(
            int(system[len("synth"):]))
        dms = SimpleNamespace(
            agbnp_radius=radius, agbnp_gamma=gamma, agbnp_alpha=alpha,
            charges=charge, ishydrogen=ish, positions=posn,
            velocities=np.zeros_like(posn), n=len(radius),
            masses=np.where(ish > 0, 1.008, 12.011))
        include_mm = False
    else:
        dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
        include_mm = True
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=cutoff, dtype=dtype, skin=0.25,
                     descreen_horizon=dh, include_mm=include_mm)
    a = sim.agbnp.arrays
    caps = sim.agbnp.caps
    pos = jnp.asarray(dms.positions, dtype)
    roffset = sim.agbnp.params.roffset
    ntypes_j = sim.agbnp.ntypes_j
    print(f"system={system} n={dms.n} platform={jax.devices()[0].platform}")

    # neighbor pairs + topology (rebuild-boundary work); sim.neighbor_fn
    # is the cell-grid build on large systems
    heavy = sim.heavy_mask
    nb = jax.jit(lambda p: sim.neighbor_fn(p, heavy, sim.rcut_list,
                                           sim.kmax))
    pi, pj, pv, _ = nb(pos)
    print(f"neighbors: {timeit(nb, pos):.3f} ms  (kmax={sim.kmax})")

    a2 = {**a, "pairs_i": pi, "pairs_j": pj, "pairs_valid": pv}

    gdr = a["gamma"] / roffset

    def build(p):
        lvl1 = T.make_level1(p, a["radii_large"], a["vol_large"], gdr,
                             a["ishydrogen"])
        levels, diag = T.build_tree(lvl1, pi, pj, caps, pairs_valid=pv,
                                    pair_rows=True)
        return levels
    levels = jax.jit(build)(pos)
    topo = T.tree_topology(levels)
    print(f"tree build: {timeit(jax.jit(build), pos):.3f} ms")

    # fixed-topology cavity pass (per-step fast path)
    def cavity(p):
        return tree_passes(a2, p, caps, roffset, topology=topo)[:3]
    print(f"cavity rescan+reduce2: {timeit(jax.jit(cavity), pos):.3f} ms")

    # per-step gamma rescan pass
    def _passes(p):
        out = tree_passes(a2, p, caps, roffset, topology=topo)
        return out[2], out[3], out[4]
    self_volume, levels_vdw, lvl1_vdw = jax.jit(_passes)(pos)

    def gamma_pass(p, gamma_WU):
        lvl1 = {**lvl1_vdw, "gamma1i": gamma_WU}
        red = T.reduce_tree(T.rescan_gammas(levels_vdw, lvl1), lvl1,
                            with_selfvol=False)
        return red["dr"]
    gwu = jnp.ones(dms.n, dtype)
    print(f"gamma rescan+reduce: {timeit(jax.jit(gamma_pass), pos, gwu):.3f} ms")

    # pair phases
    s_factor = self_volume / a["vol_vdw_all"]

    if dms.n <= 6000:
        # the dense [N, N] XLA formulation is HBM-hostile at 10k+; skip it
        # there (the kernels below are the production path at every size)
        def born_only(p, s):
            geom = B.born_radii(p, a["radii_vdw"], s, a["ishydrogen"],
                                a["type_i"], a["type_j"], a["yflat"],
                                a["y2flat"], ntypes_j)
            return geom["born_radius"]
        print(f"born_radii (spline pairs): "
              f"{timeit(jax.jit(born_only), pos, s_factor):.3f} ms")

        def pair_all(p, s):
            geom = B.born_radii(p, a["radii_vdw"], s, a["ishydrogen"],
                                a["type_i"], a["type_j"], a["yflat"],
                                a["y2flat"], ntypes_j)
            br = geom["born_radius"]
            gb = B.gb_energy(p, a["charge"], br, geom)
            e_vdw = B.vdw_energy(a["alpha"], br)
            brw, bru = B.born_chain_factors(a["alpha"], a["charge"], br,
                                            geom["inv_br_fp"],
                                            gb["egb_der_Y"])
            sweep = B.descreening_sweep(geom, s, brw, bru)
            return (gb["gb_self"] + gb["gb_pair"] + e_vdw,
                    gb["force"] + sweep["force"],
                    sweep["evdw_der_W"] + sweep["egb_der_U"])
        print(f"pair phases total (XLA): "
              f"{timeit(jax.jit(pair_all), pos, s_factor):.3f} ms")

    # the production TPU path: fused Pallas pair kernels (dense grid and,
    # when the model carries budgets, the interacting-tile lists)
    if sim.agbnp.pair_kernel:
        from openmm_agbnp_plugin_tpu.models.agbnp_jax import (
            _pair_phases_pallas)

        def mk_pair(tiles):
            def pair_pallas(p, s):
                pp = _pair_phases_pallas(a, p, sim.agbnp.cutoff, None,
                                         sim.agbnp.pair_pad,
                                         sim.agbnp.pair_interpret,
                                         horizon=sim.agbnp.descreen_horizon,
                                         pair_tiles=tiles)(s)
                return pp["gb_self"] + pp["gb_pair"] + pp["e_vdw"], \
                    pp["pair_force"], pp["evdw_der_W"] + pp["egb_der_U"]
            return pair_pallas
        print(f"pair phases total (Pallas dense): "
              f"{timeit(jax.jit(mk_pair(None)), pos, s_factor):.3f} ms")
        if sim.agbnp.pair_tiles is not None:
            print(f"pair phases total (Pallas tile lists "
                  f"{sim.agbnp.pair_tiles}): "
                  f"{timeit(jax.jit(mk_pair(sim.agbnp.pair_tiles)), pos, s_factor):.3f} ms")

    if sim.mm is not None:
        def mm_bonded(p):
            return jax.value_and_grad(sim.mm.energy_bonded_and_14)(p)
        print(f"MM bonded+14 forces: {timeit(jax.jit(mm_bonded), pos):.3f} ms")

    # full AGBNP force (fixed topology) and full MD step pieces
    def agbnp_full(p):
        out = energy_forces(a2, p, caps=caps, version=1, roffset=roffset,
                            ntypes_j=ntypes_j, topology=topo)
        return out["energy"], out["force"]
    print(f"AGBNP1 energy+forces (fixed topo): {timeit(jax.jit(agbnp_full), pos):.3f} ms")

    if sim.mm is not None:
        def mm(p):
            e, g = jax.value_and_grad(sim.mm.energy)(p)
            return e, g
        print(f"MM forces: {timeit(jax.jit(mm), pos):.3f} ms")

    # full fused step, amortized (the real number)
    res = sim.benchmark_langevin(nsteps=200, dt=0.001, neighbor_every=20)
    print(f"full MD step: {1e3 / res['steps_per_s']:.3f} ms  "
          f"({res['ns_day']:.2f} ns/day)")


if __name__ == "__main__":
    main()
