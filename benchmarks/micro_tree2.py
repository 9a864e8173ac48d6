"""Dispatch-free per-phase timing: each phase looped under lax.scan in one
jit so per-call/tunnel overhead is amortized away.  The loop carry threads a
tiny position perturbation so XLA cannot hoist the body."""

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

REPS = 50


def scan_time(body, pos, n=REPS, rounds=5):
    """Time n executions of body inside one jit; returns ms per execution."""

    @jax.jit
    def run(pos):
        def f(p, _):
            out = body(p)
            # fold a scalar from the output back into p to serialize iterations
            s = jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x[..., :1].astype(jnp.float32))
                if hasattr(x, "ndim") and x.ndim > 0 else a + 0.0,
                out, jnp.float32(0.0))
            return p + (s * 1e-30).astype(p.dtype), None
        p, _ = jax.lax.scan(f, pos, length=n)
        return p

    jax.block_until_ready(run(pos))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(run(pos))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=None, dtype=dtype, skin=0.25)
    a = sim.agbnp.arrays
    caps = sim.agbnp.caps
    pos0 = jnp.asarray(dms.positions, dtype)
    roffset = sim.agbnp.params.roffset
    print(f"n={dms.n} caps={caps.caps}")

    gdr = a["gamma"] / roffset
    from openmm_agbnp_plugin_tpu.ops.neighbors import half_neighbor_pairs
    pi, pj, pv, _ = jax.jit(lambda p: half_neighbor_pairs(
        p, sim.heavy_mask, sim.rcut_list, sim.kmax))(pos0)
    levels, diag = jax.jit(lambda p: T.build_tree(
        T.make_level1(p, a["radii_large"], a["vol_large"], gdr,
                      a["ishydrogen"]), pi, pj, caps, pairs_valid=pv))(pos0)
    topo = T.tree_topology(levels)

    def mk_lvl1(p):
        return (T.make_level1(p, a["radii_large"], a["vol_large"], gdr,
                              a["ishydrogen"]),
                T.make_level1(p, a["radii_vdw"], a["vol_vdw"], -gdr,
                              a["ishydrogen"]))

    def rescan2(p):
        la, lb = mk_lvl1(p)
        return T.rescan_volumes2(topo, la, lb)

    def rescan2_reduce2(p):
        la, lb = mk_lvl1(p)
        xa, xb = T.rescan_volumes2(topo, la, lb)
        ra, rb = T.reduce_tree2(xa, xb, la, lb)
        return ra["energy"], ra["dr"], rb["energy"], rb["dr"], rb["self_volume"]

    def gamma_pass(p):
        la, lb = mk_lvl1(p)
        xa, xb = T.rescan_volumes2(topo, la, lb)
        lw = {**lb, "gamma1i": p[:, 0]}
        red = T.reduce_tree(T.rescan_gammas(xb, lw), lw, with_selfvol=False)
        return red["dr"]

    t_r2 = scan_time(rescan2, pos0)
    print(f"rescan2 only: {t_r2:.3f} ms")
    t_rr = scan_time(rescan2_reduce2, pos0)
    print(f"rescan2+reduce2: {t_rr:.3f} ms  (reduce2 ~= {t_rr - t_r2:.3f})")
    t_g = scan_time(gamma_pass, pos0)
    print(f"rescan2+gammas+reduce1: {t_g:.3f} ms  "
          f"(gamma pass ~= {t_g - t_r2:.3f})")

    # primitives, amortized
    lmax = int(np.argmax(np.asarray(diag["counts"])))
    cap = levels[lmax]["valid"].shape[0]
    parent_cap = dms.n if lmax == 0 else levels[lmax - 1]["valid"].shape[0]
    parent = levels[lmax]["parent"]
    atom = levels[lmax]["atom"]
    prev_dat = jnp.zeros((parent_cap, 24), dtype)
    at12 = jnp.zeros((dms.n, 12), dtype)
    up = jnp.ones((cap, 11), dtype)

    t = scan_time(lambda p: prev_dat[parent] + p[0, 0], pos0)
    print(f"gather [{parent_cap},24] x {cap}: {t:.3f} ms")
    t = scan_time(lambda p: at12[atom] + p[0, 0], pos0)
    print(f"gather [{dms.n},12] x {cap}: {t:.3f} ms")
    t = scan_time(lambda p: jax.ops.segment_sum(up + p[0, 0], parent,
                                                num_segments=parent_cap), pos0)
    print(f"segment_sum [{cap},11]->{parent_cap}: {t:.3f} ms")
    allat = jnp.concatenate([l["atom"] for l in levels])
    rows = jnp.ones((allat.shape[0], 7), dtype)
    t = scan_time(lambda p: jax.ops.segment_sum(rows + p[0, 0], allat,
                                                num_segments=dms.n), pos0)
    print(f"deposit segsum [{allat.shape[0]},7]->{dms.n}: {t:.3f} ms")
    sp = prev_dat[parent]
    a2 = jnp.zeros((cap, 12), dtype)
    t = scan_time(lambda p: T._cand_dat(sp[:, 0] + p[0, 0], sp[:, 1],
                                        sp[:, 2:5], sp[:, 11],
                                        a2[:, 0:6])[0], pos0)
    print(f"_cand_dat at {cap}: {t:.3f} ms")


if __name__ == "__main__":
    main()
