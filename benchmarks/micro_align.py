"""A/B micro-benchmark for parent-group ALIGNMENT packing of the tree
levels: if every parent's child group is padded to a multiple of A, the
monotone segment-id vector pmono is constant within each A-block, so

  - the downward parent gather x[pmono] becomes a 1/A-size gather plus a
    cheap repeat, and
  - the upward sorted-scatter segment-sum becomes an A-fold in-register
    pre-add followed by a 1/A-size sorted scatter.

Both are bit-exact (padding rows carry zeros).  This micro measures the
in-scan cost of whole-tree downward-gather and upward-segsum sweeps,
baseline vs A-aligned, using the REAL per-level pmono vectors of a shipped
system re-packed with alignment (including the capacity growth the group
padding causes).

Usage: python benchmarks/micro_align.py [system] [reps]
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


def aligned_pmono(pmono, valid, A):
    """Re-pack a level's (pmono, valid) with parent groups padded to A.

    Returns (new_pmono, new_valid, new_cap) where new_cap is 128-aligned.
    Within-group order of live rows is preserved; padding rows carry the
    group's parent id so pmono stays constant inside every A-block.
    """
    pm = np.asarray(pmono)
    va = np.asarray(valid)
    hi = int(pm.max()) + 1
    cnt = np.bincount(pm[va], minlength=hi)
    cnta = ((cnt + A - 1) // A) * A
    new_count = int(cnta.sum())
    cap = max(128, (new_count + 127) // 128 * 128)
    # 128-alignment keeps cap a multiple of every A in {2,4,8}
    starts = np.concatenate([[0], np.cumsum(cnta)[:-1]])
    new_pm = np.zeros(cap, np.int32)
    new_va = np.zeros(cap, bool)
    old_slots = np.nonzero(va)[0]
    groups = pm[old_slots]          # sorted already (parent-grouped layout)
    first = np.concatenate([[0], np.nonzero(np.diff(groups))[0] + 1])
    sizes = np.diff(np.concatenate([first, [len(groups)]]))
    pos_in_group = np.arange(len(groups)) - np.repeat(first, sizes)
    new_slot = starts[groups] + pos_in_group
    new_pm[new_slot] = groups
    new_va[new_slot] = True
    new_pm = np.maximum.accumulate(np.where(new_va, new_pm, 0)).astype(
        np.int32)
    return new_pm, new_va, cap


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
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
    jax.block_until_ready(levels[0]["volume"])
    natoms = dms.n
    D = 8
    rng = np.random.default_rng(0)

    # per-level structures: baseline + aligned variants
    pms, npars, capsl = [], [], []
    for li, lvl in enumerate(levels):
        pms.append(np.asarray(lvl["bnd"]["pmono"]))
        capsl.append(int(lvl["valid"].shape[0]))
        npars.append(natoms if li == 0 else
                     int(levels[li - 1]["valid"].shape[0]))
        live = int(np.asarray(lvl["valid"]).sum())
        print(f"level {li + 2}: cap={capsl[-1]:7d} live={live:7d} "
              f"parents={npars[-1]:7d}")
    print(f"total rows: {sum(capsl)}")

    def sweep_time(pm_list, cap_list, A):
        """One downward gather sweep + one upward segsum sweep over all
        levels, chained; A=1 is the baseline."""
        pm_j = [jnp.asarray(p) for p in pm_list]
        xs = [jnp.asarray(rng.standard_normal((c, D)), dtype)
              for c in cap_list]
        src0 = jnp.asarray(rng.standard_normal((natoms, D)), dtype)

        def down(s):
            prev = s
            outs = []
            for pm, c in zip(pm_j, cap_list):
                if A == 1:
                    g = prev.at[pm].get(indices_are_sorted=True)
                else:
                    g = prev.at[pm[::A]].get(indices_are_sorted=True)
                    g = jnp.repeat(g, A, axis=0, total_repeat_length=c)
                outs.append(g)
                prev = g
            return s + 0.0 * outs[-1][:1, :1].sum()

        def up(xs):
            acc = None
            new = []
            for li in range(len(pm_j) - 1, -1, -1):
                x = xs[li] if acc is None else xs[li] + 0.0 * acc[:1, :1]
                npar = npars[li]
                if A == 1:
                    acc = jax.ops.segment_sum(x, pm_j[li],
                                              num_segments=npar,
                                              indices_are_sorted=True)
                else:
                    pre = x.reshape(x.shape[0] // A, A, D).sum(axis=1)
                    acc = jax.ops.segment_sum(pre, pm_j[li][::A],
                                              num_segments=npar,
                                              indices_are_sorted=True)
                new.append(x)
            return list(reversed(new))

        td = scan_time(down, src0, reps)
        tu = scan_time(up, xs, reps)
        return td, tu

    td0, tu0 = sweep_time(pms, capsl, 1)
    print(f"baseline     : down {td0:7.3f} ms  up {tu0:7.3f} ms  "
          f"rows {sum(capsl)}")
    for A in (2, 4, 8):
        pmsA, capsA = [], []
        for pm, va in zip(pms, [np.asarray(l["valid"]) for l in levels]):
            pmA, vaA, capA = aligned_pmono(pm, va, A)
            pmsA.append(pmA)
            capsA.append(capA)
        td, tu = sweep_time(pmsA, capsA, A)
        print(f"A={A} aligned : down {td:7.3f} ms  up {tu:7.3f} ms  "
              f"rows {sum(capsA)} (+{sum(capsA) - sum(capsl)})")


if __name__ == "__main__":
    main()
