"""A/B micro: log-shift segmented scans vs row-indexed segsum/gather for
the tree's fixed-topology sweeps.

The per-level child rows are parent-sorted and contiguous, segments are
bounded by the static sibling windows, and only ~1/4 of parent slots have
children (measured 1li2: 67.5k child rows vs 18.3k nonempty parents).  So:

- upward child->parent segment-sum  ==  segmented SUFFIX SUM via
  ceil(log2(maxsib)) dense shifted adds with STATIC masks, then a sparse
  hop (gather seg-start rows -> scatter into nonempty parent slots);
- downward parent gather  ==  sparse hop (gather nonempty parents ->
  scatter to seg-start rows) then segmented FORWARD FILL via log-shift
  jumps with static masks.

Indexed rows per level drop from #children to 2 x #nonempty-parents; the
dense passes are bandwidth-bound.  This micro times both against the
production sorted-scatter/sorted-gather paths on the real topology of a
shipped system, full 7-level chained sweeps, in-scan.

Usage: python benchmarks/micro_segshift.py [system] [reps]
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


def seg_meta(lvl, parent_cap, maxseg_bound):
    """Static per-level metadata for the log-shift scans (host-side here;
    in production this is computed once per topology rebuild)."""
    valid = np.asarray(lvl["valid"])
    pmono = np.asarray(lvl["bnd"]["pmono"])
    cap = valid.shape[0]
    n = int(valid.sum())
    # segment starts/ends in child space (valid prefix only)
    par = pmono.copy()
    starts_mask = np.zeros(cap, bool)
    if n:
        starts_mask[0] = True
        starts_mask[1:n] = par[1:n] != par[:n - 1]
        starts_mask[n:] = False
    start_rows = np.nonzero(starts_mask)[0]
    nep_idx = par[start_rows]
    # per-row segment start/end
    sid = np.cumsum(starts_mask) - 1          # segment ordinal per row
    sid = np.clip(sid, 0, max(len(start_rows) - 1, 0))
    row_start = start_rows[sid] if len(start_rows) else np.zeros(cap, int)
    ends_of_seg = np.empty(len(start_rows), int)
    if len(start_rows):
        ends_of_seg[:-1] = start_rows[1:] - 1
        ends_of_seg[-1] = n - 1
    row_end = ends_of_seg[sid] if len(start_rows) else np.zeros(cap, int)
    row_end = np.where(np.arange(cap) < n, row_end, -1)
    npass = max(1, int(np.ceil(np.log2(max(2, maxseg_bound)))))
    up_masks = []
    down_masks = []
    for j in range(npass):
        s = 1 << j
        up_masks.append((np.arange(cap) + s) <= row_end)
        down_masks.append((np.arange(cap) - s) >= row_start)
    return dict(
        start_rows=jnp.asarray(start_rows, jnp.int32),
        nep_idx=jnp.asarray(nep_idx, jnp.int32),
        up_masks=[jnp.asarray(m) for m in up_masks],
        down_masks=[jnp.asarray(m) for m in down_masks],
        npass=npass, nseg=len(start_rows), nrows=n)


def suffix_sum(x, meta):
    """Segmented suffix sum: out[c] = sum_{d=c..end_c} x[d]."""
    for j in range(meta["npass"]):
        s = 1 << j
        shifted = jnp.concatenate([x[s:], jnp.zeros((s, x.shape[1]), x.dtype)])
        x = x + jnp.where(meta["up_masks"][j][:, None], shifted, 0.0)
    return x


def up_hop(suf, meta, parent_cap):
    vals = suf[meta["start_rows"]]
    return jnp.zeros((parent_cap, suf.shape[1]), suf.dtype).at[
        meta["nep_idx"]].set(vals, unique_indices=True,
                             indices_are_sorted=True)


def down_place(parent_vals, meta, cap):
    vals = parent_vals[meta["nep_idx"]]
    x = jnp.zeros((cap, parent_vals.shape[1]), parent_vals.dtype).at[
        meta["start_rows"]].set(vals, unique_indices=True,
                                indices_are_sorted=True)
    for j in range(meta["npass"]):
        s = 1 << j
        shifted = jnp.concatenate([jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]])
        x = jnp.where(meta["down_masks"][j][:, None], shifted, x)
    return x


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    sim = Simulation(dms, version=1, cutoff=1.0, dtype=dtype, skin=0.25)
    a = sim.agbnp.arrays
    caps = sim.agbnp.caps
    pos = jnp.asarray(dms.positions, dtype)
    roffset = sim.agbnp.params.roffset
    print(f"n={dms.n} caps={caps.caps} platform={jax.devices()[0].platform}")

    gdr = jnp.asarray(a["gamma"]) / roffset
    pi, pj, pv, _ = sim.neighbor_fn(pos, sim.heavy_mask, sim.rcut_list,
                                    sim.kmax)
    lvl1 = T.make_level1(pos, jnp.asarray(a["radii_large"]),
                         jnp.asarray(a["vol_large"]), gdr,
                         jnp.asarray(a["ishydrogen"]))
    levels, diag = T.build_tree(lvl1, pi, pj, caps, pairs_valid=pv,
                                pair_rows=True)
    natoms = dms.n

    # per-level static metadata
    bounds = (sim.kmax,) + caps.offs
    metas = []
    parent_caps = []
    for l, lvl in enumerate(levels):
        parent_cap = natoms if l == 0 else caps.caps[l - 1]
        metas.append(seg_meta(lvl, parent_cap, bounds[l]))
        parent_caps.append(parent_cap)
    tot_rows = sum(m["nrows"] for m in metas)
    tot_seg = sum(m["nseg"] for m in metas)
    print(f"child rows {tot_rows}, nonempty parents {tot_seg}, "
          f"passes {[m['npass'] for m in metas]}")

    pmonos = [lvl["bnd"]["pmono"] for lvl in levels]
    valids = [lvl["valid"].astype(dtype) for lvl in levels]

    C = 8
    key = jax.random.PRNGKey(0)
    seeds = [jax.random.normal(key, (lvl["valid"].shape[0], C), dtype)
             * v[:, None] for lvl, v in zip(levels, valids)]

    # ---- upward sweep: deepest level -> atoms, chained like reduce_tree
    def sweep_up_segsum(xs):
        acc = None
        for l in range(len(levels) - 1, -1, -1):
            x = xs[l] if acc is None else xs[l] + acc
            acc = jax.ops.segment_sum(x, pmonos[l],
                                      num_segments=parent_caps[l],
                                      indices_are_sorted=True)
        return acc

    def sweep_up_shift(xs):
        acc = None
        for l in range(len(levels) - 1, -1, -1):
            x = xs[l] if acc is None else xs[l] + acc
            suf = suffix_sum(x, metas[l])
            acc = up_hop(suf, metas[l], parent_caps[l])
        return acc

    # parity
    ref = sweep_up_segsum(seeds)
    new = sweep_up_shift(seeds)
    err = float(jnp.max(jnp.abs(ref - new)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f"upward parity max rel {err:.3e}")

    def mk_chain(sweep):
        def fn(state):
            xs, acc = state
            out = sweep(xs)
            # feed result back so scan iterations are dependent
            xs2 = [x + out[:1, :1] * 0 for x in xs]
            xs2[0] = xs2[0].at[0, 0].add(out[0, 0] * 1e-30)
            return (xs2, out)
        return fn

    t_a = scan_time(mk_chain(sweep_up_segsum), (seeds, ref), reps)
    t_b = scan_time(mk_chain(sweep_up_shift), (seeds, ref), reps)
    print(f"upward sweep ({C}ch):  segsum {t_a:.3f} ms   logshift {t_b:.3f} ms")

    # ---- downward chain: atoms -> deepest, like rescan_gammas (8ch)
    pv0 = jax.random.normal(key, (natoms, C), dtype)

    def chain_down_gather(pv):
        out = []
        prev = pv
        for l in range(len(levels)):
            g = prev.at[pmonos[l]].get(indices_are_sorted=True)
            out.append(g)
            prev = g
        return out

    def chain_down_shift(pv):
        out = []
        prev = pv
        for l in range(len(levels)):
            g = down_place(prev, metas[l], valids[l].shape[0])
            out.append(g)
            prev = g
        return out

    ra = chain_down_gather(pv0)
    rb = chain_down_shift(pv0)
    err = max(float(jnp.max(jnp.abs((x - y) * v[:, None])))
              for x, y, v in zip(ra, rb, valids))
    print(f"downward parity max abs (valid rows) {err:.3e}")

    def mk_down(chain):
        def fn(pv):
            outs = chain(pv)
            return pv + outs[-1][0, 0] * 1e-30
        return fn

    t_a = scan_time(mk_down(chain_down_gather), pv0, reps)
    t_b = scan_time(mk_down(chain_down_shift), pv0, reps)
    print(f"downward chain ({C}ch): gather {t_a:.3f} ms   logshift {t_b:.3f} ms")

    # ---- wide downward (26ch, the rescan sp gather)
    CW = 26
    pw0 = jax.random.normal(key, (caps.caps[0], CW), dtype)

    def wide_gather(pw):
        g = pw.at[pmonos[1]].get(indices_are_sorted=True)
        return g

    def wide_shift(pw):
        return down_place(pw, metas[1], valids[1].shape[0])

    t_a = scan_time(lambda x: wide_gather(x)[:x.shape[0]] * 1e-30 + x, pw0,
                    reps)
    t_b = scan_time(lambda x: wide_shift(x)[:x.shape[0]] * 1e-30 + x, pw0,
                    reps)
    print(f"wide lvl3 gather ({CW}ch): gather {t_a:.3f} ms  logshift {t_b:.3f} ms")


if __name__ == "__main__":
    main()
# appended: transposed-layout probes (invoked when argv[3] == "T")
def transposed_probe(system="1li2_agbnp1", reps=20):
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32
    cap = 26112
    key = jax.random.PRNGKey(0)
    x_rm = jax.random.normal(key, (cap, 8), dtype)   # row-major
    x_tm = jnp.asarray(x_rm.T)                        # [8, cap]
    mask = jnp.asarray(np.random.default_rng(0).random(cap) < 0.8)

    def passes_rm(x):
        for j in range(6):
            s = 1 << j
            sh = jnp.concatenate([x[s:], jnp.zeros((s, 8), dtype)])
            x = x + jnp.where(mask[:, None], sh, 0.0)
        return x

    def passes_tm(x):
        for j in range(6):
            s = 1 << j
            sh = jnp.concatenate([x[:, s:], jnp.zeros((8, s), dtype)], axis=1)
            x = x + jnp.where(mask[None, :], sh, 0.0)
        return x

    t_rm = scan_time(passes_rm, x_rm, reps)
    t_tm = scan_time(passes_tm, x_tm, reps)
    # transpose round-trip cost
    t_tr = scan_time(lambda x: (x.T).T + 0.0, x_rm, reps)
    print(f"6 shifted-add passes [26112 rows, 8ch]: row-major {t_rm:.3f} ms"
          f"  transposed {t_tm:.3f} ms  (transpose rt {t_tr:.3f} ms)")

    # reference: what do the indexed ops cost at this shape?
    idx = jnp.asarray(np.sort(np.random.default_rng(0).integers(0, cap, cap)),
                      jnp.int32)
    t_g = scan_time(lambda x: x.at[idx].get(indices_are_sorted=True) + x * 0,
                    x_rm, reps)
    seg = jnp.asarray(np.sort(np.random.default_rng(1).integers(0, cap // 3,
                                                                cap)),
                      jnp.int32)
    t_s = scan_time(
        lambda x: jnp.pad(jax.ops.segment_sum(x, seg, num_segments=cap // 3,
                                              indices_are_sorted=True),
                          ((0, cap - cap // 3), (0, 0))) + x * 0,
        x_rm, reps)
    print(f"indexed at same shape: sorted gather {t_g:.3f} ms  "
          f"sorted segsum {t_s:.3f} ms")


if __name__ == "__main__" and len(sys.argv) > 3 and sys.argv[3] == "T":
    transposed_probe(sys.argv[1], int(sys.argv[2]))
