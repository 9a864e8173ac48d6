"""Roofline / floor measurement for the Pallas pair sweeps (VERDICT r3 #3).

In ONE process on the current device:
  1. measures empirical device peaks: bf16 MXU matmul throughput, f32
     matmul throughput, and HBM stream bandwidth;
  2. times born_sums / gb_pair / descreening standalone at a shipped
     system's real geometry (production configuration: Morton rows,
     heavy-packed screeners, horizon-bounded spline loop, shared Q/dQ);
  3. compares achieved time against the analytic MXU-flop and HBM-byte
     lower bounds per kernel, attributing the remainder to per-tile fixed
     overheads (grid step + DMA latency + VPU mask work).

Usage: python benchmarks/micro_pairs_floor.py [system] [cutoff] [horizon]
       (defaults: 2clr_agbnp1 1.0 cutoff)
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
from openmm_agbnp_plugin_tpu.ops import born as B
from openmm_agbnp_plugin_tpu.ops.pallas import pairs as PK


def _sync(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(fn, *args, n=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def measure_peaks():
    """Empirical device peaks, each as ONE dispatched program carrying
    hundreds of ms of device work (a fori_loop of repetitions inside the
    jit): on the remote-TPU tunnel, per-dispatch latency is large enough
    that timing many small calls measures the tunnel, not the chip."""
    k = 4096
    reps = 64
    a16 = jnp.ones((k, k), jnp.bfloat16)

    @jax.jit
    def mm16_loop(a):
        def body(i, x):
            return jax.lax.dot(x, a, preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16) * 0.001
        return jax.lax.fori_loop(0, reps, body, a)
    t = timeit(mm16_loop, a16, n=3)
    peak_bf16 = reps * 2 * k ** 3 / t

    a32 = jnp.ones((k, k), jnp.float32)

    @jax.jit
    def mm32_loop(a):
        def body(i, x):
            return jax.lax.dot(x, a) * 0.001
        return jax.lax.fori_loop(0, reps, body, a)
    t = timeit(mm32_loop, a32, n=3)
    peak_f32 = reps * 2 * k ** 3 / t

    # HBM: fori of add passes over 256 MB — fori iterations cannot fuse
    # with each other, so each is one sequential read + write stream
    # (NOT a reverse: lane/sublane-reversing DMA measured ~10x below the
    # stream rate on this device)
    big = jnp.ones((256 * (1 << 20) // 4,), jnp.float32)

    @jax.jit
    def bw_loop(x):
        def body(i, x):
            return x + 1.0
        return jax.lax.fori_loop(0, 32, body, x)
    t = timeit(bw_loop, big, n=3)
    bw = 32 * 2 * big.size * 4 / t

    # VPU: fori of bodies that each fuse 64 FMAs per element over 64 MB
    # (ops:bytes = 64:4 -> compute-bound within each fused body)
    v = jnp.ones((16 * (1 << 20),), jnp.float32)

    @jax.jit
    def fma_loop(x):
        def body(i, x):
            for _ in range(64):
                x = x * 1.0000001 + 1e-7
            return x
        return jax.lax.fori_loop(0, 32, body, x)
    t = timeit(fma_loop, v, n=3)
    vpu = 32 * 2 * 64 * v.size / t
    return dict(peak_bf16_tflops=peak_bf16 / 1e12,
                peak_f32_tflops=peak_f32 / 1e12,
                hbm_gbs=bw / 1e9, vpu_tops=vpu / 1e12)


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "2clr_agbnp1"
    cutoff = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    dh = sys.argv[3] if len(sys.argv) > 3 else "cutoff"
    dh = None if dh == "lut" else ("cutoff" if dh == "cutoff" else float(dh))
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    dtype = np.float32
    sim = Simulation(dms, version=1, cutoff=cutoff, dtype=dtype, skin=0.25,
                     descreen_horizon=dh)
    m = sim.agbnp
    assert m.pair_kernel, "pair kernels inactive (not on TPU?)"
    a = {k: jnp.asarray(v) for k, v in m.arrays.items()}
    pos = jnp.asarray(sim.positions, dtype)
    n = m.params.n
    pair_pad = m.pair_pad
    tile = PK.pick_tile(n)

    peaks = measure_peaks()
    print(f"device peaks: bf16 {peaks['peak_bf16_tflops']:.1f} TFLOP/s, "
          f"f32 {peaks['peak_f32_tflops']:.1f} TFLOP/s, "
          f"HBM {peaks['hbm_gbs']:.0f} GB/s, "
          f"VPU {peaks['vpu_tops']:.2f} Tops/s")

    # ---- production inputs (mirrors _pair_phases_pallas) -----------------
    rperm = a["rperm"]
    pos_p = pos[rperm]
    pos_pad = jnp.pad(pos_p, ((0, pair_pad - n), (0, 0))).T
    hids = a["hids_pad"]
    hids_k = a["hids_perm_pad"]
    hvalid = hids >= 0
    hclip = jnp.clip(hids, 0)
    pos_hpad = (pos[hclip] * hvalid[:, None]).T
    nhpad = int(hids.shape[0])
    s_fake = jnp.where(hvalid, 0.8, 0.0).astype(dtype)
    horizon = m.descreen_horizon
    heff = float(PK.AGBNP_I4LOOKUP_MAXA if horizon is None
                 else min(horizon, PK.AGBNP_I4LOOKUP_MAXA))
    br_fake = jnp.full(pair_pad, 0.2, dtype)
    charge_pad = a["charge_pad"]
    wf = jnp.where(jnp.arange(pair_pad) < n, 1.0, 0.0).astype(dtype)

    nti, ntj_t = pair_pad // tile, nhpad // tile
    # in-range tile counts at this geometry
    boxv = None
    cb = PK.host_tile_count(np.asarray(pos_pad),
                            np.asarray(jnp.arange(pair_pad) < n),
                            np.asarray(pos_hpad), np.asarray(hvalid),
                            tile, heff)
    cg = PK.host_tile_count(np.asarray(pos_pad),
                            np.asarray(jnp.arange(pair_pad) < n),
                            np.asarray(pos_pad),
                            np.asarray(jnp.arange(pair_pad) < n),
                            tile, cutoff, triangular=True)

    # ---- kernel timings --------------------------------------------------
    born = jax.jit(lambda s: PK.born_sums(
        pos_pad, pos_hpad, hids_k, a["rowY_pad"], a["cols_oh_hpad"], s,
        n, tile, horizon=horizon, save_qd=True))
    t_born = timeit(born, s_fake)
    raw, q_t, dq_t = born(s_fake)

    desc = jax.jit(lambda w, u: PK.descreening(
        pos_pad, pos_hpad, hids_k, a["rowY_pad"], a["cols_oh_hpad"], s_fake,
        w, u, n, tile, horizon=horizon, qd=(q_t, dq_t)))
    t_desc = timeit(desc, wf, wf)

    desc_nq = jax.jit(lambda w, u: PK.descreening(
        pos_pad, pos_hpad, hids_k, a["rowY_pad"], a["cols_oh_hpad"], s_fake,
        w, u, n, tile, horizon=horizon, qd=None))
    t_desc_nq = timeit(desc_nq, wf, wf)

    gb = jax.jit(lambda q: PK.gb_pair(pos_pad, q, br_fake, n, tile,
                                      cutoff=cutoff))
    t_gb = timeit(gb, charge_pad)

    # ---- analytic lower bounds ------------------------------------------
    ntypes = int(a["cols_oh_hpad"].shape[1])
    W = 2 * ntypes
    na_eff = min(16, int(heff / (PK.AGBNP_I4LOOKUP_MAXA / 15)) + 2)
    # spline node selection per visited tile: na_eff segments x 3 bf16
    # mantissa chunks x [tile, W] @ [W, 2*tile]
    flops_tile = na_eff * 3 * 2 * tile * W * 2 * tile
    born_flops = cb * flops_tile
    t_born_mxu = born_flops / (peaks["peak_bf16_tflops"] * 1e12)
    qd_bytes = 2 * pair_pad * nhpad * 4  # Q/dQ written (born) / read (desc)
    t_qd_bw = qd_bytes / (peaks["hbm_gbs"] * 1e9)
    # VPU bound: per element per segment, the mask-accumulate chain is
    # ~8 elementwise ops (two eq-masks, four mul-adds for y/y2 node pairs)
    # plus ~30 for geometry/exp/final spline assembly once per element
    vpu_ops = cb * tile * tile * (8 * na_eff + 30)
    t_born_vpu = vpu_ops / (peaks["vpu_tops"] * 1e12)

    step = sim.benchmark_langevin(nsteps=50, warmup=True)["elapsed_s"] / 50

    print(f"n={n} pad={pair_pad} heavy_pad={nhpad} tile={tile} "
          f"types={ntypes} na_eff={na_eff}")
    print(f"tiles: born {cb}/{nti * ntj_t} in range, gb {cg}/"
          f"{nti * (nti + 1) // 2}")
    print(f"born_sums(save_qd): {t_born * 1e3:.3f} ms  "
          f"[MXU bound {t_born_mxu * 1e3:.3f} ms "
          f"({100 * t_born_mxu / t_born:.0f}%), VPU bound "
          f"{t_born_vpu * 1e3:.3f} ms ({100 * t_born_vpu / t_born:.0f}%), "
          f"Q/dQ write bound {t_qd_bw * 1e3:.3f} ms]")
    print(f"descreening(qd reload): {t_desc * 1e3:.3f} ms  "
          f"[Q/dQ read bound {t_qd_bw * 1e3:.3f} ms "
          f"({100 * t_qd_bw / t_desc:.0f}%)]")
    print(f"descreening(recompute): {t_desc_nq * 1e3:.3f} ms")
    print(f"gb_pair: {t_gb * 1e3:.3f} ms")
    print(f"pair sweeps total (prod: born+desc_qd+gb): "
          f"{(t_born + t_desc + t_gb) * 1e3:.3f} ms of "
          f"{step * 1e3:.3f} ms MD step "
          f"({100 * (t_born + t_desc + t_gb) / step:.0f}%)")
    print(f"per-visited-tile: born {t_born / max(cb,1) * 1e6:.1f} us, "
          f"desc {t_desc / max(cb,1) * 1e6:.1f} us, "
          f"gb {t_gb / max(cg,1) * 1e6:.1f} us")


if __name__ == "__main__":
    main()
