"""Probe: can Pallas beat XLA's per-row gather/scatter floor on TPU?

XLA row-indexed ops on this runtime cost ~6-20 ns/row regardless of row
width; the tree passes are pinned by that floor.  This probe measures the
same monotone-indexed moves through Pallas kernels:

  1. XLA sorted gather x[pmono]           (baseline, the chain's move)
  2. XLA sorted segment_sum               (baseline, the upward reduce)
  3. Pallas in-kernel jnp.take from VMEM  (does Mosaic lower it? how fast?)
  4. Pallas one-hot-free broadcast: piecewise-constant expansion via
     in-kernel cumsum of boundary diffs (pure VPU)

Usage: python benchmarks/micro_pallas_gather.py [rows] [parents] [reps]
"""

import functools
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def make_segments(rows, parents, seed=0):
    """Monotone segment ids with tree-like width distribution (avg ~2.5)."""
    rng = np.random.RandomState(seed)
    widths = rng.choice([1, 1, 2, 2, 3, 4, 6, 8], size=parents)
    ids = np.repeat(np.arange(parents), widths)
    if len(ids) >= rows:
        ids = ids[:rows]
    else:
        ids = np.concatenate([ids, np.full(rows - len(ids), ids[-1])])
    return jnp.asarray(ids, jnp.int32)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 85504
    parents = int(sys.argv[2]) if len(sys.argv) > 2 else 34816
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    print(f"rows={rows} parents={parents} platform={jax.devices()[0].platform}")

    pmono = make_segments(rows, parents)
    v = jnp.asarray(np.random.RandomState(1).rand(parents, 8), jnp.float32)
    x = jnp.asarray(np.random.RandomState(2).rand(rows, 8), jnp.float32)

    # 1. XLA sorted gather (broadcast parent rows to child rows)
    def xla_gather(v):
        out = v.at[pmono].get(indices_are_sorted=True)
        return v + 1e-30 * out[:parents]
    print(f"xla sorted gather   : {scan_time(xla_gather, v, reps):7.3f} ms "
          f"({scan_time(xla_gather, v, reps) / rows * 1e6:.2f} ns/row)")

    # 2. XLA sorted segment_sum
    def xla_segsum(x):
        out = jax.ops.segment_sum(x, pmono, num_segments=parents,
                                  indices_are_sorted=True)
        return x + 1e-30 * jnp.concatenate(
            [out, jnp.zeros((rows - parents, 8), x.dtype)], 0)
    print(f"xla sorted segsum   : {scan_time(xla_segsum, x, reps):7.3f} ms "
          f"({scan_time(xla_segsum, x, reps) / rows * 1e6:.2f} ns/row)")

    # 3. Pallas: in-kernel jnp.take rows from a VMEM table
    BLK = 2048

    def take_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0,
                              fill_value=0.0)

    @jax.jit
    def pallas_take(v):
        grid = (rows // BLK,)
        out = pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 8), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((parents, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(pmono, v)
        return v + 1e-30 * out[:parents]

    try:
        jax.block_until_ready(pallas_take(v))
        ms = scan_time(pallas_take, v, reps)
        print(f"pallas take         : {ms:7.3f} ms ({ms / rows * 1e6:.2f} ns/row)")
    except Exception as e:
        print(f"pallas take         : FAILED ({type(e).__name__}: {str(e)[:200]})")

    # 4. Pallas piecewise-constant broadcast via cumsum of diffs.
    # Boundary diffs live at segment-start rows (precomputed per topology
    # as a dense [rows] mask*scatter at rebuild time); per step the
    # broadcast is cumsum(diffs) along rows -- pure vector work.
    starts = jnp.concatenate([jnp.array([True]), pmono[1:] != pmono[:-1]])

    def cum_kernel(d_ref, out_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)
        blk = d_ref[:]                       # [BLK, 8]
        c = jnp.cumsum(blk, axis=0) + carry_ref[:]
        out_ref[:] = c
        carry_ref[:] = c[-1:, :]

    @jax.jit
    def pallas_cumsum_bcast(v):
        # per-step cost model: build diffs (XLA: one scatter of parents
        # rows into rows space... here approximated by the dense where)
        dv = jnp.concatenate([v[:1], v[1:] - v[:-1]], 0)
        diffs = jnp.zeros((rows, 8), jnp.float32)
        diffs = diffs.at[jnp.nonzero(starts, size=parents)[0]].set(
            dv, indices_are_sorted=True)
        out = pl.pallas_call(
            cum_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 8), jnp.float32),
            grid=(rows // BLK,),
            in_specs=[pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 8), jnp.float32)],
        )(diffs)
        return v + 1e-30 * out[:parents]

    try:
        jax.block_until_ready(pallas_cumsum_bcast(v))
        ms = scan_time(pallas_cumsum_bcast, v, reps)
        print(f"pallas cumsum bcast : {ms:7.3f} ms ({ms / rows * 1e6:.2f} ns/row)"
              f"  [includes the XLA diff-scatter]")
    except Exception as e:
        print(f"pallas cumsum bcast : FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
