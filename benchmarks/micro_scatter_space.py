"""Characterize TPU segment-sum cost vs rows, segment-space size,
sortedness, and channel count — the data behind the upward-reduction design
in ops/tree.py.  All timings in-scan (dependent iterations inside one jit).

Usage: python benchmarks/micro_scatter_space.py [rows] [channels]
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


def scan_time(fn, x0, reps=30, n=5):
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


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 167936
    ch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    dt = jnp.float32
    x0 = jnp.asarray(rng.uniform(size=(rows, ch)), dt)
    print(f"rows={rows} channels={ch} platform={jax.devices()[0].platform}")

    for nseg in (1310, 5983, 12032, 29696, 73216, 167936):
        if nseg > rows:
            continue
        ids_sorted = jnp.asarray(np.sort(rng.integers(0, nseg, rows))
                                 .astype(np.int32))
        ids_rand = jnp.asarray(rng.permutation(
            np.asarray(ids_sorted)).astype(np.int32))

        def seg(x, ids=ids_rand, nseg=nseg):
            out = jax.ops.segment_sum(x, ids, num_segments=nseg)
            return x + out[ids]  # feed back through a gather to chain deps

        def seg_sorted(x, ids=ids_sorted, nseg=nseg):
            out = jax.ops.segment_sum(x, ids, num_segments=nseg,
                                      indices_are_sorted=True)
            return x + out[ids]

        def seg_sorted_noflag(x, ids=ids_sorted, nseg=nseg):
            out = jax.ops.segment_sum(x, ids, num_segments=nseg)
            return x + out[ids]

        t_r = scan_time(seg, x0)
        t_s = scan_time(seg_sorted, x0)
        t_sn = scan_time(seg_sorted_noflag, x0)
        print(f"  nseg={nseg:7d}: rand={t_r:7.3f}  sorted+flag={t_s:7.3f}  "
              f"sorted-noflag={t_sn:7.3f} ms")

    # gather-only baselines at the same row count
    src = jnp.asarray(rng.uniform(size=(73216, ch)), dt)
    idx_r = jnp.asarray(rng.integers(0, 73216, rows).astype(np.int32))
    idx_s = jnp.asarray(np.sort(np.asarray(idx_r)).astype(np.int32))

    def g_rand(x):
        return x + src[idx_r][:, :ch]

    def g_sorted(x):
        return x + src.at[idx_s].get(indices_are_sorted=True)[:, :ch]

    print(f"  gather {rows} rows from 73216: rand={scan_time(g_rand, x0):7.3f}"
          f"  sorted={scan_time(g_sorted, x0):7.3f} ms")


if __name__ == "__main__":
    main()
