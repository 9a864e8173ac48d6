"""Prototype: rank-space Pallas kernels for the sorted tree reductions.

v3b: carry-based streaming segment-sum.  The upward child->parent reduction
is a segment-sum over parent-sorted rows (monotone ids); XLA's scatter
lowering costs ~15 ns/row.  Here each 128-row sub-group contributes one
[2G, G] one-hot (built transpose-free from a lane-layout rank vector) times
the [G, C] data block (256 MXU cycles) into a FIXED [2G, C] window
accumulator -- static-address RMW only; Mosaic miscompiles/rejects
dynamic-offset RMW and dynamic LANE-offset stores.  The window slides by
whole G-blocks on a host-precomputed flush schedule (offsets are
deterministic given the per-sub-group rank starts), each flush a pure
128-aligned dynamic-SUBLANE store into the [kcap, C] rank accumulator,
DMA'd out once at the end.  The place kernel (dense rank sums -> gappy
parent-row space) is a pure windowed one-hot gather, no accumulation.

Usage: python benchmarks/micro_rank_kernels.py [rows] [reps]
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

C = 8
G = 128    # sub-group rows / flush granule
R = 4096   # rows per grid step
SUB = R // G
INTERPRET = bool(int(os.environ.get("PK_INTERPRET", "0")))


def flush_schedule(r0s):
    """Host-side: per-sub-group flush plan.  r0s[j] = rank of sub-group j's
    first row.  The window holds ranks [w0, w0+2G); r0s[j]-w0 stays in
    [0, G) because ranks advance at most G per sub-group and the window
    flushes a G-block whenever the next sub-group would start in its upper
    half.  Returns (flush[j] in {0,1}, w0s[j])."""
    n = len(r0s)
    flush = np.zeros(n, np.int32)
    w0s = np.zeros(n, np.int32)
    w0 = 0
    for j in range(n):
        assert 0 <= r0s[j] - w0 < G
        w0s[j] = w0
        nxt = r0s[j + 1] if j + 1 < n else r0s[j]
        if nxt - w0 >= G:
            flush[j] = 1
            w0 = w0 + G
    return flush, w0s


# ---------------------------------------------------------------- segsum
def _segsum_kernel(flush_ref, w0s_ref, x_ref, rankL_ref, out_ref,
                   acc_ref, win_ref, sem):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        win_ref[:] = jnp.zeros(win_ref.shape, win_ref.dtype)
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    iota = jax.lax.broadcasted_iota(jnp.int32, (2 * G, G), 0)

    def body(j, carry):
        jj = i * SUB + j
        slot = rankL_ref[:, pl.ds(j * G, G)] - w0s_ref[jj]   # [1, G] lanes
        oh = (slot == iota).astype(jnp.float32)              # [2G, G]
        # the MXU's default f32 path rounds operands to bf16; the one-hot
        # is exact in bf16 but the data is not, so split the data into
        # three bf16 parts for an exact f32 product (3 passes)
        x = x_ref[pl.ds(j * G, G), :]
        x1 = x.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = x - x1
        x2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        x3 = r1 - x2
        part = sum(jnp.dot(oh, xs, preferred_element_type=jnp.float32)
                   for xs in (x1, x2, x3))                   # [2G, C]
        win_ref[:] = win_ref[:] + part

        @pl.when(flush_ref[jj] == 1)
        def _():
            acc_ref[pl.ds(w0s_ref[jj], G), :] = win_ref[0:G, :]
            win_ref[0:G, :] = win_ref[G:2 * G, :]
            win_ref[G:2 * G, :] = jnp.zeros((G, C), jnp.float32)

        return carry

    jax.lax.fori_loop(0, SUB, body, 0)

    @pl.when(i == n - 1)
    def _():
        last = i * SUB + SUB - 1
        w_end = w0s_ref[last] + G * flush_ref[last]
        acc_ref[pl.ds(w_end, 2 * G), :] = win_ref[:]
        cp = pltpu.make_async_copy(acc_ref, out_ref, sem)
        cp.start()
        cp.wait()


def rank_segment_sum(x, rankL, flush, w0s, kcap):
    """x [rows, C], rows sorted by segment; rankL [1, rows] dense monotone
    rank in lane layout; host flush schedule from flush_schedule().
    Returns [kcap + 2G, C] rank sums (zero tail)."""
    rows = x.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows // R,),
        in_specs=[
            pl.BlockSpec((R, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((kcap + 2 * G, C), jnp.float32),
                        pltpu.VMEM((2 * G, C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _segsum_kernel,
        out_shape=jax.ShapeDtypeStruct((kcap + 2 * G, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(flush, w0s, x, rankL)


# ----------------------------------------------------------------- place
def _place_kernel(q0s_ref, prankR_ref, sums_ref, out_ref):
    i = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (G, 2 * G), 1)

    def body(j, carry):
        q0 = q0s_ref[i * SUB + j]
        rel = prankR_ref[pl.ds(j * G, G), :] - q0 * G   # [G, 1]; <0 childless
        oh = (rel == iota).astype(jnp.float32)          # [G rows, 2G ranks]
        win = sums_ref[pl.ds(q0 * G, 2 * G), :]         # [2G, C]
        w1 = win.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = win - w1
        w2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        w3 = r1 - w2
        out_ref[pl.ds(j * G, G), :] = sum(
            jnp.dot(oh, ws, preferred_element_type=jnp.float32)
            for ws in (w1, w2, w3))
        return carry

    jax.lax.fori_loop(0, SUB, body, 0)


def rank_place(sums, prankR, q0s, rows):
    """sums [kcap(+slack), C] dense rank sums (whole in VMEM).  prankR
    [rows, 1]: rank for parent rows with children, negative otherwise.
    q0s [rows//G] = ffill_rank[g*G] // G.  Returns [rows, C] (0 where
    childless)."""
    kslack = sums.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // R,),
        in_specs=[
            pl.BlockSpec((R, 1), lambda i, q0s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kslack, C), lambda i, q0s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i, q0s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _place_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(q0s, prankR, sums)


# ------------------------------------------------------------- harness
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


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 86016
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    parents_cap = 77824
    rng = np.random.RandomState(0)
    print(f"rows={rows} platform={jax.devices()[0].platform}")

    widths = rng.choice([1, 1, 2, 2, 3, 4, 6, 8], size=rows)
    seg_of_row = np.searchsorted(np.cumsum(widths), np.arange(rows),
                                 side="right")
    nseg = seg_of_row[-1] + 1
    gaps = rng.choice([1, 1, 1, 2, 3], size=nseg)
    seg_pid = np.cumsum(gaps) - gaps[0]
    assert seg_pid[-1] < parents_cap, "raise parents_cap"
    pids = seg_pid[seg_of_row]
    kcap = int(np.ceil((nseg + 1) / G) * G)
    start = np.concatenate([[True], pids[1:] != pids[:-1]])
    rank = np.cumsum(start) - 1
    r0s = rank[::G].astype(np.int32)
    flush, w0s = flush_schedule(r0s)
    print(f"segments={nseg} kcap={kcap} flushes={int(flush.sum())}")

    x = jnp.asarray(rng.rand(rows, C), jnp.float32)
    pmono = jnp.asarray(pids, jnp.int32)
    rankL = jnp.asarray(rank[None, :], jnp.int32)
    fj, wj = map(jnp.asarray, (flush, w0s))

    prank_np = np.full(parents_cap, -1, np.int32)
    prank_np[seg_pid] = np.arange(nseg)
    ffill = np.maximum.accumulate(np.where(prank_np >= 0, prank_np, 0))
    q0s_np = (ffill[::G] // G).astype(np.int32)
    prankL = jnp.asarray(prank_np[:, None])
    q0sj = jnp.asarray(q0s_np)

    # ---- correctness
    ref = jax.ops.segment_sum(x, pmono, num_segments=parents_cap,
                              indices_are_sorted=True)
    sums = rank_segment_sum(x, rankL, fj, wj, kcap)
    refk = jax.ops.segment_sum(x, jnp.asarray(rank), num_segments=kcap + 2 * G)
    print(f"segsum rank err  = {float(jnp.max(jnp.abs(sums - refk))):.3e}")
    placed = rank_place(sums, prankL, q0sj, parents_cap)
    print(f"placed err       = {float(jnp.max(jnp.abs(placed - ref))):.3e}")

    # ---- timing
    def xla_segsum(x):
        out = jax.ops.segment_sum(x, pmono, num_segments=parents_cap,
                                  indices_are_sorted=True)
        return x + 1e-30 * jnp.concatenate(
            [out, jnp.zeros((rows - parents_cap, C), x.dtype)], 0)
    print(f"xla segsum (to parent rows) : {scan_time(xla_segsum, x, reps):7.3f} ms")

    def pk_segsum(x):
        out = rank_segment_sum(x, rankL, fj, wj, kcap)
        return x + 1e-30 * jnp.concatenate(
            [out, jnp.zeros((rows - out.shape[0], C), x.dtype)], 0)
    print(f"pallas rank segsum          : {scan_time(pk_segsum, x, reps):7.3f} ms")

    def pk_both(x):
        s = rank_segment_sum(x, rankL, fj, wj, kcap)
        out = rank_place(s, prankL, q0sj, parents_cap)
        return x + 1e-30 * jnp.concatenate(
            [out, jnp.zeros((rows - parents_cap, C), x.dtype)], 0)
    print(f"pallas segsum + place       : {scan_time(pk_both, x, reps):7.3f} ms")


if __name__ == "__main__":
    main()
