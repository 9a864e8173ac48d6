"""Rank-space Pallas kernels for the sorted upward tree reductions.

The overlap-tree's child->parent reduction is a segment-sum over
parent-sorted rows (monotone segment ids).  XLA's scatter lowering costs
~8-18 ns/row on this runtime; these kernels are designed to beat that
floor by exploiting the sort (A/B harness: benchmarks/micro_ranksum_ab.py;
enable with AGBNP_RANKSUM=auto once the on-hardware numbers are in):

- within any 128-row sub-group the number of DISTINCT segments is <= 128,
  so the sub-group's contribution is a [2G, G] one-hot (built transpose-free
  from a lane-layout rank vector) times the [G, C] data block, accumulated
  into a FIXED [2G, C] window (static-address RMW only: Mosaic pipelines
  dynamic-offset RMW unsafely and rejects dynamic lane-offset stores);
- the window slides by whole G-blocks on a flush schedule that has the
  closed form w0[j] = G*(r0[j]//G), flush[j] = (r0[j+1]//G > r0[j]//G)
  (ranks advance at most G per sub-group), each flush a pure 128-aligned
  dynamic-SUBLANE store into the [kcap, C] rank accumulator;
- the MXU's default f32 path rounds operands to bf16, so the data side is
  split into three bf16 terms for an exact f32 product (the one-hot side is
  exactly representable already);
- a second kernel places the dense rank sums into the gappy parent-row
  space ([2G] rank windows bounded from the parent side), fused with the
  same 3-pass split.

The reduction is deterministic (fixed association order), like the XLA
sorted-scatter path it replaces.  Replaces the per-level segment scatters
of GVolSelfVolume.cl / the tree sections of GVolOverlapTree.cl:1186-1462
in spirit; the reference's OpenCL uses atomics + spin-locks instead.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 128     # sub-group rows / flush granule
R = 4096    # rows per grid step (amortizes per-step dispatch overhead)
SUB = R // G
# VMEM budget for the rank accumulator (scratch + out copies held on chip)
MAX_KCAP_BYTES = 4 << 20


def supports(kcap: int, nch: int) -> bool:
    """Static feasibility: channel count must be sublane-packed and the
    rank accumulator must fit comfortably in VMEM."""
    return (nch in (8, 16)
            and (kcap + 2 * G) * nch * 4 <= MAX_KCAP_BYTES)


def _pad_to(x, n, axis, value):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def upward_info(pmono, nonempty):
    """Build-time arrays for the kernels, all closed-form (no host loop),
    padded to the kernels' R-row grid.

    pmono [cap]: monotone segment id per child row (carried past the valid
    tail).  nonempty [parent_cap] bool: which parent slots own children.
    Returns dict(rankL [1,capp], flush [capp//G], w0s [capp//G],
                 prankR [pp,1], q0s [pp//G]) with capp/pp the R-padded
    sizes (padding carries the edge rank / childless encoding).
    """
    cap = pmono.shape[0]
    capp = -(-cap // R) * R
    if capp != cap:
        pmono = jnp.pad(pmono, (0, capp - cap), mode="edge")
    start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             pmono[1:] != pmono[:-1]])
    rank = jnp.cumsum(start.astype(jnp.int32)) - 1          # dense, monotone
    r0s = rank[::G]
    q = r0s // G
    qn = jnp.concatenate([q[1:], q[-1:]])
    flush = (qn > q).astype(jnp.int32)
    w0s = q * G

    pcap = nonempty.shape[0]
    pp = -(-pcap // R) * R
    nonempty = _pad_to(nonempty, pp, 0, False)
    pr = jnp.cumsum(nonempty.astype(jnp.int32)) - 1         # ffill of ranks
    prank = jnp.where(nonempty, pr, -1)
    q0s = jnp.maximum(pr[::G], 0) // G
    return dict(rankL=rank[None, :], flush=flush, w0s=w0s,
                prankR=prank[:, None], q0s=q0s.astype(jnp.int32))


def supports_gather(kcap: int, nch: int) -> bool:
    """Static feasibility for the downward rank gather: padded channel
    count and the compacted parent table resident in VMEM."""
    return (nch in (8, 16, 32)
            and (kcap + 2 * G) * nch * 4 <= MAX_KCAP_BYTES)


def gather_info(pmono, kcap: int):
    """Build-time arrays for the downward (parent -> child) rank gather.

    The child-row parent gather x[pmono] over a monotone id vector equals
    compact(x)[rank]: compact the parent rows that own children into dense
    rank space (a kcap-row sorted gather instead of a cap-row one), then
    expand back to child rows with the windowed one-hot MXU kernel
    (rank_place).  Returns dict(nz_idx [kcap], rankR [capp, 1],
    q0c [capp//G]); kcap is recoverable from nz_idx.shape[0].
    """
    cap = pmono.shape[0]
    capp = -(-cap // R) * R
    if capp != cap:
        pmono = jnp.pad(pmono, (0, capp - cap), mode="edge")
    start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             pmono[1:] != pmono[:-1]])
    rank = jnp.cumsum(start.astype(jnp.int32)) - 1
    q0c = (rank[::G] // G).astype(jnp.int32)
    # dense rank -> parent-row map via the segment-start positions; fill
    # past the real rank count with the LAST position so nz_idx stays
    # monotone (the sorted-gather lowering requires it); those rows read
    # the final parent's data — finite junk, masked by validity downstream
    starts = jnp.nonzero(start, size=kcap, fill_value=capp - 1)[0]
    seg_parent = pmono[starts]
    return dict(nz_idx=seg_parent, rankR=rank[:, None], q0c=q0c)


def rank_gather(x, info, num_rows: int, interpret=False):
    """Drop-in monotone-index parent gather: x [parent_space, C] ->
    [num_rows, C] rows x[pmono[i]] (junk on rows whose rank is the carried
    tail — same contract as the sorted-gather path)."""
    nz = info["nz_idx"]
    kcap = nz.shape[0]
    comp = x.at[nz].get(indices_are_sorted=True, mode="clip")
    comp = jnp.pad(comp, ((0, 2 * G), (0, 0)))
    pp = info["rankR"].shape[0]
    out = rank_place(comp, info["rankR"], info["q0c"], pp,
                     interpret=interpret)
    return out[:num_rows]


def _split3(x):
    """Exact 3-term bf16 split of f32 (for exact one-hot MXU products)."""
    x1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - x1
    x2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    return x1, x2, r1 - x2


def supports_atomsum(natoms_pad: int, nch: int) -> bool:
    """Static feasibility for the one-hot atom-deposit scatter: packed
    channels and the whole [natoms_pad, C] accumulator resident in VMEM."""
    return nch in (8, 16) and natoms_pad * nch * 4 <= MAX_KCAP_BYTES


def _atomsum_kernel(x_ref, atomL_ref, out_ref, acc_ref, sem):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    npad = acc_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    iota = jax.lax.broadcasted_iota(jnp.int32, (npad, G), 0)

    def body(j, carry):
        ids = atomL_ref[:, pl.ds(j * G, G)]                 # [1, G] lanes
        oh = (ids == iota).astype(jnp.float32)              # [npad, G]
        part = sum(jnp.dot(oh, xs, preferred_element_type=jnp.float32)
                   for xs in _split3(x_ref[pl.ds(j * G, G), :]))
        acc_ref[:] = acc_ref[:] + part
        return carry

    jax.lax.fori_loop(0, SUB, body, 0)

    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(acc_ref, out_ref, sem)
        cp.start()
        cp.wait()


def atom_scatter_sum(x, atoms, natoms: int, interpret=False):
    """Deterministic unsorted scatter-add x [rows, C] onto atoms [rows]
    (ids in [0, natoms)) -> [natoms, C], via per-128-row one-hot MXU
    products into a VMEM-resident accumulator.  Replaces the per-row XLA
    scatter of the tree's atom deposits (GVolReduceTree.cl's long-int
    atomics in the reference); exact in f32 by the 3-term bf16 split.

    Invalid/padding rows must carry zero data (atom id 0 absorbs zeros).
    """
    rows, nch = x.shape
    rowsp = -(-rows // R) * R
    x = _pad_to(x, rowsp, 0, 0)
    atomsL = _pad_to(atoms.astype(jnp.int32), rowsp, 0, 0)[None, :]
    npad = -(-natoms // G) * G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(rowsp // R,),
        in_specs=[
            pl.BlockSpec((R, nch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((npad, nch), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _atomsum_kernel,
        out_shape=jax.ShapeDtypeStruct((npad, nch), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(x, atomsL)
    return out[:natoms]


def _segsum_kernel(flush_ref, w0s_ref, x_ref, rankL_ref, out_ref,
                   acc_ref, win_ref, sem):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    nch = x_ref.shape[1]

    @pl.when(i == 0)
    def _():
        win_ref[:] = jnp.zeros(win_ref.shape, win_ref.dtype)
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    iota = jax.lax.broadcasted_iota(jnp.int32, (2 * G, G), 0)

    def body(j, carry):
        jj = i * SUB + j
        slot = rankL_ref[:, pl.ds(j * G, G)] - w0s_ref[jj]   # [1, G] lanes
        oh = (slot == iota).astype(jnp.float32)              # [2G, G]
        part = sum(jnp.dot(oh, xs, preferred_element_type=jnp.float32)
                   for xs in _split3(x_ref[pl.ds(j * G, G), :]))
        win_ref[:] = win_ref[:] + part

        @pl.when(flush_ref[jj] == 1)
        def _():
            acc_ref[pl.ds(w0s_ref[jj], G), :] = win_ref[0:G, :]
            win_ref[0:G, :] = win_ref[G:2 * G, :]
            win_ref[G:2 * G, :] = jnp.zeros((G, nch), jnp.float32)

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


def rank_segment_sum(x, rankL, flush, w0s, kcap: int, interpret=False):
    """x [rows, C] parent-sorted; rankL [1, rows] dense monotone rank;
    flush/w0s from upward_info.  Returns [kcap + 2G, C] rank sums."""
    rows, nch = x.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows // R,),
        in_specs=[
            pl.BlockSpec((R, nch), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((kcap + 2 * G, nch), jnp.float32),
                        pltpu.VMEM((2 * G, nch), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _segsum_kernel,
        out_shape=jax.ShapeDtypeStruct((kcap + 2 * G, nch), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(flush, w0s, x, rankL)


def _place_kernel(q0s_ref, prankR_ref, sums_ref, out_ref):
    i = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (G, 2 * G), 1)

    def body(j, carry):
        q0 = q0s_ref[i * SUB + j]
        rel = prankR_ref[pl.ds(j * G, G), :] - q0 * G   # [G, 1]; <0 childless
        oh = (rel == iota).astype(jnp.float32)          # [G rows, 2G ranks]
        win = sums_ref[pl.ds(q0 * G, 2 * G), :]         # [2G, C]
        out_ref[pl.ds(j * G, G), :] = sum(
            jnp.dot(oh, ws, preferred_element_type=jnp.float32)
            for ws in _split3(win))
        return carry

    jax.lax.fori_loop(0, SUB, body, 0)


def rank_place(sums, prankR, q0s, rows: int, interpret=False):
    """sums [kcap+2G, C] dense rank sums (held whole in VMEM); prankR
    [rows, 1] (-1 where childless); q0s from upward_info.  Returns
    [rows, C] with each parent row's children-sum (0 where childless)."""
    kslack, nch = sums.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // R,),
        in_specs=[
            pl.BlockSpec((R, 1), lambda i, q0s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kslack, nch), lambda i, q0s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, nch), lambda i, q0s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _place_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, nch), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(q0s, prankR, sums)


def upward_sum(x, info, num_parents: int, kcap: int, interpret=False):
    """Drop-in sorted segment-sum: x [cap, C] -> [num_parents, C].

    Pads x with zero rows to the info's R-aligned grid (zero rows add
    nothing to the carried edge rank) and slices the placed output back
    to the caller's parent space.
    """
    capp = info["rankL"].shape[1]
    x = _pad_to(x, capp, 0, 0)
    sums = rank_segment_sum(x, info["rankL"], info["flush"], info["w0s"],
                            kcap, interpret=interpret)
    pp = info["prankR"].shape[0]
    out = rank_place(sums, info["prankR"], info["q0s"], pp,
                     interpret=interpret)
    return out[:num_parents]
