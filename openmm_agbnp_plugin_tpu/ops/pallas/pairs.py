"""Fused Pallas TPU kernels for the AGBNP1 O(N^2) pair phases.

The reference implements these as OpenCL warp-tile sweeps over the neighbor
list (inverseBornRadii / VdWGBDerBorn in AGBNPBornRadii.cl:181-1610,
GBPairEnergy in AGBNPGBEnergy.cl:58-654).  The XLA formulation in ops/born.py
materializes ~10 dense [N, N] intermediates (distances, spline values and
derivatives, Born factors) in HBM between phases; these kernels instead tile
the pair space [TI, TJ] through VMEM and keep every intermediate on-chip —
the classic MXU/VPU N-body pattern.  Per step there are three sweeps with a
true data dependency between them (Born radii -> GB energy -> descreening
derivatives), so three pallas_calls:

  born_sums:    raw_i = sum_j s_j Q4(d_ij)                       (row reduce)
  gb_pair:      E_gb pairs, direct forces, Y accumulators        (row reduce)
  descreening:  W_j/U_j col sums + direct descreening forces     (row + col)

The I4 spline lookup (16-node natural spline per radius-type pair,
reference AGBNPUtils.cpp:102-214) is evaluated in-kernel: the row-type
contraction rowY[i, tj, s] = Y[type_i[i], tj, s] is precomputed once per
system (tiny: [N, Tj*16]), and each tile contracts it against the column
one-hot with per-segment [TI, Tj] @ [Tj, TJ] matmuls on the MXU, followed by
a segment select on the VPU.  One-hot contractions run at HIGHEST precision
so the selected node values are bit-exact (a bf16 MXU pass would truncate
them).

All outputs are row/column partials; the cheap per-atom tails (soft filter,
GB self energy, vdW dispersion, BrW/BrU chain factors) stay in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.constants import (
    AGBNP_I4LOOKUP_MAXA,
    AGBNP_I4LOOKUP_NA,
    DIELECTRIC_FACTOR,
)

_NA = AGBNP_I4LOOKUP_NA
_H = AGBNP_I4LOOKUP_MAXA / (_NA - 1)
_HP = jax.lax.Precision.HIGHEST
_KE = 138.935456  # kJ mol^-1 nm e^-2 (Coulomb constant, md/forces.py)


def pad_to(n: int, tile: int) -> int:
    return max(tile, (n + tile - 1) // tile * tile)


def pick_tile(n: int) -> int:
    import os

    env = os.environ.get("AGBNP_PAIR_TILE")
    if env:
        tile = int(env)
        # reject unsupported overrides up front: a tile that is not a
        # positive multiple of the 128-lane register width would surface as
        # an opaque shape/padding mismatch inside the Pallas kernels
        if tile <= 0 or tile % 128 != 0:
            raise ValueError(
                f"AGBNP_PAIR_TILE={env!r}: pair tile must be a positive "
                "multiple of 128 (e.g. 128 or 256)")
        return tile
    return 128 if n <= 1024 else 256


def prepare_pair_tables(type_screened, type_screener, yval, y2val,
                        split_bf16: bool = False):
    """Host-side prep: row-contracted spline tables + column one-hot.

    rowY[i, tj, s]  = yval[type_i[i], tj, s]   (and y2 stacked behind)
    cols_oh[j, tj]  = 1 if type_j[j] == tj else 0 (all-zero for hydrogens,
                      whose screener type is -1 — they never screen,
                      reference AGBNPUtils.cpp:168-171)
    Returns (rowY [N, Tj*2*NA], cols_oh [N, Tj]) as numpy float arrays.

    With split_bf16, rowY is instead returned as a 3-way bfloat16 mantissa
    split in (segment, [y|y2], type)-major layout, [N, 3*NA*2*Tj].  The
    one-hot selection matmul is then exact in THREE single-pass bf16 MXU
    matmuls (0/1 is exact in bf16, and an f32 value is exactly the sum of
    its three 8-bit mantissa chunks) instead of the 6-pass
    Precision.HIGHEST f32 contraction — the same bit-exact node values at
    half the MXU work.  cols_oh comes back bfloat16 to match.
    """
    ti = np.asarray(type_screened)
    tj = np.asarray(type_screener)
    yval = np.asarray(yval)
    y2val = np.asarray(y2val)
    ntj = yval.shape[1]
    if split_bf16:
        import ml_dtypes

        bf16 = ml_dtypes.bfloat16
        # [N, NA, 2, Tj]: per segment the y and y2 node rows sit adjacent so
        # the kernel selects both with one block-diagonal one-hot matmul
        P = np.stack([yval[ti], y2val[ti]], axis=3)   # [N, Tj, NA, 2]
        P = np.transpose(P, (0, 2, 3, 1)).reshape(len(ti), -1)
        P = P.astype(np.float32)
        s0 = P.astype(bf16)
        r1 = P - s0.astype(np.float32)
        s1 = r1.astype(bf16)
        s2 = (r1 - s1.astype(np.float32)).astype(bf16)
        rowY = np.concatenate([s0, s1, s2], axis=1)   # [N, 3*NA*2*Tj]
        cols_oh = (tj[:, None] == np.arange(ntj)[None, :]).astype(bf16)
        return rowY, cols_oh
    rowY = np.concatenate([yval[ti], y2val[ti]], axis=2)  # [N, Tj, 2*NA]
    # s-major layout [N, 2*NA, Tj] so the kernel's per-segment [TI, Tj]
    # slice is a contiguous static slice (no in-kernel relayout)
    rowY = np.transpose(rowY, (0, 2, 1))
    cols_oh = (tj[:, None] == np.arange(ntj)[None, :]).astype(np.float64)
    return rowY.reshape(len(ti), -1), cols_oh


def _tile_spline(rowY_blk, cols_oh_blk, d, mask, ntj, deriv,
                 horizon=None):
    """Per-tile spline eval. rowY_blk [TI, 2*NA*Tj] (s-major) f32/f64, or
    the 3-way bf16 mantissa split [TI, 3*NA*2*Tj] from
    prepare_pair_tables(split_bf16=True); cols_oh_blk [TJ, Tj]; d [TI, TJ].
    Returns (Q, dQ or None), masked.

    With horizon < 2 nm (the OpenCL-backend cutoff mode), every unmasked
    pair has seg <= floor(horizon/h), so only nodes 0..seg_max+1 can ever
    be selected — the segment loop (the MXU node-selection matmuls, the
    dominant per-tile cost) shrinks proportionally, exactly."""
    dt = d.dtype
    seg = jnp.clip((d * (1.0 / _H)).astype(jnp.int32), 0, _NA - 2)
    split = rowY_blk.dtype == jnp.bfloat16
    na_eff = _NA
    if horizon is not None and horizon < AGBNP_I4LOOKUP_MAXA:
        na_eff = min(_NA, int(horizon / _H) + 2)

    if split:
        # block-diagonal one-hot [2*TJ, 2*Tj] so one matmul selects the
        # segment's y AND y2 node values ([TI, 2*TJ] output); 0/1 and the
        # mantissa chunks are exact in bf16, so summing the three
        # single-pass selections reproduces the f32 node value bit-exactly
        z = jnp.zeros_like(cols_oh_blk)
        oh2 = jnp.concatenate([
            jnp.concatenate([cols_oh_blk, z], axis=1),
            jnp.concatenate([z, cols_oh_blk], axis=1),
        ], axis=0)
        tj_cols = cols_oh_blk.shape[0]
        W = 2 * ntj
        span = _NA * W

    zero = jnp.zeros_like(d)
    y0 = y1 = y20 = y21 = zero
    for s in range(na_eff):
        if split:
            node = None
            for k in range(3):
                lo = k * span + s * W
                part = jax.lax.dot_general(
                    rowY_blk[:, lo:lo + W], oh2,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=dt)
                node = part if node is None else node + part
            node_y = node[:, :tj_cols]
            node_y2 = node[:, tj_cols:]
        else:
            # node value for every pair in the tile: [TI, Tj] @ [Tj, TJ]
            node_y = jax.lax.dot_general(
                rowY_blk[:, s * ntj:(s + 1) * ntj], cols_oh_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=_HP, preferred_element_type=dt)
            node_y2 = jax.lax.dot_general(
                rowY_blk[:, (_NA + s) * ntj:(_NA + s + 1) * ntj], cols_oh_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=_HP, preferred_element_type=dt)
        if s < _NA - 1:
            m = (seg == s).astype(dt)
            y0 = y0 + m * node_y
            y20 = y20 + m * node_y2
        if s > 0:
            m1 = (seg == s - 1).astype(dt)
            y1 = y1 + m1 * node_y
            y21 = y21 + m1 * node_y2

    xk = seg.astype(dt) * _H
    a = (xk + _H - d) * (1.0 / _H)
    b = 1.0 - a
    fm = mask.astype(dt)
    q = (a * y0 + b * y1
         + ((a ** 3 - a) * y20 + (b ** 3 - b) * y21) * (_H * _H) / 6.0) * fm
    if not deriv:
        return q, None
    dq = ((y1 - y0) * (1.0 / _H)
          + ((3.0 * b * b - 1.0) * y21 - (3.0 * a * a - 1.0) * y20)
          * (_H / 6.0)) * fm
    return q, dq


def _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box):
    """Tile deltas dx,dy,dz [TI,TJ] = pos_j - pos_i (min-image if box).

    box is a static tuple: 3 floats (orthorhombic edge lengths) or 9
    floats (reduced triclinic row vectors a;b;c row-major, sequential
    c/b/a wrap — same convention as ops/born.py::min_image)."""
    dx = pxc[0][None, :] - pxr[0][:, None]
    dy = pyc[0][None, :] - pyr[0][:, None]
    dz = pzc[0][None, :] - pzr[0][:, None]
    if box is not None and len(box) == 3:
        bx, by, bz = box
        dx = dx - bx * jnp.round(dx * (1.0 / bx))
        dy = dy - by * jnp.round(dy * (1.0 / by))
        dz = dz - bz * jnp.round(dz * (1.0 / bz))
    elif box is not None:
        ax, _, _, bx, by, _, cx, cy, cz = box
        k = jnp.round(dz * (1.0 / cz))
        dx, dy, dz = dx - k * cx, dy - k * cy, dz - k * cz
        k = jnp.round(dy * (1.0 / by))
        dx, dy = dx - k * bx, dy - k * by
        dx = dx - ax * jnp.round(dx * (1.0 / ax))
    d2 = dx * dx + dy * dy + dz * dz
    return dx, dy, dz, d2


def _tile_ids(ti_, tj_, i, j):
    gi = jax.lax.broadcasted_iota(jnp.int32, (ti_, tj_), 0) + i * ti_
    gj = jax.lax.broadcasted_iota(jnp.int32, (ti_, tj_), 1) + j * tj_
    return gi, gj


# ---------------------------------------------------------------------------
# Interacting-tile lists
# ---------------------------------------------------------------------------
#
# The reference's core scaling device is the compacted interacting-tile list:
# its sweeps ride OpenMM's neighbor tiles instead of the full tile grid
# (GVolOverlapTree.cl:139-142, rebound per step at
# OpenCLAGBNPKernels.cpp:3521-3530).  The TPU analogue: per evaluation,
# bound each [tile] row/column block by its AABB (Morton ordering makes
# blocks spatially tight), keep only tile pairs whose center distance minus
# both half-diagonals is inside the interaction range, compact them into an
# i-major (ti, tj) list, and launch a 1-D Pallas grid over the list with
# scalar-prefetched block index maps — out-of-range tiles are never visited
# at all (no DMA, no geometry, no grid step).  The list length is a static
# budget sized from the initial configuration; the actual in-range count
# rides the diagnostics so the PanicButton regrows the budget on overflow
# (same channel as the neighbor list's kmax).


def tile_bounds(pos_pad, valid, tile: int):
    """Per-tile AABB (center [3, NT], half-diagonal radius [NT]) of the
    valid atoms in each contiguous block of `tile` packed columns.  Empty
    tiles get radius -1e30 so every distance test excludes them."""
    dt = pos_pad.dtype
    nt = pos_pad.shape[1] // tile
    p = pos_pad.reshape(3, nt, tile)
    v = valid.reshape(1, nt, tile)
    big = jnp.asarray(1e30, dt)
    lo = jnp.min(jnp.where(v, p, big), axis=2)
    hi = jnp.max(jnp.where(v, p, -big), axis=2)
    has = jnp.any(v[0], axis=1)
    lo = jnp.where(has[None, :], lo, 0.0)
    hi = jnp.where(has[None, :], hi, 0.0)
    center = 0.5 * (lo + hi)
    rad = jnp.where(has, 0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=0)),
                    -big)
    return center, rad


def build_tile_list(ci, ri, cj, rj, rng_dist: float, lmax: int,
                    triangular: bool = False, box=None):
    """Compact the in-range tile pairs into an i-major scalar list.

    ci/ri, cj/rj: tile_bounds of the row and column packings.  A tile pair
    survives iff the AABB lower distance bound  |c_i - c_j| - r_i - r_j
    (min-image on centers when box is given) is < rng_dist — conservative:
    it can only keep extra tiles, never drop a pair the kernels' own masks
    would accept.  With triangular, only tj >= ti pairs are listed (the GB
    sweep's unordered-pair convention).

    Returns (tl [2, lmax] int32 (ti; tj), nv [1] int32 = min(count, lmax),
    count [] int32).  count > lmax means the budget overflowed and the
    evaluation is incomplete — detected by the caller's PanicButton.
    """
    nti, ntj = ri.shape[0], rj.shape[0]
    dc = ci.T[:, None, :] - cj.T[None, :, :]
    if box is not None:
        from ..born import min_image
        dc = min_image(dc, jnp.asarray(box, dc.dtype).reshape(-1, 3)
                       if len(box) == 9 else jnp.asarray(box, dc.dtype))
    dmin = jnp.sqrt(jnp.sum(dc * dc, axis=-1)) - ri[:, None] - rj[None, :]
    ok = dmin < rng_dist
    if triangular:
        ok = ok & (jnp.arange(ntj, dtype=jnp.int32)[None, :]
                   >= jnp.arange(nti, dtype=jnp.int32)[:, None])
    ntot = nti * ntj
    sentinel = jnp.int32(ntot)
    key = jnp.where(ok.reshape(-1), jnp.arange(ntot, dtype=jnp.int32),
                    sentinel)
    if ntot < lmax:
        key = jnp.pad(key, (0, lmax - ntot), constant_values=ntot)
    order = jax.lax.sort(key)[:lmax]
    count = jnp.sum(ok).astype(jnp.int32)
    order = jnp.where(order < sentinel, order, 0)
    tl = jnp.stack([order // ntj, order % ntj]).astype(jnp.int32)
    return tl, jnp.minimum(count, lmax)[None], count


def host_tile_count(pos_row, valid_row, pos_col, valid_col, tile: int,
                    rng_dist: float, triangular: bool = False,
                    box=None) -> int:
    """NumPy twin of build_tile_list's count, for sizing the static budget
    from the initial configuration at model init."""
    import numpy as _np

    def bounds(p, v):
        nt = p.shape[1] // tile
        pp = p.reshape(3, nt, tile)
        vv = v.reshape(1, nt, tile)
        lo = _np.min(_np.where(vv, pp, 1e30), axis=2)
        hi = _np.max(_np.where(vv, pp, -1e30), axis=2)
        has = _np.any(vv[0], axis=1)
        lo = _np.where(has[None], lo, 0.0)
        hi = _np.where(has[None], hi, 0.0)
        c = 0.5 * (lo + hi)
        r = _np.where(has, 0.5 * _np.sqrt(((hi - lo) ** 2).sum(0)), -1e30)
        return c, r

    ci, ri = bounds(_np.asarray(pos_row, _np.float64), _np.asarray(valid_row))
    cj, rj = bounds(_np.asarray(pos_col, _np.float64), _np.asarray(valid_col))
    dc = ci.T[:, None, :] - cj.T[None, :, :]
    if box is not None:
        b = _np.asarray(box, _np.float64).reshape(-1, 3)
        if b.shape[0] == 1:
            b = b[0]
            dc = dc - b * _np.round(dc / b)
        else:
            a_, b_, c_ = b
            dc = dc - _np.round(dc[..., 2:3] / c_[2]) * c_
            dc = dc - _np.round(dc[..., 1:2] / b_[1]) * b_
            dc = dc - _np.round(dc[..., 0:1] / a_[0]) * a_
    dmin = _np.sqrt((dc ** 2).sum(-1)) - ri[:, None] - rj[None, :]
    ok = dmin < rng_dist
    if triangular:
        ok &= (_np.arange(rj.shape[0])[None, :]
               >= _np.arange(ri.shape[0])[:, None])
    return int(ok.sum())


# ---------------------------------------------------------------------------
# Kernel A: inverse-Born-radius descreening sums
# ---------------------------------------------------------------------------

def _born_kernel(pxr, pyr, pzr, pxc, pyc, pzc, hid, rowY, colsoh, sj, *refs,
                 ntj, n, box, horizon, save_qd):
    out = refs[0]
    i = pl.program_id(0)
    j = pl.program_id(1)
    ti_ = pxr.shape[1]
    dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
    d = jnp.sqrt(d2)
    gi = jax.lax.broadcasted_iota(jnp.int32, (ti_, pxc.shape[1]), 0) + i * ti_
    gj = hid[0][None, :]
    mask = ((gi != gj) & (gi < n) & (gj >= 0)
            & (d < horizon))

    @pl.when(j == 0)
    def _():
        out[0, :] = jnp.zeros_like(out[0, :])

    if save_qd:
        # every (i, j) block is visited exactly once: default the saved
        # tiles to the exact out-of-range value (0) so skipped tiles stay
        # correct for the descreening pass that reloads them
        refs[1][...] = jnp.zeros_like(refs[1])
        refs[2][...] = jnp.zeros_like(refs[2])

    # the spline contraction (MXU matmuls) only runs for tiles with at
    # least one pair inside the 2 nm LUT range — beyond it Q is exactly 0
    # (reference AGBNPUtils.cpp:113-127), so skipped tiles change nothing
    @pl.when(jnp.any(mask))
    def _():
        q, dq = _tile_spline(rowY[...], colsoh[...], d, mask, ntj,
                             deriv=save_qd, horizon=horizon)
        out[0, :] = out[0, :] + jnp.sum(q * sj[0][None, :], axis=1)
        if save_qd:
            refs[1][...] = q
            refs[2][...] = dq


def born_sums(pos_pad, pos_hpad, hids_pad, rowY, cols_oh_h, s_hpad, n, tile,
              box=None, interpret=False, horizon=None, save_qd=False):
    """raw_i = sum_j s_j Q4(d_ij) with the screener (column) axis packed to
    heavy atoms only: hydrogens never screen (zero self-volume and screener
    type -1, reference AGBNPUtils.cpp:168-171), so their columns are
    dropped instead of masked.

    pos_pad [3, NP] (screened rows); pos_hpad [3, NHP] (heavy screeners);
    hids_pad [NHP] global atom index per packed column (-1 padding);
    rowY [NP, Tj*2*NA]; cols_oh_h [NHP, Tj]; s_hpad [NHP].
    Mirrors inverseBornRadii (reference AGBNPBornRadii.cl:181-490;
    CPU loop ReferenceAGBNPKernels.cpp:437-454).

    With save_qd, also returns the masked (Q [NP, NHP], dQ [NP, NHP])
    tiles so the descreening sweep can reload them instead of re-running
    the spline contraction — the Pallas analogue of the XLA path's shared
    geom dict (ops/born.py::born_radii keeping Q/dQ for the sweep).
    """
    npad = pos_pad.shape[1]
    nhpad = pos_hpad.shape[1]
    ntj = cols_oh_h.shape[1]
    grid = (npad // tile, nhpad // tile)
    dt = pos_pad.dtype
    row = lambda i, j: (0, i)
    col = lambda i, j: (0, j)
    out_specs = [pl.BlockSpec((1, tile), row)]
    out_shape = [jax.ShapeDtypeStruct((1, npad), dt)]
    if save_qd:
        out_specs += [pl.BlockSpec((tile, tile), lambda i, j: (i, j))] * 2
        out_shape += [jax.ShapeDtypeStruct((npad, nhpad), dt)] * 2
    out = pl.pallas_call(
        functools.partial(_born_kernel, ntj=ntj, n=n,
                          box=None if box is None else tuple(box),
                          horizon=(AGBNP_I4LOOKUP_MAXA if horizon is None
                                   else min(horizon, AGBNP_I4LOOKUP_MAXA)),
                          save_qd=save_qd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), row),
            pl.BlockSpec((1, tile), row),
            pl.BlockSpec((1, tile), col), pl.BlockSpec((1, tile), col),
            pl.BlockSpec((1, tile), col),
            pl.BlockSpec((1, tile), col),
            pl.BlockSpec((tile, rowY.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, ntj), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile), col),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      pos_hpad[0:1], pos_hpad[1:2], pos_hpad[2:3], hids_pad[None, :],
      rowY, cols_oh_h, s_hpad[None, :])
    if save_qd:
        return out[0][0], out[1], out[2]
    # out_shape is a list, so pallas_call returns a 1-tuple even without
    # save_qd; out[0] is the (1, npad) accumulator row, not its contents.
    return out[0][0]


# ---------------------------------------------------------------------------
# Kernel B: GB pair energy, direct forces, Y accumulators
# ---------------------------------------------------------------------------

def _gb_kernel(pxr, pyr, pzr, pxc, pyc, pzc, qr, qc, br, bc,
               sgr, sgc, epr, epc, exr,
               erow, yrow, fx, fy, fz, mmrow, *, n, box, cutoff, with_mm):
    """Triangular sweep: each unordered pair is computed ONCE, on the tile
    with j >= i (the reference's own y <= x tile convention,
    AGBNPBornRadii.cl:372), and deposited on BOTH sides into full-width
    VMEM-resident accumulators — half the tile work of a full sweep."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        for ref in (erow, yrow, fx, fy, fz) + ((mmrow,) if with_mm else ()):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(j >= i)
    def _():
        ti_ = pxr.shape[1]
        tj_ = pxc.shape[1]
        dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
        gi, gj = _tile_ids(ti_, tj_, i, j)
        # strict upper triangle: every unordered pair exactly once
        mask = (gi < gj) & (gj < n)
        if cutoff is not None:
            mask = mask & (d2 < cutoff * cutoff)
        dt = dx.dtype
        rsl = (0, pl.dslice(i * ti_, ti_))
        csl = (0, pl.dslice(j * tj_, tj_))

        # with a cutoff every pair term vanishes on fully-out-of-range
        # tiles (fgb, mw, fmm all carry the mask factor), so they skip the
        # tile body entirely — with Morton-ordered atoms most far tiles do
        @pl.when(jnp.any(mask))
        def _():
            fm = mask.astype(dt)
            # sanitize masked pairs (padded atoms have B=0): keep etij
            # finite so NaNs cannot leak through the zeroed fgb
            bb = br[0][:, None] * bc[0][None, :]
            bb_safe = jnp.where(mask, bb, 1.0)
            etij = jnp.exp(-0.25 * jnp.where(mask, d2, 0.0) / bb_safe)
            inv = jax.lax.rsqrt(jnp.where(mask, d2 + bb * etij, 1.0))
            fgb = fm * inv
            qq_f = qr[0][:, None] * qc[0][None, :]
            qq = DIELECTRIC_FACTOR * qq_f

            epair = qq * fgb
            fgb3 = fgb * fgb * fgb
            mw = -2.0 * qq * (1.0 - 0.25 * etij) * fgb3
            ypair = qq_f * (bb + 0.25 * d2) * etij * fgb3

            if with_mm:
                # OPLS LJ (geometric rules) + Coulomb riding the same tile
                # geometry.  Excluded pairs are skipped IN-KERNEL via the
                # per-row exclusion lists (symmetric, so the row side
                # suffices): subtracting them outside would leave f32
                # cancellation residue of the huge bonded-pair LJ terms
                ex = exr[...]  # [TI, E]
                excluded = jnp.zeros_like(mask)
                for e in range(ex.shape[1]):
                    excluded = excluded | (ex[:, e][:, None] == gj)
                fmm = fm * (~excluded).astype(dt)
                inv2 = fmm / jnp.where(mask, d2, 1.0)
                sr2 = (sgr[0][:, None] * sgc[0][None, :]) * inv2
                sr6 = sr2 * sr2 * sr2
                epsij = epr[0][:, None] * epc[0][None, :]
                rinv = fmm * jax.lax.rsqrt(jnp.where(mask, d2, 1.0))
                ecoul = _KE * qq_f * rinv
                elj = 4.0 * epsij * (sr6 * sr6 - sr6)
                mmpair = elj + ecoul
                dmm = (4.0 * epsij * (-6.0 * sr6 * sr6 + 3.0 * sr6)
                       - 0.5 * ecoul) * inv2
                mw = mw + 2.0 * dmm
                mmrow[rsl] += jnp.sum(mmpair, axis=1)
                mmrow[csl] += jnp.sum(mmpair, axis=0)

            erow[rsl] += jnp.sum(epair, axis=1)
            erow[csl] += jnp.sum(epair, axis=0)
            yrow[rsl] += jnp.sum(ypair, axis=1)
            yrow[csl] += jnp.sum(ypair, axis=0)
            cx = dx * mw
            cy = dy * mw
            cz = dz * mw
            fx[rsl] += jnp.sum(cx, axis=1)
            fx[csl] += -jnp.sum(cx, axis=0)
            fy[rsl] += jnp.sum(cy, axis=1)
            fy[csl] += -jnp.sum(cy, axis=0)
            fz[rsl] += jnp.sum(cz, axis=1)
            fz[csl] += -jnp.sum(cz, axis=0)


def gb_pair(pos_pad, charge_pad, born_pad, n, tile, box=None, cutoff=None,
            sig_pad=None, epsq_pad=None, excl_rows_pad=None,
            interpret=False):
    """GB pair sweep (reference ReferenceAGBNPKernels.cpp:464-504,
    GBPairEnergy kernel AGBNPGBEnergy.cl:58-383), triangular tiles.

    Returns (gb_pair_energy_rows [NP], Y_rows [NP], force [NP, 3],
    mm_rows [NP] or None); the row energy sums count each unordered pair
    twice (deposited once on each side), matching the reference's
    2 f_eps qq fgb pair term when summed (halve the mm_rows sum for the MM
    energy).  With sig_pad/epsq_pad (sigma and sqrt(epsilon)), the OPLS
    dense LJ+Coulomb sum and its forces ride the same sweep.
    """
    npad = pos_pad.shape[1]
    grid = (npad // tile, npad // tile)
    dt = pos_pad.dtype
    with_mm = sig_pad is not None
    row = lambda i, j: (0, i)
    col = lambda i, j: (0, j)
    full = lambda i, j: (0, 0)
    shp = jax.ShapeDtypeStruct((1, npad), dt)
    if not with_mm:
        sig_pad = jnp.zeros(npad, dt)
        epsq_pad = jnp.zeros(npad, dt)
        excl_rows_pad = jnp.full((npad, 8), -1, jnp.int32)
    erow, yrow, fx, fy, fz, mmrow = pl.pallas_call(
        functools.partial(_gb_kernel, n=n,
                          box=None if box is None else tuple(box),
                          cutoff=cutoff, with_mm=with_mm),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile), row)] * 3
        + [pl.BlockSpec((1, tile), col)] * 3
        + [pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((tile, excl_rows_pad.shape[1]),
                        lambda i, j: (i, 0))],
        out_specs=[pl.BlockSpec((1, npad), full)] * 6,
        out_shape=[shp] * 6,
        interpret=interpret,
    )(pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      charge_pad[None, :], charge_pad[None, :],
      born_pad[None, :], born_pad[None, :],
      sig_pad[None, :], sig_pad[None, :],
      epsq_pad[None, :], epsq_pad[None, :],
      excl_rows_pad)
    force = jnp.stack([fx[0], fy[0], fz[0]], axis=1)
    return erow[0], yrow[0], force, (mmrow[0] if with_mm else None)


# ---------------------------------------------------------------------------
# Kernel C: descreening derivative sweep (W/U accumulators + direct forces)
# ---------------------------------------------------------------------------

def _descreen_kernel(pxr, pyr, pzr, pxc, pyc, pzc, hid, rowY, colsoh, sj,
                     brwr, brur, fx, fy, fz, wcol, ucol, fcx, fcy, fcz,
                     *, ntj, n, box, horizon):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ti_ = pxr.shape[1]
    tj_ = pxc.shape[1]
    dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
    d = jnp.sqrt(d2)
    gi = jax.lax.broadcasted_iota(jnp.int32, (ti_, tj_), 0) + i * ti_
    gj = hid[0][None, :]
    mask = (gi != gj) & (gi < n) & (gj >= 0) & (d < horizon)

    # column accumulators live as full-width [1, NHP] blocks with a constant
    # index map: the TPU grid is serial, so the whole row stays in VMEM for
    # the entire sweep and slices can be accumulated in any visit order
    # (a [n_tiles, NHP] partials layout would violate Mosaic's (8, 128)
    # block-shape rule on the n_tiles axis)
    @pl.when((i == 0) & (j == 0))
    def _():
        for ref in (wcol, ucol, fcx, fcy, fcz):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(j == 0)
    def _():
        fx[0, :] = jnp.zeros_like(fx[0, :])
        fy[0, :] = jnp.zeros_like(fy[0, :])
        fz[0, :] = jnp.zeros_like(fz[0, :])

    # all pair terms vanish beyond the 2 nm LUT range (Q = dQ = 0), so
    # fully-out-of-range tiles skip the spline contraction entirely
    @pl.when(jnp.any(mask))
    def _():
        q, dq = _tile_spline(rowY[...], colsoh[...], d, mask, ntj,
                             deriv=True, horizon=horizon)

        # W_j += BrW_i Q_ij, U_j += BrU_i Q_ij: column sums for this tile
        sl = (0, pl.dslice(j * tj_, tj_))
        wcol[sl] += jnp.sum(brwr[0][:, None] * q, axis=0)
        ucol[sl] += jnp.sum(brur[0][:, None] * q, axis=0)

        # direct descreening forces: c_ij = (BrW+BrU)_i s_j dQ/d
        dt = dx.dtype
        c = ((brwr[0] + brur[0])[:, None] * sj[0][None, :] * dq
             * jnp.where(mask, 1.0 / jnp.where(mask, d, 1.0), 0.0).astype(dt))
        fx[0, :] += jnp.sum(c * dx, axis=1)
        fy[0, :] += jnp.sum(c * dy, axis=1)
        fz[0, :] += jnp.sum(c * dz, axis=1)
        # column side: force_j -= sum_i c_ij * dist_ij
        fcx[sl] += -jnp.sum(c * dx, axis=0)
        fcy[sl] += -jnp.sum(c * dy, axis=0)
        fcz[sl] += -jnp.sum(c * dz, axis=0)


def _descreen_qd_kernel(pxr, pyr, pzr, pxc, pyc, pzc, qt, dqt, sj,
                        brwr, brur, fx, fy, fz, wcol, ucol, fcx, fcy, fcz,
                        *, box):
    """Descreening sweep reloading the Born pass's saved (Q, dQ) tiles:
    no spline contraction, just geometry + the masked-by-construction
    weights (Q = dQ = 0 outside the horizon / for invalid pairs)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tj_ = pxc.shape[1]
    dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
    d = jnp.sqrt(d2)

    @pl.when((i == 0) & (j == 0))
    def _():
        for ref in (wcol, ucol, fcx, fcy, fcz):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(j == 0)
    def _():
        fx[0, :] = jnp.zeros_like(fx[0, :])
        fy[0, :] = jnp.zeros_like(fy[0, :])
        fz[0, :] = jnp.zeros_like(fz[0, :])

    q = qt[...]
    dq = dqt[...]

    @pl.when(jnp.any(q != 0.0) | jnp.any(dq != 0.0))
    def _():
        sl = (0, pl.dslice(j * tj_, tj_))
        wcol[sl] += jnp.sum(brwr[0][:, None] * q, axis=0)
        ucol[sl] += jnp.sum(brur[0][:, None] * q, axis=0)
        dt = dx.dtype
        # dq is exactly 0 for every masked pair, so only a 0-distance
        # guard is needed (a padded column can sit at the origin)
        c = ((brwr[0] + brur[0])[:, None] * sj[0][None, :] * dq
             * jnp.where(d > 0.0, 1.0 / jnp.where(d > 0.0, d, 1.0),
                         0.0).astype(dt))
        fx[0, :] += jnp.sum(c * dx, axis=1)
        fy[0, :] += jnp.sum(c * dy, axis=1)
        fz[0, :] += jnp.sum(c * dz, axis=1)
        fcx[sl] += -jnp.sum(c * dx, axis=0)
        fcy[sl] += -jnp.sum(c * dy, axis=0)
        fcz[sl] += -jnp.sum(c * dz, axis=0)


def descreening(pos_pad, pos_hpad, hids_pad, rowY, cols_oh_h, s_hpad,
                brw_pad, bru_pad, n, tile, box=None, interpret=False,
                horizon=None, qd=None):
    """Descreening derivative sweep (reference
    ReferenceAGBNPKernels.cpp:555-586, VdWGBDerBorn
    AGBNPBornRadii.cl:872-1280) with heavy-packed screener columns.

    Returns (W [NHP], U [NHP], force_rows [NP, 3], force_cols [NHP, 3]);
    the column-side quantities are in packed heavy layout — scatter them
    back to atom order with hids_pad.  Row reductions accumulate in-block
    across the j-minor grid; column reductions accumulate into full-width
    [1, NHP] VMEM-resident blocks (constant index map).

    With qd=(Q, dQ) from born_sums(save_qd=True), the spline contraction
    is skipped entirely and the saved tiles are reloaded.
    """
    npad = pos_pad.shape[1]
    nhpad = pos_hpad.shape[1]
    ntj = cols_oh_h.shape[1]
    grid = (npad // tile, nhpad // tile)
    dt = pos_pad.dtype
    row = lambda i, j: (0, i)
    col = lambda i, j: (0, j)
    full = lambda i, j: (0, 0)
    rowshp = jax.ShapeDtypeStruct((1, npad), dt)
    colshp = jax.ShapeDtypeStruct((1, nhpad), dt)
    if qd is not None:
        kern = functools.partial(
            _descreen_qd_kernel, box=None if box is None else tuple(box))
        mid_specs = [pl.BlockSpec((tile, tile), lambda i, j: (i, j))] * 2
        mid_args = (qd[0], qd[1])
    else:
        kern = functools.partial(
            _descreen_kernel, ntj=ntj, n=n,
            box=None if box is None else tuple(box),
            horizon=(AGBNP_I4LOOKUP_MAXA if horizon is None
                     else min(horizon, AGBNP_I4LOOKUP_MAXA)))
        mid_specs = [pl.BlockSpec((1, tile), col),
                     pl.BlockSpec((tile, rowY.shape[1]), lambda i, j: (i, 0)),
                     pl.BlockSpec((tile, ntj), lambda i, j: (j, 0))]
        mid_args = (hids_pad[None, :], rowY, cols_oh_h)
    fx, fy, fz, w, u, fcx, fcy, fcz = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile), row)] * 3
        + [pl.BlockSpec((1, tile), col)] * 3
        + mid_specs
        + [pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), row)],
        out_specs=[pl.BlockSpec((1, tile), row)] * 3
        + [pl.BlockSpec((1, nhpad), full)] * 5,
        out_shape=[rowshp] * 3 + [colshp] * 5,
        interpret=interpret,
    )(pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      pos_hpad[0:1], pos_hpad[1:2], pos_hpad[2:3], *mid_args,
      s_hpad[None, :], brw_pad[None, :], bru_pad[None, :])
    force_rows = jnp.stack([fx[0], fy[0], fz[0]], axis=1)
    force_cols = jnp.stack([fcx[0], fcy[0], fcz[0]], axis=1)
    return w[0], u[0], force_rows, force_cols


# ---------------------------------------------------------------------------
# Interacting-tile-list kernel variants: 1-D grid over the compacted
# (ti, tj) list with scalar-prefetched block index maps.  Out-of-range tile
# pairs are never visited; all outputs are full-width VMEM-resident
# accumulators (constant index maps) written with dynamic lane slices, so
# any visit order is correct (the list is i-major for locality only).
# ---------------------------------------------------------------------------


def _born_kernel_tl(nv, tl, pxr, pyr, pzr, pxc, pyc, pzc, hid, rowY, colsoh,
                    sj, *refs, ntj, n, box, horizon, tile, save_qd):
    out = refs[0]
    l = pl.program_id(0)
    i = tl[0, l]

    @pl.when(l == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    if save_qd:
        # every list entry owns its [1, T, T] saved tile; zero-fill so
        # mask-empty entries stay exact for the descreening reload
        refs[1][...] = jnp.zeros_like(refs[1])
        refs[2][...] = jnp.zeros_like(refs[2])

    @pl.when(l < nv[0])
    def _():
        dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
        d = jnp.sqrt(d2)
        gi = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) + i * tile)
        gj = hid[0][None, :]
        mask = (gi != gj) & (gi < n) & (gj >= 0) & (d < horizon)

        @pl.when(jnp.any(mask))
        def _():
            q, dq = _tile_spline(rowY[...], colsoh[...], d, mask, ntj,
                                 deriv=save_qd, horizon=horizon)
            sl = (0, pl.dslice(i * tile, tile))
            out[sl] += jnp.sum(q * sj[0][None, :], axis=1)
            if save_qd:
                refs[1][...] = q[None]
                refs[2][...] = dq[None]


def born_sums_tiles(nv, tl, pos_pad, pos_hpad, hids_pad, rowY, cols_oh_h,
                    s_hpad, n, tile, box=None, interpret=False,
                    horizon=None, save_qd=False):
    """born_sums over the compacted interacting-tile list (tl, nv) from
    build_tile_list.  Returns raw [NP], or (raw, Q, dQ) with save_qd where
    Q/dQ are [lmax, T, T] per-list-entry tiles the descreening sweep
    reloads by list index — the list-compacted analogue of the dense
    path's [NP, NHP] shared-spline buffers, sized by the list instead of
    the full pair space."""
    npad = pos_pad.shape[1]
    ntj = cols_oh_h.shape[1]
    dt = pos_pad.dtype
    lmax = tl.shape[1]
    row = lambda l, nv, tl: (0, tl[0, l])
    col = lambda l, nv, tl: (0, tl[1, l])
    full = lambda l, nv, tl: (0, 0)
    out_specs = [pl.BlockSpec((1, npad), full)]
    out_shape = [jax.ShapeDtypeStruct((1, npad), dt)]
    if save_qd:
        out_specs += [pl.BlockSpec((1, tile, tile),
                                   lambda l, nv, tl: (l, 0, 0))] * 2
        out_shape += [jax.ShapeDtypeStruct((lmax, tile, tile), dt)] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(lmax,),
        in_specs=[
            pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), row),
            pl.BlockSpec((1, tile), row),
            pl.BlockSpec((1, tile), col), pl.BlockSpec((1, tile), col),
            pl.BlockSpec((1, tile), col),
            pl.BlockSpec((1, tile), col),
            pl.BlockSpec((tile, rowY.shape[1]), lambda l, nv, tl:
                         (tl[0, l], 0)),
            pl.BlockSpec((tile, ntj), lambda l, nv, tl: (tl[1, l], 0)),
            pl.BlockSpec((1, tile), col),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        functools.partial(_born_kernel_tl, ntj=ntj, n=n,
                          box=None if box is None else tuple(box),
                          horizon=(AGBNP_I4LOOKUP_MAXA if horizon is None
                                   else min(horizon, AGBNP_I4LOOKUP_MAXA)),
                          tile=tile, save_qd=save_qd),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(nv, tl,
      pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      pos_hpad[0:1], pos_hpad[1:2], pos_hpad[2:3], hids_pad[None, :],
      rowY, cols_oh_h, s_hpad[None, :])
    if save_qd:
        return out[0][0], out[1], out[2]
    return out[0][0]


def _gb_kernel_tl(nv, tl, pxr, pyr, pzr, pxc, pyc, pzc, qr, qc, br, bc,
                  sgr, sgc, epr, epc, exr,
                  erow, yrow, fx, fy, fz, mmrow, *, n, box, cutoff, with_mm,
                  tile):
    l = pl.program_id(0)
    i = tl[0, l]
    j = tl[1, l]

    @pl.when(l == 0)
    def _():
        for ref in (erow, yrow, fx, fy, fz) + ((mmrow,) if with_mm else ()):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(l < nv[0])
    def _():
        dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
        gi = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) + i * tile)
        gj = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) + j * tile)
        mask = (gi < gj) & (gj < n)
        if cutoff is not None:
            mask = mask & (d2 < cutoff * cutoff)
        dt = dx.dtype
        rsl = (0, pl.dslice(i * tile, tile))
        csl = (0, pl.dslice(j * tile, tile))

        @pl.when(jnp.any(mask))
        def _():
            fm = mask.astype(dt)
            bb = br[0][:, None] * bc[0][None, :]
            bb_safe = jnp.where(mask, bb, 1.0)
            etij = jnp.exp(-0.25 * jnp.where(mask, d2, 0.0) / bb_safe)
            inv = jax.lax.rsqrt(jnp.where(mask, d2 + bb * etij, 1.0))
            fgb = fm * inv
            qq_f = qr[0][:, None] * qc[0][None, :]
            qq = DIELECTRIC_FACTOR * qq_f

            epair = qq * fgb
            fgb3 = fgb * fgb * fgb
            mw = -2.0 * qq * (1.0 - 0.25 * etij) * fgb3
            ypair = qq_f * (bb + 0.25 * d2) * etij * fgb3

            if with_mm:
                ex = exr[...]
                excluded = jnp.zeros_like(mask)
                for e in range(ex.shape[1]):
                    excluded = excluded | (ex[:, e][:, None] == gj)
                fmm = fm * (~excluded).astype(dt)
                inv2 = fmm / jnp.where(mask, d2, 1.0)
                sr2 = (sgr[0][:, None] * sgc[0][None, :]) * inv2
                sr6 = sr2 * sr2 * sr2
                epsij = epr[0][:, None] * epc[0][None, :]
                rinv = fmm * jax.lax.rsqrt(jnp.where(mask, d2, 1.0))
                ecoul = _KE * qq_f * rinv
                elj = 4.0 * epsij * (sr6 * sr6 - sr6)
                mmpair = elj + ecoul
                dmm = (4.0 * epsij * (-6.0 * sr6 * sr6 + 3.0 * sr6)
                       - 0.5 * ecoul) * inv2
                mw = mw + 2.0 * dmm
                mmrow[rsl] += jnp.sum(mmpair, axis=1)
                mmrow[csl] += jnp.sum(mmpair, axis=0)

            erow[rsl] += jnp.sum(epair, axis=1)
            erow[csl] += jnp.sum(epair, axis=0)
            yrow[rsl] += jnp.sum(ypair, axis=1)
            yrow[csl] += jnp.sum(ypair, axis=0)
            cx = dx * mw
            cy = dy * mw
            cz = dz * mw
            fx[rsl] += jnp.sum(cx, axis=1)
            fx[csl] += -jnp.sum(cx, axis=0)
            fy[rsl] += jnp.sum(cy, axis=1)
            fy[csl] += -jnp.sum(cy, axis=0)
            fz[rsl] += jnp.sum(cz, axis=1)
            fz[csl] += -jnp.sum(cz, axis=0)


def gb_pair_tiles(nv, tl, pos_pad, charge_pad, born_pad, n, tile, box=None,
                  cutoff=None, sig_pad=None, epsq_pad=None,
                  excl_rows_pad=None, interpret=False):
    """gb_pair over the compacted triangular interacting-tile list.  Same
    contract as gb_pair."""
    npad = pos_pad.shape[1]
    dt = pos_pad.dtype
    with_mm = sig_pad is not None
    lmax = tl.shape[1]
    row = lambda l, nv, tl: (0, tl[0, l])
    col = lambda l, nv, tl: (0, tl[1, l])
    full = lambda l, nv, tl: (0, 0)
    shp = jax.ShapeDtypeStruct((1, npad), dt)
    if not with_mm:
        sig_pad = jnp.zeros(npad, dt)
        epsq_pad = jnp.zeros(npad, dt)
        excl_rows_pad = jnp.full((npad, 8), -1, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(lmax,),
        in_specs=[pl.BlockSpec((1, tile), row)] * 3
        + [pl.BlockSpec((1, tile), col)] * 3
        + [pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), col),
           pl.BlockSpec((tile, excl_rows_pad.shape[1]),
                        lambda l, nv, tl: (tl[0, l], 0))],
        out_specs=[pl.BlockSpec((1, npad), full)] * 6,
    )
    erow, yrow, fx, fy, fz, mmrow = pl.pallas_call(
        functools.partial(_gb_kernel_tl, n=n,
                          box=None if box is None else tuple(box),
                          cutoff=cutoff, with_mm=with_mm, tile=tile),
        grid_spec=grid_spec,
        out_shape=[shp] * 6,
        interpret=interpret,
    )(nv, tl,
      pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      charge_pad[None, :], charge_pad[None, :],
      born_pad[None, :], born_pad[None, :],
      sig_pad[None, :], sig_pad[None, :],
      epsq_pad[None, :], epsq_pad[None, :],
      excl_rows_pad)
    force = jnp.stack([fx[0], fy[0], fz[0]], axis=1)
    return erow[0], yrow[0], force, (mmrow[0] if with_mm else None)


def _descreen_kernel_tl(nv, tl, pxr, pyr, pzr, pxc, pyc, pzc, hid, rowY,
                        colsoh, sj, brwr, brur, fx, fy, fz, wcol, ucol,
                        fcx, fcy, fcz, *, ntj, n, box, horizon, tile):
    l = pl.program_id(0)
    i = tl[0, l]
    j = tl[1, l]

    @pl.when(l == 0)
    def _():
        for ref in (fx, fy, fz, wcol, ucol, fcx, fcy, fcz):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(l < nv[0])
    def _():
        dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
        d = jnp.sqrt(d2)
        gi = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) + i * tile)
        gj = hid[0][None, :]
        mask = (gi != gj) & (gi < n) & (gj >= 0) & (d < horizon)

        @pl.when(jnp.any(mask))
        def _():
            q, dq = _tile_spline(rowY[...], colsoh[...], d, mask, ntj,
                                 deriv=True, horizon=horizon)
            sl = (0, pl.dslice(j * tile, tile))
            rsl = (0, pl.dslice(i * tile, tile))
            wcol[sl] += jnp.sum(brwr[0][:, None] * q, axis=0)
            ucol[sl] += jnp.sum(brur[0][:, None] * q, axis=0)
            dt = dx.dtype
            c = ((brwr[0] + brur[0])[:, None] * sj[0][None, :] * dq
                 * jnp.where(mask, 1.0 / jnp.where(mask, d, 1.0),
                             0.0).astype(dt))
            fx[rsl] += jnp.sum(c * dx, axis=1)
            fy[rsl] += jnp.sum(c * dy, axis=1)
            fz[rsl] += jnp.sum(c * dz, axis=1)
            fcx[sl] += -jnp.sum(c * dx, axis=0)
            fcy[sl] += -jnp.sum(c * dy, axis=0)
            fcz[sl] += -jnp.sum(c * dz, axis=0)


def _descreen_qd_kernel_tl(nv, tl, pxr, pyr, pzr, pxc, pyc, pzc, qt, dqt,
                           sj, brwr, brur, fx, fy, fz, wcol, ucol,
                           fcx, fcy, fcz, *, box, tile):
    """List-driven descreening reloading the born pass's per-entry saved
    (Q, dQ) tiles: geometry only, no spline contraction (Q = dQ = 0 for
    every pair the born mask rejected, by the zero-fill)."""
    l = pl.program_id(0)
    i = tl[0, l]
    j = tl[1, l]

    @pl.when(l == 0)
    def _():
        for ref in (fx, fy, fz, wcol, ucol, fcx, fcy, fcz):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(l < nv[0])
    def _():
        dx, dy, dz, d2 = _pair_geom(pxr, pyr, pzr, pxc, pyc, pzc, box)
        d = jnp.sqrt(d2)
        q = qt[0]
        dq = dqt[0]

        @pl.when(jnp.any(q != 0.0) | jnp.any(dq != 0.0))
        def _():
            sl = (0, pl.dslice(j * tile, tile))
            rsl = (0, pl.dslice(i * tile, tile))
            wcol[sl] += jnp.sum(brwr[0][:, None] * q, axis=0)
            ucol[sl] += jnp.sum(brur[0][:, None] * q, axis=0)
            dt = dx.dtype
            c = ((brwr[0] + brur[0])[:, None] * sj[0][None, :] * dq
                 * jnp.where(d > 0.0, 1.0 / jnp.where(d > 0.0, d, 1.0),
                             0.0).astype(dt))
            fx[rsl] += jnp.sum(c * dx, axis=1)
            fy[rsl] += jnp.sum(c * dy, axis=1)
            fz[rsl] += jnp.sum(c * dz, axis=1)
            fcx[sl] += -jnp.sum(c * dx, axis=0)
            fcy[sl] += -jnp.sum(c * dy, axis=0)
            fcz[sl] += -jnp.sum(c * dz, axis=0)


def descreening_tiles(nv, tl, pos_pad, pos_hpad, hids_pad, rowY, cols_oh_h,
                      s_hpad, brw_pad, bru_pad, n, tile, box=None,
                      interpret=False, horizon=None, qd=None):
    """Descreening sweep over the same compacted interacting-tile list as
    born_sums_tiles (identical geometry and horizon, so the list is shared).
    Same contract as descreening().  With qd=(Q, dQ) from
    born_sums_tiles(save_qd=True) the spline contraction is skipped and the
    per-entry saved tiles are reloaded."""
    npad = pos_pad.shape[1]
    nhpad = pos_hpad.shape[1]
    ntj = cols_oh_h.shape[1]
    dt = pos_pad.dtype
    lmax = tl.shape[1]
    row = lambda l, nv, tl: (0, tl[0, l])
    col = lambda l, nv, tl: (0, tl[1, l])
    full = lambda l, nv, tl: (0, 0)
    rowshp = jax.ShapeDtypeStruct((1, npad), dt)
    colshp = jax.ShapeDtypeStruct((1, nhpad), dt)
    if qd is not None:
        kern = functools.partial(
            _descreen_qd_kernel_tl,
            box=None if box is None else tuple(box), tile=tile)
        mid_specs = [pl.BlockSpec((1, tile, tile),
                                  lambda l, nv, tl: (l, 0, 0))] * 2
        mid_args = (qd[0], qd[1])
    else:
        kern = functools.partial(
            _descreen_kernel_tl, ntj=ntj, n=n,
            box=None if box is None else tuple(box),
            horizon=(AGBNP_I4LOOKUP_MAXA if horizon is None
                     else min(horizon, AGBNP_I4LOOKUP_MAXA)),
            tile=tile)
        mid_specs = [pl.BlockSpec((1, tile), col),
                     pl.BlockSpec((tile, rowY.shape[1]), lambda l, nv, tl:
                                  (tl[0, l], 0)),
                     pl.BlockSpec((tile, ntj), lambda l, nv, tl:
                                  (tl[1, l], 0))]
        mid_args = (hids_pad[None, :], rowY, cols_oh_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(lmax,),
        in_specs=[pl.BlockSpec((1, tile), row)] * 3
        + [pl.BlockSpec((1, tile), col)] * 3
        + mid_specs
        + [pl.BlockSpec((1, tile), col),
           pl.BlockSpec((1, tile), row), pl.BlockSpec((1, tile), row)],
        out_specs=[pl.BlockSpec((1, npad), full)] * 3
        + [pl.BlockSpec((1, nhpad), full)] * 5,
    )
    fx, fy, fz, w, u, fcx, fcy, fcz = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[rowshp] * 3 + [colshp] * 5,
        interpret=interpret,
    )(nv, tl,
      pos_pad[0:1], pos_pad[1:2], pos_pad[2:3],
      pos_hpad[0:1], pos_hpad[1:2], pos_hpad[2:3], *mid_args,
      s_hpad[None, :], brw_pad[None, :], bru_pad[None, :])
    force_rows = jnp.stack([fx[0], fy[0], fz[0]], axis=1)
    force_cols = jnp.stack([fcx[0], fcy[0], fcz[0]], axis=1)
    return w[0], u[0], force_rows, force_cols
