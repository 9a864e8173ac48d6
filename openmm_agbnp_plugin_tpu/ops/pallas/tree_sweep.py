"""Banded-matmul Pallas TPU kernels for the fixed-topology overlap-tree sweeps.

The per-MD-step tree work (two-parameterization volume rescan + bottom-up
reduction + the gamma-weighted W/U force pass, reference
ReferenceAGBNPKernels.cpp:293-384,713-747 / GVolOverlapTree.cl RescanOverlapTree
/ GVolSelfVolume.cl computeSelfVolumes) is, in the XLA formulation
(ops/tree.py), dominated by row-serial gathers and segment-sums over ~100k+
padded node rows (~14-22 ns/row measured).  These kernels replace every
row-gather/scatter with MXU matmuls:

* parent gather / child->parent reduction: levels are laid out parent-grouped
  (parent ids non-decreasing), so a child tile's parents live in a bounded
  window of the parent level.  A [T, W*T] one-hot built from the tile's
  parent ids contracts against the windowed parent rows (selection) or, in
  transpose, accumulates the upward channels (reduction).  Window offsets are
  scalar-prefetched per tile; window width W is sized per level from the
  measured span with headroom and guarded by a span diagnostic (the
  PanicButton analogue: spans that outgrow the window flag an overflow and
  the host rebuilds with a wider window).
* atom-side gather (positions) and per-atom deposits: atom ids are arbitrary,
  so the one-hot is factorized by atom id = hi*128 + lo: a [T, Nhi] hi-one-hot
  contracts against 128-wide position blocks and a lo-one-hot selects within
  the block, costing O(rows * natoms * ncols) MACs with ncols in {1, 3, 7}
  instead of a padded 128.

One-hot operands are exact in any matmul precision; the value operand runs at
HIGHEST precision so f32 rows are selected/accumulated without bf16
truncation.

Numerical semantics match ops/tree.py's rescan_volumes2/reduce_tree2/
rescan_gammas+reduce_tree to reduction-order roundoff (exact in f64
interpret mode, which is how the tests pin parity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.constants import PI
from ..gaussians import pol_switchfunc

T_TILE = 256
_LO = 128  # atom-id factorization block (hi = atom // 128, lo = atom % 128)
MAX_BAND_W = 8  # widest banded window; beyond this a level goes full-resident
_FULL_RESIDENT_LIMIT = 6 * 1024 * 1024  # bytes of parent payload in VMEM

# one-hot contractions run at HIGHEST precision so selected/accumulated f32
# values are never truncated to bf16 (Mosaic does not support per-operand
# precision, else the exact-in-bf16 one-hot side could run cheaper)
_SEL = jax.lax.Precision.HIGHEST

_D = 13   # per-parameterization packed column count (ops/tree.py layout)
_DD = 26  # two parameterizations


def pad_rows(n: int, t: int = T_TILE) -> int:
    return max(2 * t, (n + t - 1) // t * t)


def align_caps(caps, t: int = T_TILE):
    """Round level capacities up to tile multiples (>= 2 tiles each)."""
    from ..tree import TreeCaps

    new = tuple(max(2 * t, (c + t - 1) // t * t) for c in caps.caps)
    return TreeCaps(caps=new, offs=caps.offs)


# ---------------------------------------------------------------------------
# Window sizing + per-rebuild statics
# ---------------------------------------------------------------------------

def level_spans(topology, parent_caps, t: int = T_TILE):
    """Per-level max parent-id span within any child tile (device).

    The sweep's overflow diagnostic: a span s needs a banded window of
    W >= ceil((s + t) / t) blocks.  Returned as an int32 [nlevels] vector so
    MD scans can carry it like the node-count PanicButton diagnostics.
    """
    spans = []
    for lvl, capp in zip(topology, parent_caps):
        par = lvl["parent"]
        valid = lvl["valid"]
        cap = par.shape[0]
        nt = cap // t
        pm = jnp.where(valid, par, capp).reshape(nt, t)
        px = jnp.where(valid, par, -1).reshape(nt, t)
        lo = jnp.min(pm, axis=1)
        hi = jnp.max(px, axis=1)
        spans.append(jnp.max(jnp.maximum(hi - jnp.minimum(lo, hi), 0)))
    return jnp.stack(spans).astype(jnp.int32)


def size_windows(spans_host, parent_caps, t: int = T_TILE):
    """Static per-level window plan from measured spans (host side).

    Returns a tuple of ints: W blocks for the banded kernel, or 0 meaning
    "full-resident parent" (small deep levels whose spans are erratic).
    Sized with 1.5x headroom in the spirit of the reference's
    tree_size_boost (OpenCLAGBNPKernels.h:145).
    """
    plan = []
    for s, capp in zip(np.asarray(spans_host), parent_caps):
        ntp = capp // t
        w = int(np.ceil((int(s) * 1.5 + t) / t))
        if w >= ntp:
            plan.append(0)  # whole parent level resident
        elif w > MAX_BAND_W:
            if capp * _DD * 4 <= _FULL_RESIDENT_LIMIT:
                plan.append(0)
            else:
                plan.append(-1)  # ineligible: caller must disable the kernel
        else:
            plan.append(max(2, w))
    return tuple(plan)


def windows_ok(spans_host, windows, t: int = T_TILE) -> bool:
    """PanicButton check: do the measured spans still fit the static plan?"""
    for s, w in zip(np.asarray(spans_host), windows):
        if w > 0 and int(s) + t > w * t:
            return False
    return True


def atom_statics(arrays, roffset, npad, dtype):
    """[NP, 6] static atom payload: (gv, ga, gamma) for the large-radii and
    vdW parameterizations (gv zeroed on hydrogens, gammas +/- gamma/dr —
    ReferenceAGBNPKernels.cpp:293-305,358-365)."""
    from ..gaussians import atomic_gaussian_exponent

    gdr = arrays["gamma"] / roffset
    ga_l = atomic_gaussian_exponent(arrays["radii_large"])
    ga_v = atomic_gaussian_exponent(arrays["radii_vdw"])
    st = jnp.stack([arrays["vol_large"], ga_l, gdr,
                    arrays["vol_vdw"], ga_v, -gdr], axis=1).astype(dtype)
    return jnp.pad(st, ((0, npad - st.shape[0]), (0, 0)))


def sweep_statics(topology, at6, windows, npad, t: int = T_TILE):
    """Per-rebuild device statics for the sweep kernels.

    topology: ops.tree.tree_topology() result (ints/valid per level).
    at6: atom_statics array.  windows: size_windows plan (static).
    Returns a pytree carried alongside the topology between rebuilds.
    """
    dtype = at6.dtype
    parent_caps = [npad] + [l["valid"].shape[0] for l in topology[:-1]]
    out = []
    for lvl, capp, w in zip(topology, parent_caps, windows):
        cap = lvl["valid"].shape[0]
        nt = cap // t
        ntp = capp // t
        if w > 0:
            first = lvl["parent"].reshape(nt, t)[:, 0]
            offs = jnp.clip(first // t, 0, ntp - w).astype(jnp.int32)
        else:
            offs = jnp.zeros((nt,), jnp.int32)
        out.append(dict(
            offs=offs,
            st=at6[lvl["atom"]],
            validf=lvl["valid"].astype(dtype)[:, None],
            ints=lvl["_ints"],
        ))
    spans = level_spans(topology, parent_caps, t)
    return dict(levels=tuple(out), spans=spans)


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------

def _cand_cols(s_gv, s_ga, s_gc, s_gamma, a_gv, a_ga, a_gc, a_gamma):
    """2-Gaussian product on [T] vectors — same formulas as
    ops/tree.py:_cand_dat (gaussvol.cpp:60-93), with a zero-exponent guard
    for garbage (masked) rows so padding can never produce NaNs."""
    dist = a_gc - s_gc
    d2 = jnp.sum(dist * dist, axis=-1)
    a12 = s_ga + a_ga
    safe_a12 = jnp.where(a12 > 0, a12, 1.0)
    deltai = 1.0 / safe_a12
    df = s_ga * a_ga * deltai
    ef = jnp.exp(-df * d2)
    gvol = (s_gv * a_gv / (PI / jnp.where(df > 0, df, 1.0)) ** 1.5)
    gvol = jnp.where(df > 0, gvol, 0.0) * ef
    dgvol = -2.0 * df * gvol
    dgvolv = jnp.where(s_gv > 0, gvol / jnp.where(s_gv > 0, s_gv, 1.0), 0.0)
    gc12 = (s_gc * s_ga[..., None] + a_gc * a_ga[..., None]) * deltai[..., None]
    s, sp = pol_switchfunc(gvol)
    sgvol = s * gvol
    sfp = sp * gvol + s
    dv1 = dist * (-dgvol)[..., None]
    return jnp.concatenate([
        gvol[..., None], a12[..., None], gc12, sgvol[..., None],
        sfp[..., None], dgvolv[..., None], dv1,
        (s_gamma + a_gamma)[..., None],
        jnp.broadcast_to(a_ga, gvol.shape)[..., None],
    ], axis=-1)


def _hi_lo_onehot(atom, nhi, dtype):
    t = atom.shape[0]
    hi = atom // _LO
    lo = atom - hi * _LO
    ohhi = (hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (t, nhi), 1))
    ohlo = (lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (t, _LO), 1))
    return ohhi.astype(dtype), ohlo.astype(dtype)


def _gather_pos(atom, posb_ref, nhi, dtype):
    """pos[atom] via the hi/lo factorized one-hot.  posb is [Nhi, 3*128]
    with x|y|z 128-blocks; selection is exact (one nonzero per row)."""
    ohhi, ohlo = _hi_lo_onehot(atom, nhi, dtype)
    b = jax.lax.dot_general(ohhi, posb_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=_SEL, preferred_element_type=dtype)
    ax = jnp.sum(ohlo * b[:, 0:_LO], axis=1)
    ay = jnp.sum(ohlo * b[:, _LO:2 * _LO], axis=1)
    az = jnp.sum(ohlo * b[:, 2 * _LO:3 * _LO], axis=1)
    return jnp.stack([ax, ay, az], axis=1), ohhi, ohlo


def _parent_onehot(parent, base, wt, dtype):
    ids = base + jax.lax.broadcasted_iota(jnp.int32, (parent.shape[0], wt), 1)
    return (parent[:, None] == ids).astype(dtype)


_OH_CHUNK = 1024  # cap on materialized one-hot width (VMEM: [T, chunk])


def _chunk_of(capp: int) -> int:
    for c in (_OH_CHUNK, 512, 256):
        if capp % c == 0:
            return c
    return capp


def _sel_rows(parent, base, prev, dtype):
    """onehot(parent) @ prev — single shot; prev must be a narrow window
    (banded case, <= MAX_BAND_W * T rows)."""
    oh = _parent_onehot(parent, base, prev.shape[0], dtype)
    return jax.lax.dot_general(oh, prev,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               precision=_SEL, preferred_element_type=dtype)


def _sel_rows_ref(parent, prev_ref, dtype):
    """onehot(parent) @ prev_ref for a full-resident parent level: the
    one-hot is built in VMEM-bounded column chunks under a fori_loop (an
    unrolled Python loop stacks its temporaries in Mosaic's scoped VMEM
    allocator; a [T, capP] one-hot at capP ~ 16k would be ~16 MB)."""
    capp, ncols = prev_ref.shape
    chunk = _chunk_of(capp)
    t = parent.shape[0]

    def body(k, out):
        oh = _parent_onehot(parent, k * chunk, chunk, dtype)
        part = jax.lax.dot_general(
            oh, prev_ref[pl.ds(k * chunk, chunk), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_SEL, preferred_element_type=dtype)
        return out + part

    return jax.lax.fori_loop(0, capp // chunk, body,
                             jnp.zeros((t, ncols), dtype))


# ---------------------------------------------------------------------------
# Kernel R: two-parameterization volume rescan, one level
# ---------------------------------------------------------------------------

def _rescan2_kernel(offs_ref, *refs, w, t, nhi):
    prevs = refs[:max(w, 1)]
    ints_ref, st_ref, posb_ref, out_ref = refs[max(w, 1):max(w, 1) + 4]
    c = pl.program_id(0)
    dtype = prevs[0].dtype
    ints = ints_ref[...]
    atom = ints[:, 0]
    parent = ints[:, 1]

    if w > 0:
        base = offs_ref[c] * t
        prev = jnp.concatenate([r[...] for r in prevs], axis=0)  # [W*T, 26]
        sp = _sel_rows(parent, base, prev, dtype)
    else:
        sp = _sel_rows_ref(parent, prevs[0], dtype)
    a_gc, _, _ = _gather_pos(atom, posb_ref, nhi, dtype)
    st = st_ref[...]
    dat_a = _cand_cols(sp[:, 0], sp[:, 1], sp[:, 2:5], sp[:, 11],
                       st[:, 0], st[:, 1], a_gc, st[:, 2])
    dat_b = _cand_cols(sp[:, _D + 0], sp[:, _D + 1], sp[:, _D + 2:_D + 5],
                       sp[:, _D + 11], st[:, 3], st[:, 4], a_gc, st[:, 5])
    out_ref[...] = jnp.concatenate([dat_a, dat_b], axis=1)


def rescan2_level(prev2, lvl_static, posb, w, t=T_TILE, interpret=False):
    """One level of the fused two-parameterization rescan.

    prev2 [capP, 26] (parent level, or the atom table for level 2);
    returns dat2 [cap, 26].  w: banded window in blocks (0 = full parent).
    """
    ints = lvl_static["ints"]
    offs = lvl_static["offs"]
    st = lvl_static["st"]
    cap = ints.shape[0]
    capp = prev2.shape[0]
    nt = cap // t
    nhi = posb.shape[0]
    dtype = prev2.dtype

    if w > 0:
        prev_specs = [
            pl.BlockSpec((t, _DD), partial(lambda c, o, k: (o[c] + k, 0), k=k))
            for k in range(w)
        ]
        prev_args = [prev2] * w
    else:
        # full-resident: a single block covering the parent level
        prev_specs = [pl.BlockSpec((capp, _DD), lambda c, o: (0, 0))]
        prev_args = [prev2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=prev_specs + [
            pl.BlockSpec((t, 2), lambda c, o: (c, 0)),
            pl.BlockSpec((t, 6), lambda c, o: (c, 0)),
            pl.BlockSpec((nhi, 3 * _LO), lambda c, o: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, _DD), lambda c, o: (c, 0)),
    )
    kern = partial(_rescan2_kernel, w=w, t=t, nhi=nhi)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, _DD), dtype),
        interpret=interpret,
    )(offs, *prev_args, ints, st, posb)


# ---------------------------------------------------------------------------
# Kernel D: bottom-up reduction, one level
# ---------------------------------------------------------------------------

def _reduce_channels(dat, vmask, acc_in, level_no, two, gwu=None):
    """Per-node reduction math on [T(or cap), .] arrays — the flattened
    compute_volume_underslot2_r recursion (gaussvol.cpp:400-519), identical
    to ops/tree.py:reduce_tree2 / reduce_tree.

    Returns (dep_rows, up): deposit columns (dr x3 per tree [+ sv]) on the
    node's last atom, and upward channels ([psi, F, Px, Py, Pz] per tree
    [+ sv psi]) for the parents.
    """
    cf = -1.0 if level_no % 2 == 0 else 1.0
    volcoeffp = cf / level_no
    # two trees: both halves; single-tree (W/U gamma pass): the vdW half
    halves = (0, _D) if two else (_D,)
    cols = []
    for h in halves:
        gamma1i = dat[:, h + 11] if gwu is None else gwu[:, 0]
        gsfp = volcoeffp * dat[:, h + 6] * gamma1i
        cols += [volcoeffp * gamma1i * dat[:, h + 5], gsfp,
                 jnp.zeros_like(gsfp), jnp.zeros_like(gsfp),
                 jnp.zeros_like(gsfp)]
    if two:
        cols.append(volcoeffp * dat[:, _D + 5])  # vdW self-volume psi
    tot = jnp.stack(cols, axis=1) * vmask
    if acc_in is not None:
        tot = tot + acc_in

    dep_cols = []
    ups = []
    valid = vmask[:, 0] > 0
    for i, h in enumerate(halves):
        base = 5 * i
        e_f = tot[:, base + 1]
        e_p = tot[:, base + 2:base + 5]
        ai = dat[:, h + 12]
        a1i = dat[:, h + 1]
        safe = jnp.where(valid, a1i, 1.0)
        dv1 = dat[:, h + 8:h + 11]
        dep_cols.append((-dv1) * e_f[:, None] + e_p * (ai / safe)[:, None])
        p_out = dv1 * e_f[:, None] + e_p * ((a1i - ai) / safe)[:, None]
        ups += [tot[:, base:base + 1], (dat[:, h + 7] * e_f)[:, None], p_out]
    if two:
        dep_cols.append(tot[:, 10:11])
        ups.append(tot[:, 10:11])
    dep = jnp.concatenate(dep_cols, axis=1) * vmask
    up = jnp.concatenate(ups, axis=1) * vmask
    return dep, up


def _reduce_kernel(offs_ref, dat_ref, ints_ref, validf_ref, acc_ref, gwu_ref,
                   accp_ref, dep_ref, *, w, t, nhi, level_no, two, has_gwu):
    c = pl.program_id(0)
    dtype = dat_ref.dtype

    @pl.when(c == 0)
    def _():
        accp_ref[...] = jnp.zeros_like(accp_ref)
        dep_ref[...] = jnp.zeros_like(dep_ref)

    dat = dat_ref[...]
    ints = ints_ref[...]
    vmask = validf_ref[...]
    # accumulators live transposed [NU, cap]: the lane (minor) dim must be
    # the large one or VMEM pads 11 channels to 128 lanes (~12x waste)
    acc_in = acc_ref[...].T
    gwu = gwu_ref[...] if has_gwu else None
    dep, up = _reduce_channels(dat, vmask, acc_in, level_no, two, gwu)

    # deposits onto last atoms: hi/lo factorized one-hot transpose
    ohhi, ohlo = _hi_lo_onehot(ints[:, 0], nhi, dtype)
    nd = dep.shape[1]
    cblocks = jnp.concatenate([dep[:, k:k + 1] * ohlo for k in range(nd)],
                              axis=1)  # [T, ND*128]
    dep_ref[...] += jax.lax.dot_general(
        ohhi, cblocks, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=_SEL, preferred_element_type=dtype)

    # upward accumulation into the banded parent window; the full-resident
    # case chunks the one-hot under a fori_loop (VMEM-bounded).  The update
    # is produced already transposed ([NU, wt]) by swapping dot operands.
    capp = accp_ref.shape[1]
    if w > 0:
        base = offs_ref[c] * t
        oh = _parent_onehot(ints[:, 1], base, w * t, dtype)
        upw = jax.lax.dot_general(up, oh,
                                  dimension_numbers=(((0,), (0,)), ((), ())),
                                  precision=_SEL, preferred_element_type=dtype)
        accp_ref[:, pl.ds(base, w * t)] += upw
    else:
        chunk = _chunk_of(capp)

        def body(k, _):
            oh = _parent_onehot(ints[:, 1], k * chunk, chunk, dtype)
            upw = jax.lax.dot_general(
                up, oh, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=_SEL, preferred_element_type=dtype)
            accp_ref[:, pl.ds(k * chunk, chunk)] += upw
            return 0

        jax.lax.fori_loop(0, capp // chunk, body, 0)


def reduce_level(dat2, lvl_static, acc_in, capp, nhi, w, level_no,
                 two=True, gwu=None, t=T_TILE, interpret=False):
    """One level of the bottom-up reduction.

    Returns (acc_parent [capP, NU], dep [Nhi, ND*128]).
    two=True: fused large+vdW reduction (NU=11, ND=7, reference
    ReferenceAGBNPKernels.cpp:311-384); two=False: the gamma-rescan W/U pass
    (NU=5, ND=3, cpp:713-747) with gwu overriding the node gammas.
    """
    ints = lvl_static["ints"]
    cap = ints.shape[0]
    nt = cap // t
    dtype = dat2.dtype
    nu = 11 if two else 5
    nd = 7 if two else 3
    if acc_in is None:
        acc_in = jnp.zeros((nu, cap), dtype)
    has_gwu = gwu is not None
    if gwu is None:
        gwu = jnp.zeros((cap, 1), dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((t, _DD), lambda c, o: (c, 0)),
            pl.BlockSpec((t, 2), lambda c, o: (c, 0)),
            pl.BlockSpec((t, 1), lambda c, o: (c, 0)),
            pl.BlockSpec((nu, t), lambda c, o: (0, c)),
            pl.BlockSpec((t, 1), lambda c, o: (c, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nu, capp), lambda c, o: (0, 0)),
            pl.BlockSpec((nhi, nd * _LO), lambda c, o: (0, 0)),
        ],
    )
    kern = partial(_reduce_kernel, w=w, t=t, nhi=nhi, level_no=level_no,
                   two=two, has_gwu=has_gwu)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nu, capp), dtype),
                   jax.ShapeDtypeStruct((nhi, nd * _LO), dtype)],
        interpret=interpret,
    )(lvl_static["offs"], dat2, ints, lvl_static["validf"], acc_in, gwu)


# ---------------------------------------------------------------------------
# Kernel G: gamma chain (top-down), one level
# ---------------------------------------------------------------------------

def _gamma_kernel(offs_ref, *refs, w, t, nhi):
    prevs = refs[:max(w, 1)]
    ints_ref, gb_ref, out_ref = refs[max(w, 1):max(w, 1) + 3]
    c = pl.program_id(0)
    dtype = prevs[0].dtype
    ints = ints_ref[...]
    if w > 0:
        base = offs_ref[c] * t
        prev = jnp.concatenate([r[...] for r in prevs], axis=0)  # [W*T, 1]
        gp = _sel_rows(ints[:, 1], base, prev, dtype)
    else:
        gp = _sel_rows_ref(ints[:, 1], prevs[0], dtype)
    ohhi, ohlo = _hi_lo_onehot(ints[:, 0], nhi, dtype)
    b = jax.lax.dot_general(ohhi, gb_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=_SEL, preferred_element_type=dtype)
    ga = jnp.sum(ohlo * b, axis=1, keepdims=True)
    out_ref[...] = gp + ga


def gamma_level(prev_g, lvl_static, gwu_b, w, t=T_TILE, interpret=False):
    """gamma1i chain: node gamma = parent gamma + gamma_WU[atom]
    (rescan_tree_g, gaussvol.cpp:330-372).  prev_g [capP, 1] -> [cap, 1]."""
    ints = lvl_static["ints"]
    cap = ints.shape[0]
    capp = prev_g.shape[0]
    nt = cap // t
    nhi = gwu_b.shape[0]
    dtype = prev_g.dtype
    if w > 0:
        prev_specs = [
            pl.BlockSpec((t, 1), partial(lambda c, o, k: (o[c] + k, 0), k=k))
            for k in range(w)
        ]
        prev_args = [prev_g] * w
    else:
        prev_specs = [pl.BlockSpec((capp, 1), lambda c, o: (0, 0))]
        prev_args = [prev_g]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=prev_specs + [
            pl.BlockSpec((t, 2), lambda c, o: (c, 0)),
            pl.BlockSpec((nhi, _LO), lambda c, o: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, 1), lambda c, o: (c, 0)),
    )
    kern = partial(_gamma_kernel, w=w, t=t, nhi=nhi)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, 1), dtype),
        interpret=interpret,
    )(lvl_static["offs"], *prev_args, ints, gwu_b)


# ---------------------------------------------------------------------------
# Sweep drivers (XLA glue between per-level kernels)
# ---------------------------------------------------------------------------

def _blocked_pos(pos, npad):
    """[NP, 3] -> [Nhi, 3*128] with x|y|z 128-blocks."""
    n = pos.shape[0]
    p = jnp.pad(pos, ((0, npad - n), (0, 0)))
    nhi = npad // _LO
    return p.T.reshape(3, nhi, _LO).transpose(1, 0, 2).reshape(nhi, 3 * _LO)


def _atom_table26(lvl1_a, lvl1_b, npad):
    """Level-1 data as a 26-col parent table for the level-2 rescan."""
    dtype = lvl1_a["gv"].dtype
    n = lvl1_a["gv"].shape[0]
    z = jnp.zeros((n,), dtype)

    def half(l1):
        return [l1["gv"][:, None], l1["ga"][:, None], l1["gc"],
                jnp.zeros((n, 6), dtype), l1["gamma1i"][:, None],
                z[:, None]]

    at = jnp.concatenate(half(lvl1_a) + half(lvl1_b), axis=1)
    return jnp.pad(at, ((0, npad - n), (0, 0)))


def _undeposit(dep, npad, nd):
    """[Nhi, ND*128] kernel layout -> [NP, ND]."""
    nhi = dep.shape[0]
    return dep.reshape(nhi, nd, _LO).transpose(0, 2, 1).reshape(npad, nd)


def rescan2_sweep(sweep, lvl1_a, lvl1_b, windows, npad, t=T_TILE,
                  interpret=False):
    """Full fixed-topology two-parameterization rescan (all levels).

    Returns the per-level dat2 tuple (ops/tree.py packed layout x2)."""
    posb = _blocked_pos(lvl1_a["gc"], npad)
    prev2 = _atom_table26(lvl1_a, lvl1_b, npad)
    dats = []
    for lvl_static, w in zip(sweep["levels"], windows):
        dat2 = rescan2_level(prev2, lvl_static, posb, w, t, interpret)
        dats.append(dat2)
        prev2 = dat2
    return tuple(dats)


def reduce2_sweep(dats, sweep, lvl1_a, lvl1_b, windows, npad, t=T_TILE,
                  interpret=False):
    """Fused bottom-up reduction of both parameterizations.

    Returns (red_a, red_b) like ops/tree.py:reduce_tree2."""
    nhi = npad // _LO
    nlev = len(dats)
    caps = [lvl["ints"].shape[0] for lvl in sweep["levels"]]
    parent_caps = [npad] + caps[:-1]
    acc = None
    dep_total = None
    for l in range(nlev - 1, -1, -1):
        acc, dep = reduce_level(dats[l], sweep["levels"][l], acc,
                                parent_caps[l], nhi, windows[l],
                                level_no=l + 2, two=True, t=t,
                                interpret=interpret)
        dep_total = dep if dep_total is None else dep_total + dep
    deposits = _undeposit(dep_total, npad, 7)

    natoms = lvl1_a["gv"].shape[0]
    acc = acc.T[:natoms]
    deposits = deposits[:natoms]
    results = []
    for base, dbase, l1 in ((0, 0, lvl1_a), (5, 3, lvl1_b)):
        e_psi = l1["gamma1i"] * l1["gv"] + acc[:, base]
        dr = deposits[:, dbase:dbase + 3] + acc[:, base + 2:base + 5]
        results.append(dict(energy=jnp.sum(e_psi), dr=dr))
    results[1]["self_volume"] = lvl1_b["gv"] + acc[:, 10] + deposits[:, 6]
    return results[0], results[1]


def wu_sweep(dats, sweep, gamma_wu, windows, npad, natoms, t=T_TILE,
             interpret=False):
    """The gamma-rescan W/U force pass over the vdW tree
    (ReferenceAGBNPKernels.cpp:713-747): top-down gamma chain + bottom-up
    5-channel reduction with the new gammas.  Returns dict(energy, dr)."""
    nhi = npad // _LO
    dtype = gamma_wu.dtype
    gwu_b = jnp.pad(gamma_wu, (0, npad - natoms)).reshape(nhi, _LO)
    prev_g = jnp.pad(gamma_wu, (0, npad - natoms))[:, None]
    gammas = []
    for lvl_static, w in zip(sweep["levels"], windows):
        g = gamma_level(prev_g, lvl_static, gwu_b, w, t, interpret)
        gammas.append(g)
        prev_g = g

    nlev = len(dats)
    caps = [lvl["ints"].shape[0] for lvl in sweep["levels"]]
    parent_caps = [npad] + caps[:-1]
    acc = None
    dep_total = None
    for l in range(nlev - 1, -1, -1):
        acc, dep = reduce_level(dats[l], sweep["levels"][l], acc,
                                parent_caps[l], nhi, windows[l],
                                level_no=l + 2, two=False, gwu=gammas[l],
                                t=t, interpret=interpret)
        dep_total = dep if dep_total is None else dep_total + dep
    deposits = _undeposit(dep_total, npad, 3)[:natoms]
    acc = acc.T[:natoms]
    # level-1 tail (only dr is consumed; the pass's energy is discarded by
    # the pipeline exactly as in the reference's gamma-rescan force passes)
    return dict(dr=deposits + acc[:, 2:5])
