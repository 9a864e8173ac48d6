"""Jittable GVolSA / AGBNP1 pipelines over the flattened overlap tree.

This is the TPU compute path: a pure function of positions (parameters and
spline tables passed as a pytree of arrays) that reproduces the reference
pipeline (reference ReferenceAGBNPKernels.cpp:152-795, OpenCL launch
sequences OpenCLAGBNPKernels.cpp:3229-4216) as one fused XLA computation:

  build tree (large radii) -> reduce -> E_vol1, F1
  rescan (vdW radii)       -> reduce -> E_vol2, F2, self volumes
  Born radii (spline LUT)  -> GB self/pair + vdW dispersion + direct forces
  BrW/BrU chain factors    -> descreening sweep -> W, U + direct forces
  two gamma rescans        -> tree-propagated self-volume gradient forces

Everything is static-shaped; forces are analytic (the same closed-form
reverse chain the reference derives by hand), so a single jit call yields
energy and forces with no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import born as B
from ..ops import tree as T
from .constants import sphere_volume
from .i4_tables import I4LookupTables
from .oracle import AGBNPParams


def _morton_order(pos, idx):
    """Order the atom subset idx by a 3D Morton (Z-curve) code of their
    positions: spatially adjacent atoms land in adjacent packed columns, so
    the pair kernels' out-of-2nm-range tile skip fires on far more tiles."""
    q = np.asarray(pos)[idx]
    q = q - q.min(axis=0)
    span = max(float(q.max()), 1e-9)
    cells = np.minimum((q / span * 1023).astype(np.uint64), 1023)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    code = (spread(cells[:, 0]) | (spread(cells[:, 1]) << np.uint64(1))
            | (spread(cells[:, 2]) << np.uint64(2)))
    return idx[np.argsort(code, kind="stable")]


def prepare_arrays(params: AGBNPParams, dtype=np.float64,
                   pairs: tuple | None = None, pair_pad: int = 0,
                   positions=None) -> dict:
    """Build the pytree of parameter/table arrays consumed by the pipeline.

    pairs: optional (i, j) candidate 2-body pairs; defaults to all i<j.
    pair_pad: if > 0, also prepare the padded row-contracted spline tables
    consumed by the fused Pallas pair kernels (ops/pallas/pairs.py);
    positions (initial coordinates) then spatially order the heavy-packed
    screener columns for tile skipping.
    """
    p = params
    n = p.n
    tables = I4LookupTables(p.radii_vdw, p.ishydrogen)
    if pairs is None:
        pairs = np.triu_indices(n, 1)
    # NOTE: everything stays host-side numpy — the arrays dict is a jit
    # argument, so the transfer happens in one batch at the first call.
    # Eager per-array jnp.asarray here cost ~2-3 minutes of round trips at
    # init over a remote-TPU tunnel.
    extra = {}
    if pair_pad > 0:
        from ..ops.pallas.pairs import pad_to, pick_tile, prepare_pair_tables

        # f32 deployment uses the exact 3-way bf16 mantissa-split tables
        # (half the MXU passes per spline selection, bit-identical values);
        # f64 keeps the HIGHEST-precision f64 contraction
        split = np.dtype(dtype) == np.float32
        rowY, cols_oh = prepare_pair_tables(tables.type_screened,
                                            tables.type_screener,
                                            tables.yval, tables.y2val,
                                            split_bf16=split)
        # Morton-order the ROW (screened-atom) axis of the pair kernels so
        # tiles are spatially local on both axes and the out-of-range tile
        # skips (2 nm LUT horizon, GB cutoff) fire on most far tiles.  The
        # permutation is fixed at init; per-step the pair phases run in
        # permuted space and the row outputs are gathered back (2 small
        # [N]-row gathers).
        if positions is not None and n > 1:
            rperm = _morton_order(positions, np.arange(n))
        else:
            rperm = np.arange(n)
        rinv = np.empty(n, np.int32)
        rinv[rperm] = np.arange(n, dtype=np.int32)
        extra["rperm"] = rperm.astype(np.int32)
        extra["rinv"] = rinv
        tdt = rowY.dtype if split else dtype  # bf16 split stays bf16
        extra["rowY_pad"] = np.pad(rowY[rperm], ((0, pair_pad - n), (0, 0)))             .astype(tdt)
        extra["charge_pad"] = np.pad(np.asarray(p.charge)[rperm],
                                     (0, pair_pad - n)).astype(dtype)
        extra["radii_vdw_perm"] = np.asarray(p.radii_vdw)[rperm]             .astype(dtype)
        extra["alpha_perm"] = np.asarray(p.alpha)[rperm].astype(dtype)
        # heavy-packed screener columns for the born/descreening kernels
        # (hydrogens never screen: type -1 / zero self-volume)
        hidx = np.nonzero(np.asarray(p.ishydrogen) == 0)[0]
        if positions is not None and len(hidx) > 1:
            hidx = _morton_order(positions, hidx)
        nhpad = pad_to(len(hidx), pick_tile(n))
        hids = np.full(nhpad, -1, np.int32)
        hids[:len(hidx)] = hidx
        extra["hids_pad"] = hids  # atom-space ids (for scatters)
        # perm-space ids for the kernels' self-pair (i == j) exclusion test
        hids_perm = np.full(nhpad, -1, np.int32)
        hids_perm[:len(hidx)] = rinv[hidx]
        extra["hids_perm_pad"] = hids_perm
        extra["cols_oh_hpad"] = np.pad(
            cols_oh[hidx], ((0, nhpad - len(hidx)), (0, 0))).astype(tdt)
    return dict(
        **extra,
        radii_large=np.asarray(p.radii_large, dtype),
        radii_vdw=np.asarray(p.radii_vdw, dtype),
        gamma=np.asarray(p.gamma, dtype),
        alpha=np.asarray(p.alpha, dtype),
        charge=np.asarray(p.charge, dtype),
        ishydrogen=np.asarray(p.ishydrogen, np.int32),
        vol_large=np.where(p.ishydrogen > 0, 0.0,
                           sphere_volume(p.radii_large)).astype(dtype),
        vol_vdw=np.where(p.ishydrogen > 0, 0.0,
                         sphere_volume(p.radii_vdw)).astype(dtype),
        vol_vdw_all=np.asarray(sphere_volume(p.radii_vdw), dtype),
        type_i=np.asarray(tables.type_screened, np.int32),
        type_j=np.asarray(tables.type_screener, np.int32),
        yflat=np.asarray(tables.yval.reshape(-1), dtype),
        y2flat=np.asarray(tables.y2val.reshape(-1), dtype),
        pairs_i=np.asarray(pairs[0], np.int32),
        pairs_j=np.asarray(pairs[1], np.int32),
        pairs_valid=(np.asarray(pairs[2])
                     if len(pairs) > 2 else np.ones(len(pairs[0]), bool)),
    )


def tree_passes(a: dict, pos, caps: T.TreeCaps, roffset: float,
                topology=None, pair_rows: bool = False):
    """Two-pass cavity evaluation.

    With topology given (a T.tree_topology result from an earlier build),
    the build is replaced by a fixed-topology volume rescan — the fast MD
    path between topology rebuilds.  Both parameterizations always ride the
    SAME fused sweep: the vdW channel widens the per-row gathers/scatters,
    whose TPU cost is nearly channel-width-independent (sublane tiling), so
    it is almost free here — splitting it onto the compacted vdW-live
    topology was measured SLOWER (1li2 24.0 vs 26.6 ns/day; the two extra
    per-level pass overheads outweigh the 6x row cut, benchmarks/RESULTS.md).

    Returns (e_cav, f_cav, self_volume, levels_vdw, lvl1_vdw, diag, red1,
    red2) where levels_vdw feeds the W/U gamma pass.
    """
    gamma_dr = a["gamma"] / roffset

    lvl1_large = T.make_level1(pos, a["radii_large"], a["vol_large"],
                               gamma_dr, a["ishydrogen"])
    lvl1_vdw = T.make_level1(pos, a["radii_vdw"], a["vol_vdw"],
                             -gamma_dr, a["ishydrogen"])
    if topology is None:
        levels, diag = T.build_tree(lvl1_large, a["pairs_i"], a["pairs_j"],
                                    caps, pairs_valid=a["pairs_valid"],
                                    pair_rows=pair_rows)
        red1 = T.reduce_tree(levels, lvl1_large, with_selfvol=False)
        levels_vdw = T.rescan_volumes(levels, lvl1_vdw)
        red2 = T.reduce_tree(levels_vdw, lvl1_vdw, with_selfvol=True)
    else:
        # fast MD path: both parameterizations rescanned and reduced in one
        # fused pass over the fixed topology
        counts = jnp.stack([jnp.sum(t["valid"]) for t in topology])
        diag = dict(counts=counts, caps=jnp.array(caps.caps),
                    max_siblings=jnp.zeros(7, jnp.int32),
                    offs=jnp.array(caps.offs + (0,)))
        levels_large, levels_vdw = T.rescan_volumes2(topology, lvl1_large,
                                                     lvl1_vdw)
        red1, red2 = T.reduce_tree2(levels_large, levels_vdw,
                                    lvl1_large, lvl1_vdw)

    e_cav = red1["energy"] + red2["energy"]
    f_cav = -(red1["dr"] + red2["dr"])
    return (e_cav, f_cav, red2["self_volume"], levels_vdw, lvl1_vdw, diag,
            red1, red2)


def _pair_phases_pallas(a, pos, cutoff, box, pair_pad: int,
                        pair_interpret: bool, horizon=None,
                        pair_tiles=None):
    """Born/GB/descreening pair phases via the fused Pallas tile kernels
    (ops/pallas/pairs.py), replacing ops/born.py's dense [N, N] HBM
    formulation.  Returns the same quantities the XLA path produces.

    The whole pair-phase block runs in Morton-permuted row space (rperm,
    fixed at init) so tiles are spatially local on both axes and the
    out-of-range tile skips fire; the born/descreening screener axis is
    packed to heavy atoms only.  Row outputs are gathered back to atom
    order at the end.

    pair_tiles: optional (lmax_born, lmax_gb) static budgets.  When given,
    the sweeps launch over compacted interacting-tile lists (built per
    evaluation from the tiles' AABBs — the reference's neighbor-tile
    rebind, OpenCLAGBNPKernels.cpp:3521-3530) instead of the full tile
    grid; lmax_gb None keeps the GB sweep dense (NoCutoff mode has no
    distance bound).  The in-range tile counts ride the output dict
    ("tile_counts") for the PanicButton budget check."""
    from ..ops.pallas import pairs as PK

    n = pos.shape[0]
    tile = PK.pick_tile(n)
    # static box for the kernels: 3 floats (orthorhombic) or 9 (reduced
    # triclinic rows a;b;c — ops/pallas/pairs.py::_pair_geom)
    boxv = (None if box is None
            else tuple(float(x) for x in np.asarray(box).reshape(-1)))
    rperm = a["rperm"]
    rinv = a["rinv"]
    pos_p = pos[rperm]
    pos_pad = jnp.pad(pos_p, ((0, pair_pad - n), (0, 0))).T  # [3, NP]
    hids = a["hids_pad"]            # atom-space (scatters)
    hids_k = a["hids_perm_pad"]     # perm-space (kernel self-pair test)
    hvalid = hids >= 0
    hclip = jnp.clip(hids, 0)
    pos_hpad = (pos[hclip] * hvalid[:, None]).T  # [3, NHP]

    def padv(x):
        return jnp.pad(x, (0, pair_pad - n))

    def hpack(x):
        return jnp.where(hvalid, x[hclip], 0.0)

    def hscatter(xh):
        return jnp.zeros(n, xh.dtype).at[hclip].add(
            jnp.where(hvalid, xh, 0.0))

    # share Q/dQ between the Born and descreening sweeps (one spline
    # contraction instead of two) unless the [NP, NHP] tile buffers would
    # be unreasonably large in HBM (>1 GB for the pair).
    # AGBNP_TILES_NO_QD=1 forces the recompute mode everywhere — the
    # reduced-HBM lever for very large systems (descreening then re-runs
    # its own spline contraction; measured ~20% slower on the sweeps,
    # benchmarks/micro_pairs_floor.py)
    import os as _os
    no_qd = _os.environ.get("AGBNP_TILES_NO_QD") == "1"
    nhpad = int(a["hids_pad"].shape[0])
    save_qd = pair_pad * nhpad * 8 <= (1 << 30) and not no_qd

    heff = float(PK.AGBNP_I4LOOKUP_MAXA if horizon is None
                 else min(horizon, PK.AGBNP_I4LOOKUP_MAXA))

    def run(s_factor, mm_nb=None):
        s_h = hpack(s_factor)
        tile_counts = None
        if pair_tiles is not None:
            lb, lg = pair_tiles
            rvalid = jnp.arange(pair_pad) < n
            c_r, r_r = PK.tile_bounds(pos_pad, rvalid, tile)
            c_h, r_h = PK.tile_bounds(pos_hpad, hvalid, tile)
            tl_b, nv_b, cnt_b = PK.build_tile_list(c_r, r_r, c_h, r_h,
                                                   heff, lb, box=boxv)
            cnt_g = jnp.zeros((), jnp.int32)
            if lg is not None:
                tl_g, nv_g, cnt_g = PK.build_tile_list(
                    c_r, r_r, c_r, r_r, float(cutoff), lg,
                    triangular=True, box=boxv)
            tile_counts = jnp.stack([cnt_b, cnt_g])
        if tile_counts is not None:
            # share Q/dQ between the two list sweeps when the per-entry
            # saved tiles fit a reasonable HBM budget (they scale with the
            # LIST, not the full pair space)
            lqd = pair_tiles[0] * tile * tile * 8 <= (1 << 30) and not no_qd
            born_out = PK.born_sums_tiles(nv_b, tl_b, pos_pad, pos_hpad,
                                          hids_k, a["rowY_pad"],
                                          a["cols_oh_hpad"], s_h,
                                          n, tile, box=boxv,
                                          interpret=pair_interpret,
                                          horizon=horizon, save_qd=lqd)
            if lqd:
                raw, q_t, dq_t = born_out
                qd = (q_t, dq_t)
            else:
                raw = born_out
                qd = None
        else:
            born_out = PK.born_sums(pos_pad, pos_hpad, hids_k,
                                    a["rowY_pad"], a["cols_oh_hpad"], s_h,
                                    n, tile, box=boxv,
                                    interpret=pair_interpret,
                                    horizon=horizon, save_qd=save_qd)
            qd = None
            if save_qd:
                raw, q_t, dq_t = born_out
                qd = (q_t, dq_t)
            else:
                raw = born_out
        from ..models.constants import PIFAC
        # perm-space per-atom chain: Born radii, GB self, vdW dispersion
        beta = 1.0 / a["radii_vdw_perm"] - PIFAC * raw[:n]
        filt, fp = B.agbnp_swf_invbr(beta)
        br_p = 1.0 / filt
        charge_p = a["charge_pad"][:n]

        sig_pad = epsq_pad = excl_pad = None
        if mm_nb is not None:
            sig_pad = padv(mm_nb["sigma"][rperm])
            epsq_pad = padv(mm_nb["epsq"][rperm])
            excl_pad = jnp.pad(mm_nb["excl_rows_perm"],
                               ((0, pair_pad - n), (0, 0)),
                               constant_values=-1)
        if tile_counts is not None and pair_tiles[1] is not None:
            erow, yrow, gbf, mmrow = PK.gb_pair_tiles(
                nv_g, tl_g, pos_pad, a["charge_pad"], padv(br_p), n, tile,
                box=boxv, cutoff=cutoff, sig_pad=sig_pad,
                epsq_pad=epsq_pad, excl_rows_pad=excl_pad,
                interpret=pair_interpret)
        else:
            erow, yrow, gbf, mmrow = PK.gb_pair(pos_pad, a["charge_pad"],
                                                padv(br_p),
                                                n, tile, box=boxv,
                                                cutoff=cutoff,
                                                sig_pad=sig_pad,
                                                epsq_pad=epsq_pad,
                                                excl_rows_pad=excl_pad,
                                                interpret=pair_interpret)
        from ..models.constants import DIELECTRIC_FACTOR
        gb_self = jnp.sum(DIELECTRIC_FACTOR * charge_p * charge_p / br_p)
        gb_pair_e = jnp.sum(erow[:n])
        egb_der_Y = yrow[:n]
        e_vdw = B.vdw_energy(a["alpha_perm"], br_p)

        evdw_der_brw, egb_der_bru = B.born_chain_factors(
            a["alpha_perm"], charge_p, br_p, fp, egb_der_Y)
        if tile_counts is not None:
            w_h, u_h, swf_r, swf_c = PK.descreening_tiles(
                nv_b, tl_b, pos_pad, pos_hpad, hids_k, a["rowY_pad"],
                a["cols_oh_hpad"], s_h, padv(evdw_der_brw),
                padv(egb_der_bru), n, tile, box=boxv,
                interpret=pair_interpret, horizon=horizon, qd=qd)
        else:
            w_h, u_h, swf_r, swf_c = PK.descreening(
                pos_pad, pos_hpad, hids_k, a["rowY_pad"], a["cols_oh_hpad"],
                s_h, padv(evdw_der_brw), padv(egb_der_bru), n, tile,
                box=boxv, interpret=pair_interpret, horizon=horizon, qd=qd)
        swf_cols = jnp.zeros((n, 3), swf_c.dtype).at[hclip].add(
            jnp.where(hvalid[:, None], swf_c, 0.0))
        # back to atom order: row-side force and Born radii
        row_force = (gbf[:n] + swf_r[:n])[rinv]
        out = dict(gb_self=gb_self, gb_pair=gb_pair_e, e_vdw=e_vdw,
                   born_radius=br_p[rinv],
                   pair_force=row_force + swf_cols,
                   evdw_der_W=hscatter(w_h), egb_der_U=hscatter(u_h))
        if mm_nb is not None:
            out["e_mm_nb"] = 0.5 * jnp.sum(mmrow[:n])
        if tile_counts is not None:
            out["tile_counts"] = tile_counts
        return out

    return run


def energy_forces(a: dict, pos, caps: T.TreeCaps, version: int,
                  roffset: float, ntypes_j: int, cutoff=None, topology=None,
                  mixed: bool = False, neighbor_rcut: float = 0.0,
                  neighbor_kmax: int = 0, box=None, pair_pad: int = 0,
                  pair_interpret: bool = False, pair_rows: bool = False,
                  mm_nb=None, pair_shard=None, neighbor_grid=None,
                  descreen_horizon=None, vdw_topology=None,
                  pair_tiles=None, wu_mode: str = "fused"):
    """Full GVolSA (version 0) / AGBNP1 (version 1) energy + analytic forces.

    With neighbor_kmax > 0, the 2-body candidate pairs are built on device
    from a half neighbor list instead of the arrays' pair list — the
    memory-safe mode for large systems (an all-pairs candidate buffer pads
    to ~20x its logical size under TPU lane tiling).

    With box (orthorhombic [3] lengths), the Born/GB/descreening pair phases
    use minimum-image deltas (CutoffPeriodic, AGBNPForce.h:55); the overlap
    tree keeps raw deltas like every reference backend (its overlaps span
    <~0.7 nm and assume a whole solute).

    descreen_horizon < 2 nm truncates the Born-radius/descreening sweeps
    at that distance — the reference's OpenCL-backend semantics in cutoff
    mode (its sweeps ride the cutoff neighbor list and apply
    r2 < CUTOFF_SQUARED, OpenCLAGBNPKernels.cpp:2258,
    AGBNPBornRadii.cl:268).  Default None keeps the Reference-platform
    2 nm LUT horizon (the parity ground truth).
    """
    if neighbor_kmax > 0:
        from ..ops.neighbors import cell_neighbor_pairs, half_neighbor_pairs

        if neighbor_grid is not None:
            pi, pj, pv, nbmax = cell_neighbor_pairs(
                pos, a["ishydrogen"] == 0, neighbor_rcut, neighbor_kmax,
                grid=neighbor_grid)
        else:
            pi, pj, pv, nbmax = half_neighbor_pairs(
                pos, a["ishydrogen"] == 0, neighbor_rcut, neighbor_kmax)
        a = {**a, "pairs_i": pi, "pairs_j": pj, "pairs_valid": pv}
        pair_rows = True
    e_cav, f_cav, self_volume, levels_vdw, lvl1_vdw, diag, red1, red2 = \
        tree_passes(a, pos, caps, roffset, topology=topology,
                    pair_rows=pair_rows)
    if neighbor_kmax > 0:
        diag = {**diag, "neighbor_max": nbmax,
                "neighbor_kmax": jnp.asarray(neighbor_kmax)}

    details = dict(e_vol1=red1["energy"], e_vol2=red2["energy"], e_cav=e_cav)
    if version == 0:
        return dict(energy=e_cav, force=f_cav, diag=diag, details=details)

    # volume scaling factors (ReferenceAGBNPKernels.cpp:420-430)
    s_factor = self_volume / a["vol_vdw_all"]

    e_mm_nb = None
    if pair_pad > 0:
        pp = _pair_phases_pallas(a, pos, cutoff, box, pair_pad,
                                 pair_interpret,
                                 horizon=descreen_horizon,
                                 pair_tiles=pair_tiles)(s_factor,
                                                        mm_nb=mm_nb)
        gb_self, gb_pair_e, e_vdw = pp["gb_self"], pp["gb_pair"], pp["e_vdw"]
        br = pp["born_radius"]
        pair_force = pp["pair_force"]
        evdw_der_W, egb_der_U = pp["evdw_der_W"], pp["egb_der_U"]
        e_mm_nb = pp.get("e_mm_nb")
        if "tile_counts" in pp:
            diag = {**diag, "pair_tile_counts": pp["tile_counts"],
                    "pair_tile_budgets": np.asarray(
                        [pair_tiles[0],
                         -1 if pair_tiles[1] is None else pair_tiles[1]],
                        np.int32)}
    elif pair_shard is not None:
        # multi-chip: the pair phases row-sharded over the atoms mesh axis
        # (parallel/sharding.py::sharded_pair_phases)
        pp = pair_shard(pos, s_factor)
        gb_self, gb_pair_e, e_vdw = pp["gb_self"], pp["gb_pair"], pp["e_vdw"]
        br = pp["born_radius"]
        pair_force = pp["pair_force"]
        evdw_der_W, egb_der_U = pp["evdw_der_W"], pp["egb_der_U"]
    else:
        accum = jnp.float64 if (mixed and pos.dtype != jnp.float64) else None
        geom = B.born_radii(pos, a["radii_vdw"], s_factor, a["ishydrogen"],
                            a["type_i"], a["type_j"], a["yflat"], a["y2flat"],
                            ntypes_j, accum_dtype=accum, box=box,
                            horizon=descreen_horizon)
        br = geom["born_radius"]

        gb = B.gb_energy(pos, a["charge"], br, geom, cutoff=cutoff,
                         accum_dtype=accum)
        e_vdw = B.vdw_energy(a["alpha"], br)

        evdw_der_brw, egb_der_bru = B.born_chain_factors(
            a["alpha"], a["charge"], br, geom["inv_br_fp"], gb["egb_der_Y"])

        sweep = B.descreening_sweep(geom, s_factor, evdw_der_brw,
                                    egb_der_bru, accum_dtype=accum)
        gb_self, gb_pair_e = gb["gb_self"], gb["gb_pair"]
        pair_force = gb["force"] + sweep["force"]
        evdw_der_W, egb_der_U = sweep["evdw_der_W"], sweep["egb_der_U"]

    # self-volume gradient components via a gamma rescan.  The reference runs
    # two separate passes for W (vdW) and U (GB)
    # (ReferenceAGBNPKernels.cpp:713-747); the reduction is linear in gamma
    # and both carry unit weights, so one pass over gamma_W + gamma_U gives
    # the identical force sum at half the tree work.
    #
    # wu_mode: "fused" folds the WU force in (the reference semantics);
    # "split" returns it separately (force_wu) for the mts_wu r-RESPA
    # impulse; "skip" omits the pass entirely (the impulse integrator's
    # off-step evaluation).  The energy never depends on this pass.
    if wu_mode == "skip":
        energy = e_cav + gb_self + gb_pair_e + e_vdw
        force = f_cav + pair_force
        details.update(gb_self=gb_self, gb_pair=gb_pair_e, e_vdw=e_vdw,
                       born_radius=br, self_volume=self_volume,
                       s_factor=s_factor)
        if e_mm_nb is not None:
            details["e_mm_nb"] = e_mm_nb
        return dict(energy=energy, force=force, diag=diag, details=details)
    gamma_WU = (evdw_der_W + egb_der_U) / a["vol_vdw_all"]
    if vdw_topology is not None:
        # compacted WU pass: vdw_topology is the ancestor closure of the
        # vdW-live rows (T.compact_topology, ~13-19% of the topology) and
        # carries the entire WU force signal; one rescan_volumes over it
        # recomputes volumes AND propagates the WU gammas (its packed chain
        # includes gamma), replacing the full-size rescan_gammas + reduce.
        # (Routing the E_vol2/self-volume channel onto it too was measured
        # SLOWER — see tree_passes' docstring.)
        lvl1_WU = T.make_level1(pos, a["radii_vdw"], a["vol_vdw"], gamma_WU,
                                a["ishydrogen"])
        red_WU = T.reduce_tree(T.rescan_volumes(vdw_topology, lvl1_WU),
                               lvl1_WU, with_selfvol=False)
    else:
        lvl1_WU = {**lvl1_vdw, "gamma1i": gamma_WU}
        red_WU = T.reduce_tree(T.rescan_gammas(levels_vdw, lvl1_WU), lvl1_WU,
                               with_selfvol=False)

    energy = e_cav + gb_self + gb_pair_e + e_vdw
    if wu_mode == "split":
        force = f_cav + pair_force
        details["force_wu"] = -red_WU["dr"]
    else:
        force = f_cav + pair_force - red_WU["dr"]

    details.update(gb_self=gb_self, gb_pair=gb_pair_e, e_vdw=e_vdw,
                   born_radius=br, self_volume=self_volume, s_factor=s_factor)
    if e_mm_nb is not None:
        # the dense MM LJ/Coulomb sum rode the GB kernel; its forces are
        # already inside pair_force, its energy is reported separately so
        # the AGBNP energy stays pure
        details["e_mm_nb"] = e_mm_nb
    return dict(energy=energy, force=force, diag=diag, details=details)


def batched_diag_max(diag) -> dict:
    """Reduce a vmapped diag pytree (leading batch axis on every leaf) to
    the worst case over the batch, so the host-side PanicButton check
    (`ops.tree.check_overflow`) sees the largest tree any conformer built."""
    return {k: np.max(np.asarray(v), axis=0) for k, v in diag.items()}


class AGBNPModel:
    """Prepared AGBNP system with a jit-compiled energy/forces entry point.

    The public-facing fast path: mirrors what a Context bound to an
    AGBNPForce provides in the reference (energy + forces per call), with the
    whole pipeline fused under one jit.
    """

    def __init__(self, params: AGBNPParams, caps: T.TreeCaps | None = None,
                 version: int = 1, cutoff: float | None = None,
                 dtype=np.float64, pairs=None, positions=None,
                 mixed: bool = False, box=None,
                 pair_kernel: bool | None = None,
                 caps_boost: float = 1.6, descreen_horizon=None,
                 pair_tiles=None):
        self.params = params
        self.version = version
        self.cutoff = cutoff
        self.mixed = mixed
        # "cutoff": truncate the Born/descreening sweeps at the nonbonded
        # cutoff — the reference OpenCL backend's cutoff-mode semantics
        # (r2 < CUTOFF_SQUARED in its sweeps, OpenCLAGBNPKernels.cpp:2258);
        # None keeps the Reference-platform 2 nm LUT horizon
        if descreen_horizon == "cutoff":
            descreen_horizon = cutoff
        self.descreen_horizon = descreen_horizon
        self.box = None if box is None else jnp.asarray(box, dtype)
        if caps is None:
            caps = self._sized_caps(params, positions, caps_boost)
        self.caps = caps
        self.dtype = dtype
        # fused Pallas pair kernels: default ON for the TPU f32 deployment
        # path (version 1, no f64 accumulation); the XLA path remains the
        # oracle-parity/mixed-precision/grad-capable formulation
        if pair_kernel is None:
            import jax as _jax
            pair_kernel = (version == 1 and not mixed
                           and _jax.default_backend() == "tpu"
                           and np.dtype(dtype) == np.float32)
        self.pair_kernel = bool(pair_kernel)
        self.pair_interpret = False
        if self.pair_kernel:
            import jax as _jax
            self.pair_interpret = _jax.default_backend() != "tpu"
        from ..ops.pallas.pairs import pad_to, pick_tile
        self.pair_pad = (pad_to(params.n, pick_tile(params.n))
                         if self.pair_kernel else 0)
        # NOTE: a banded Pallas tree-sweep backend for the fixed-topology MD
        # path was built, validated, and retired in round 2: on the current
        # TPU runtime the XLA gather path and the banded kernels hit the
        # same per-row latency floor, and the span-sized window blocks
        # exceeded the 16 MB VMEM limit above ~5k atoms (see git history /
        # benchmarks/RESULTS.md).
        # large systems: build candidate pairs on device per evaluation (an
        # all-pairs list at N^2/2 rows is tile-padding hostile); small ones
        # keep the exact triangular list
        self.neighbor_rcut = 0.0
        self.neighbor_kmax = 0
        self.neighbor_grid = None
        if pairs is None and positions is not None and params.n > 2000:
            from ..md.simulation import _host_max_neighbors
            from ..ops.neighbors import CellGrid, tree_pair_cutoff

            self.neighbor_rcut = tree_pair_cutoff(params.radii_large) + 0.05
            heavy = np.asarray(params.ishydrogen) == 0
            seen = _host_max_neighbors(np.asarray(positions), heavy,
                                       self.neighbor_rcut)
            self.neighbor_kmax = int(np.ceil(seen * 1.5 / 16) * 16)
            if params.n > 3000:
                self.neighbor_grid = CellGrid(np.asarray(positions),
                                              self.neighbor_rcut,
                                              heavy_mask=heavy)
            pairs = (np.zeros(1, np.int32), np.zeros(1, np.int32),
                     np.zeros(1, bool))  # placeholder; rebuilt on device
        self._init_positions = (None if positions is None
                                else np.asarray(positions))
        self.arrays = prepare_arrays(params, dtype=dtype, pairs=pairs,
                                     pair_pad=self.pair_pad,
                                     positions=positions)
        self.ntypes_j = int(np.max(np.asarray(self.arrays["type_j"])) + 1)
        # interacting-tile lists for the pair sweeps: budgets sized from the
        # initial configuration (None = auto when possible; False = dense
        # grids; explicit (lb, lg) from a PanicButton regrow).
        # Round 4 capped auto at 8k atoms after remote-worker crashes at
        # 10,240; round 5 re-probed after the chunked-build HBM fix
        # (benchmarks/probe_tiles_large.py): single evals AND MD windows
        # run clean with the lists at 10,240 (112.6 ms/step) and 16,384
        # (233.2 ms/step) — the crash was the AOT HBM pressure, not the
        # list kernels — so the gate is lifted.  The Q/dQ save path stays
        # memory-bounded per list budget (lqd in _pair_phases_pallas).
        if pair_tiles is None:
            pair_tiles = (self.pair_kernel
                          and self._init_positions is not None)
        if pair_tiles is True:
            pair_tiles = self._sized_pair_tiles()
        self.pair_tiles = pair_tiles if pair_tiles else None
        self._build_jit()

    def _sized_pair_tiles(self):
        """Initial (lmax_born, lmax_gb) tile-list budgets: the in-range
        tile count on the initial configuration x1.5 headroom (8-aligned),
        overflow-detected through the diag like the neighbor kmax."""
        from ..ops.pallas.pairs import host_tile_count, pick_tile

        n = self.params.n
        tile = pick_tile(n)
        pos = self._init_positions
        rperm = np.asarray(self.arrays["rperm"])
        pos_p = np.zeros((3, self.pair_pad))
        pos_p[:, :n] = pos[rperm].T
        rvalid = np.arange(self.pair_pad) < n
        hids = np.asarray(self.arrays["hids_pad"])
        hvalid = hids >= 0
        pos_h = np.zeros((3, hids.shape[0]))
        pos_h[:, hvalid] = pos[hids[hvalid]].T
        boxv = (None if self.box is None
                else np.asarray(self.box, np.float64))
        from .constants import AGBNP_I4LOOKUP_MAXA
        heff = (AGBNP_I4LOOKUP_MAXA if self.descreen_horizon is None
                else min(self.descreen_horizon, AGBNP_I4LOOKUP_MAXA))

        def budget(count, ntot):
            return int(min(max(8, np.ceil(count * 1.5 / 8) * 8), ntot))

        nti = self.pair_pad // tile
        ntj = pos_h.shape[1] // tile
        cb = host_tile_count(pos_p, rvalid, pos_h, hvalid, tile, heff,
                             box=boxv)
        lb = budget(cb, nti * ntj)
        lg = None
        if self.cutoff is not None:
            cg = host_tile_count(pos_p, rvalid, pos_p, rvalid, tile,
                                 float(self.cutoff), triangular=True,
                                 box=boxv)
            lg = budget(cg, nti * (nti + 1) // 2)
        return (lb, lg)

    def update_params(self, params: AGBNPParams) -> bool:
        """Parameter-only update (updateParametersInContext semantics,
        reference AGBNPForce.cpp:76-78).

        The parameter arrays are jit *arguments*, so when the new parameters
        keep every static shape (same atom count/hydrogen pattern and the
        same radius-type table dimensions) this is just an array swap — the
        compiled executable is reused, like the reference's device-array
        re-upload.  Returns True if no recompilation was needed.
        """
        old = self.arrays
        pairs = (old["pairs_i"], old["pairs_j"], old["pairs_valid"])
        arrays = prepare_arrays(params, dtype=self.dtype, pairs=pairs,
                                pair_pad=self.pair_pad,
                                positions=self._init_positions)
        ntypes_j = int(np.max(np.asarray(arrays["type_j"])) + 1)
        same = (ntypes_j == self.ntypes_j
                and set(arrays) == set(old)
                and all(np.shape(arrays[k]) == np.shape(old[k])
                        for k in arrays))
        self.params = params
        self.arrays = arrays
        if not same:
            self.ntypes_j = ntypes_j
            self._build_jit()
            return False
        return True

    @staticmethod
    def _sized_caps(params, positions, boost: float = 1.6):
        """Capacity sizing: exact native pre-pass on the given positions
        (the reference's CPU GaussVol pre-pass analogue) when the native
        runtime is available, else the measured-ratio heuristic."""
        if positions is not None:
            try:
                from ..runtime.native import size_tree_caps
                return size_tree_caps(params, np.asarray(positions),
                                      boost=boost)
            except Exception as exc:  # compiler/ABI failure: degrade loudly
                import warnings
                warnings.warn(
                    "native tree-sizing pre-pass unavailable "
                    f"({type(exc).__name__}: {exc}); falling back to "
                    "heuristic TreeCaps", RuntimeWarning)
        return T.TreeCaps.for_natoms(params.n, boost=max(1.0, boost / 1.6))

    def _build_jit(self):
        self._jit_ef = jax.jit(partial(
            energy_forces, caps=self.caps, version=self.version,
            roffset=self.params.roffset, ntypes_j=self.ntypes_j,
            cutoff=self.cutoff, mixed=self.mixed,
            neighbor_rcut=self.neighbor_rcut,
            neighbor_kmax=self.neighbor_kmax,
            neighbor_grid=self.neighbor_grid, box=self.box,
            pair_pad=self.pair_pad, pair_interpret=self.pair_interpret,
            descreen_horizon=self.descreen_horizon,
            pair_tiles=self.pair_tiles))
        self._jit_vef = None  # batched variant rebuilt lazily after regrow
        self._jit_e = None    # energy-only variant (wu_mode="skip"), lazy

    def energy_forces(self, pos, with_details: bool = False):
        out = self._jit_ef(self.arrays, jnp.asarray(pos, self.dtype))
        if with_details:
            return out["energy"], out["force"], out
        return out["energy"], out["force"]

    def energy_only(self, pos, with_details: bool = False):
        """Energy without the WU gamma-rescan force pass (the pass carries
        force only — the includeForces=False evaluation path of
        AGBNPForceImpl::calcForcesAndEnergy, reference
        openmmapi/src/AGBNPForceImpl.cpp:32-36)."""
        if self._jit_e is None:
            self._jit_e = jax.jit(partial(
                energy_forces, caps=self.caps, version=self.version,
                roffset=self.params.roffset, ntypes_j=self.ntypes_j,
                cutoff=self.cutoff, mixed=self.mixed,
                neighbor_rcut=self.neighbor_rcut,
                neighbor_kmax=self.neighbor_kmax,
                neighbor_grid=self.neighbor_grid, box=self.box,
                pair_pad=self.pair_pad, pair_interpret=self.pair_interpret,
                descreen_horizon=self.descreen_horizon,
                pair_tiles=self.pair_tiles, wu_mode="skip"))
        out = self._jit_e(self.arrays, jnp.asarray(pos, self.dtype))
        if with_details:
            return out["energy"], out
        return out["energy"]

    def batched_energy_forces(self, pos_batch):
        """Evaluate B conformations [B, N, 3] of the same system in one
        vmapped jit call (the batched-rescoring path; no reference analogue
        — the reference scores one conformation per Context evaluation).

        Requires the XLA pair-phase path (pair_pad == 0).  Returns the full
        out dict with every leaf carrying a leading batch axis; pass the
        diag through `batched_diag_max` before `check_and_grow`.
        """
        if self.pair_pad > 0:
            raise ValueError(
                "batched_energy_forces requires the XLA pair path "
                "(construct the model with pair_kernel=False)")
        if getattr(self, "_jit_vef", None) is None:
            self._jit_vef = jax.jit(jax.vmap(
                partial(energy_forces, caps=self.caps, version=self.version,
                        roffset=self.params.roffset, ntypes_j=self.ntypes_j,
                        cutoff=self.cutoff, mixed=self.mixed,
                        neighbor_rcut=self.neighbor_rcut,
                        neighbor_kmax=self.neighbor_kmax,
                        neighbor_grid=self.neighbor_grid, box=self.box,
                        descreen_horizon=self.descreen_horizon),
                in_axes=(None, 0)))
        return self._jit_vef(self.arrays, jnp.asarray(pos_batch, self.dtype))

    def check_and_grow(self, diag) -> bool:
        """PanicButton: grow capacities if the last evaluation overflowed.
        Returns True if a re-evaluation is needed."""
        ov = T.check_overflow(diag)
        nb_over = ("neighbor_max" in diag
                   and int(diag["neighbor_max"]) > self.neighbor_kmax > 0)
        tiles_over = self.grow_pair_tiles(diag.get("pair_tile_counts"))
        if not ov["any"] and not nb_over and not tiles_over:
            return False
        if ov["any"]:
            self.caps = self.caps.grow(
                [bool(c) for c in ov["cap_overflow"]],
                [bool(s) for s in ov["sib_overflow"][:-1]])
        if nb_over:
            self.neighbor_kmax = int(np.ceil(
                int(diag["neighbor_max"]) * 1.5 / 16) * 16)
        self._build_jit()
        return True

    def grow_pair_tiles(self, counts) -> bool:
        """Grow the interacting-tile-list budgets past measured in-range
        counts.  Returns True (and updates self.pair_tiles) on overflow;
        the caller must rebuild its jit (check_and_grow does)."""
        if self.pair_tiles is None or counts is None:
            return False
        cb, cg = (int(x) for x in np.asarray(counts))
        lb, lg = self.pair_tiles
        over = False
        if cb > lb:
            lb = max(8, int(np.ceil(cb * 1.5 / 8) * 8))
            over = True
        if lg is not None and cg > lg:
            lg = max(8, int(np.ceil(cg * 1.5 / 8) * 8))
            over = True
        if over:
            self.pair_tiles = (lb, lg)
        return over
