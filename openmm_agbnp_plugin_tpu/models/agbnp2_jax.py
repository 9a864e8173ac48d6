"""AGBNP2 (version 2) on the TPU compute path: JAX energy + autodiff forces.

Reuses the flattened-tree machinery for the second (molecular-surface)
overlap tree: MS water-probe particles are generated from a padded heavy-pair
list, their free volumes come from dense [cap_ms, N] Gaussian subtractions,
and both MS passes (vdW and large free volumes) run over one built topology
(reference ReferenceAGBNPKernels.cpp:797-1793).

Forces are -jax.grad of the energy.  The reference's hand-written v2 force
chain is knowingly incomplete (WIP; see models/oracle_agbnp2.py) — autodiff
through this energy gives the exact gradient of the same energy function,
which is the TPU-native resolution of that gap.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import born as B
from ..ops import tree as T
from ..ops.neighbors import half_neighbor_pairs, tree_pair_cutoff
from .constants import (
    AGBNP2_RADIUS_INCREMENT,
    KFC,
    PI,
    SOLVENT_RADIUS,
    ANG3,
    sphere_volume,
)
from .i4_tables import I4LookupTables
from .oracle import AGBNPParams

VOLMINMSA = 0.25 * ANG3
VOLMINMSB = 1.00 * ANG3
VOL_COEFF = 0.17
FLT_MIN = 1.1754943508222875e-38


def _ms_switch(v):
    """Quintic switch on the MS window (VOLMINMSA..VOLMINMSB)."""
    u = jnp.clip((v - VOLMINMSA) / (VOLMINMSB - VOLMINMSA), 0.0, 1.0)
    return u ** 3 * (10.0 - 15.0 * u + 6.0 * u ** 2)


def ms_pair_cutoff(radii_vdw) -> float:
    """Distance beyond which a heavy pair cannot spawn an MS particle."""
    radw = SOLVENT_RADIUS
    rmax = float(np.max(np.asarray(radii_vdw)))
    q = rmax / radw
    volms0 = VOL_COEFF * q * q * sphere_volume(radw)
    sigma = 0.5 * math.sqrt(q) * radw
    dms = 2 * rmax + 0.5 * radw
    if volms0 <= VOLMINMSA:
        return dms
    return dms + sigma * math.sqrt(2.0 * math.log(volms0 / VOLMINMSA)) + 0.05


def ms_particles(pos, radii_vdw, pi, pj, pvalid, cap_ms, idx=None,
                 count=None):
    """Padded MS particle set from heavy candidate pairs
    (reference cpp:895-941).  Returns dict(pos, vol0, p1, p2, valid, idx,
    count).

    With idx/count (a frozen compaction from an earlier build — the v2
    stale-topology MD window), the survivor selection is reused and only
    the geometry (position, volume) is recomputed at the current
    coordinates: an MS particle that drifted below the volume switch
    contributes ~0 smoothly, and pairs that would newly appear wait for
    the next rebuild — the same approximation class as the fixed atomic
    tree topology between rebuilds."""
    radw = SOLVENT_RADIUS
    volw = sphere_volume(radw)
    r1 = radii_vdw[pi]
    r2 = radii_vdw[pj]
    q = jnp.sqrt(r1 * r2) / radw
    dist = pos[pj] - pos[pi]
    d = jnp.sqrt(jnp.sum(dist * dist, axis=-1) + 1e-30)
    dms = r1 + r2 + 0.5 * radw
    volms0 = VOL_COEFF * q * q * volw
    sigma = 0.5 * jnp.sqrt(q) * radw
    volms = volms0 * jnp.exp(-0.5 * (d - dms) ** 2 / (sigma * sigma))
    s = _ms_switch(volms)
    volmsw = volms * s
    mask = pvalid & (volmsw > FLT_MIN)

    fms = 0.5 * (1.0 + (r1 - r2) / d)
    posms = pos[pj] * fms[:, None] + pos[pi] * (1.0 - fms)[:, None]

    if idx is None:
        count = jnp.sum(mask)
        idx = jnp.nonzero(mask, size=cap_ms, fill_value=0)[0]
    valid = jnp.arange(cap_ms) < count
    return dict(
        pos=jnp.where(valid[:, None], posms[idx], 0.0),
        vol0=jnp.where(valid, volmsw[idx], 0.0),
        p1=jnp.where(valid, pi[idx], 0).astype(jnp.int32),
        p2=jnp.where(valid, pj[idx], 0).astype(jnp.int32),
        valid=valid,
        count=count,
        idx=idx,
    )


def ms_subtraction_horizon(radii_vdw, radii_large, margin: float = 0.1):
    """Static distance beyond which no atom can contribute to any MS free
    volume: the subtracted overlap is switched to exact 0 below VOLMINA
    (pol_switchfunc), and the Gaussian product volume with the largest
    possible prefactor (max MS seed volume x max atomic self-volume) falls
    below VOLMINA past this radius.  `margin` absorbs position drift over a
    stale-topology MD window (the same skin idea as the Verlet list)."""
    from ..models.constants import VOLMINA

    radw = SOLVENT_RADIUS
    rmax_vdw = float(np.max(np.asarray(radii_vdw)))
    vol0_max = VOL_COEFF * (rmax_vdw / radw) ** 2 * sphere_volume(radw)
    ams = KFC / (radw * radw)
    dmax = 0.0
    for r in np.unique(np.asarray(radii_large)):
        ai = KFC / (r * r)
        df = ams * ai / (ams + ai)
        g0 = vol0_max * sphere_volume(r) / (PI / df) ** 1.5
        if g0 > VOLMINA:
            dmax = max(dmax, math.sqrt(math.log(g0 / VOLMINA) / df))
    return dmax + margin


def ms_atom_neighbors(ms_pos, ms_valid, pos, heavy, rcut, k: int):
    """Per-MS-particle padded list of heavy atoms within `rcut` (the
    subtraction horizon): [cap_ms, k] indices + validity, and the max
    in-range count (> k means truncation -> overflow channel)."""
    dist = pos[None, :, :] - ms_pos[:, None, :]
    d2 = jnp.sum(dist * dist, axis=-1)
    ok = (heavy[None, :] & (d2 < rcut * rcut) & ms_valid[:, None])
    order = jnp.argsort(~ok, axis=1, stable=True)[:, :k]
    nvalid = jnp.take_along_axis(ok, order, axis=1)
    counts = jnp.sum(ok, axis=1)
    return order.astype(jnp.int32), nvalid, jnp.max(counts)


def ms_free_volumes(ms, pos, radii, self_volume, ishydrogen, nbr=None):
    """Subtract self-volume-weighted atomic Gaussians from each MS sphere
    (reference cpp:1013-1048).

    nbr = (idx [cap_ms, k], nvalid [cap_ms, k]) bounds the subtraction to
    the atoms inside the static horizon (ms_subtraction_horizon) — exact,
    because every excluded overlap sits below the VOLMINA switch and
    contributes literal 0 in the dense form too (the TPU-shaped analogue
    of the reference's tiled MSParticles1Vfree, MSParticles.cl:538-936).
    Without nbr, the dense [cap_ms, N] form."""
    radw = SOLVENT_RADIUS
    ams = KFC / (radw * radw)
    from ..ops.gaussians import pol_switchfunc

    if nbr is not None:
        idx, nvalid = nbr
        p = pos[idx]                       # [cap_ms, k, 3]
        dist = p - ms["pos"][:, None, :]
        d2 = jnp.sum(dist * dist, axis=-1)
        ai = KFC / (radii[idx] * radii[idx])
        df = ams * ai / (ams + ai)
        gvol = (ms["vol0"][:, None] * self_volume[idx]
                / (PI / df) ** 1.5) * jnp.exp(-df * d2)
        sub_mask = (nvalid
                    & (idx != ms["p1"][:, None])
                    & (idx != ms["p2"][:, None]))
        s, _ = pol_switchfunc(gvol)
        fv = ms["vol0"] - jnp.sum(jnp.where(sub_mask, s * gvol, 0.0),
                                  axis=1)
        return fv * _ms_switch(fv) * ms["valid"].astype(fv.dtype)

    ai = KFC / (radii * radii)
    dist = pos[None, :, :] - ms["pos"][:, None, :]
    d2 = jnp.sum(dist * dist, axis=-1)
    a12 = ams + ai[None, :]
    df = ams * ai[None, :] / a12
    gvol = (ms["vol0"][:, None] * self_volume[None, :]
            / (PI / df) ** 1.5) * jnp.exp(-df * d2)
    sub_mask = ((ishydrogen[None, :] == 0)
                & (jnp.arange(pos.shape[0])[None, :] != ms["p1"][:, None])
                & (jnp.arange(pos.shape[0])[None, :] != ms["p2"][:, None]))
    # the subtracted overlaps use the ATOMIC switching window
    # (ogauss_alpha, reference cpp:1038), the free volume itself the MS one
    s, _ = pol_switchfunc(gvol)
    fv = ms["vol0"] - jnp.sum(jnp.where(sub_mask, s * gvol, 0.0), axis=1)
    return fv * _ms_switch(fv) * ms["valid"].astype(fv.dtype)


def _zero_cot(x):
    """Zero cotangent with the dtype JAX expects (float0 for ints/bools)."""
    import numpy as _np

    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        return jnp.zeros_like(x)
    return _np.zeros(jnp.shape(x), jax.dtypes.float0)


@jax.custom_vjp
def _atomic_cavity(pos, lvl1_args, topo):
    """Atomic cavity passes with an ANALYTIC reverse rule.

    Returns (e_cav = E1+E2, sv_large, sv_vdw) from the two-parameterization
    rescan over the fixed topology.  Autodiff through the tree sweeps costs
    ~2-3x the forward pass; the hand chain is the v1 machinery instead:

      d/dpos [g_e*E(gamma) + sum_i w_i sv_i] = reduce_tree(
          rescan_gammas(levels, g_e*gamma + w)).dr

    using E(gamma=w) == sum_i w_i sv_i (the reduction is linear in the
    per-atom gammas; the identity behind the reference's two gamma-rescan
    force passes, ReferenceAGBNPKernels.cpp:713-747).  One extra gamma pass
    per tree replaces the full transposed sweep.

    NOTE: cotangents for the parameter arrays are zero — v2 force
    evaluation differentiates positions only (parameter fitting is a
    v1 pipeline, api/fitting.py).
    """
    out, _ = _atomic_cavity_fwd(pos, lvl1_args, topo)
    return out


def _make_lvl1(pos, lvl1_args):
    rl, vl, rv, vv, gdr, ish_f = lvl1_args
    ish = ish_f.astype(jnp.int32)
    lvl1_large = T.make_level1(pos, rl, vl, gdr, ish)
    lvl1_vdw = T.make_level1(pos, rv, vv, -gdr, ish)
    return lvl1_large, lvl1_vdw


def _atomic_cavity_fwd(pos, lvl1_args, topo):
    lvl1_large, lvl1_vdw = _make_lvl1(pos, lvl1_args)
    levels_l, levels_v = T.rescan_volumes2(topo, lvl1_large, lvl1_vdw)
    red1, red2 = T.reduce_tree2(levels_l, levels_v, lvl1_large, lvl1_vdw,
                                with_selfvol_b=True, with_selfvol_a=True)
    out = (red1["energy"], red2["energy"], red1["self_volume"],
           red2["self_volume"])
    return out, (pos, lvl1_args, topo)


def _atomic_cavity_bwd(res, cots):
    pos, lvl1_args, topo = res
    g1, g2, w_l, w_v = cots
    lvl1_large, lvl1_vdw = _make_lvl1(pos, lvl1_args)
    levels_l, levels_v = T.rescan_volumes2(topo, lvl1_large, lvl1_vdw)
    gdr = lvl1_args[4]
    gam_l = {**lvl1_large, "gamma1i": g1 * gdr + w_l}
    gam_v = {**lvl1_vdw, "gamma1i": -g2 * gdr + w_v}
    red_l, red_v = T.reduce_tree2(T.rescan_gammas(levels_l, gam_l),
                                  T.rescan_gammas(levels_v, gam_v),
                                  gam_l, gam_v, with_selfvol_b=False)
    dpos = red_l["dr"] + red_v["dr"]
    return (dpos, jax.tree.map(_zero_cot, res[1]),
            jax.tree.map(_zero_cot, topo))


_atomic_cavity.defvjp(_atomic_cavity_fwd, _atomic_cavity_bwd)


@jax.custom_vjp
def _ms_cavity(ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f, topo_ms):
    """Both MS-tree passes with the analytic reverse rule.

    Same machinery as _atomic_cavity, plus the VOLUME cotangents: the MS
    free volumes are themselves functions of the atoms, so bwd returns
    d/d(fv) through reduce_tree's dv channel (dE/dV_level1, the
    volume-sensitivity chain the reference derives by hand) alongside the
    d/d(ms_pos) gamma-pass gradients.  Returns (e_vdw_tree, e_large_tree,
    sv_ms)."""
    out, _ = _ms_cavity_fwd(ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f,
                            topo_ms)
    return out


def _ms_lvl1(ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f):
    radw = SOLVENT_RADIUS
    n_ms = ms_pos.shape[0]
    radv = jnp.full(n_ms, radw, ms_pos.dtype)
    ish = ish_ms_f.astype(jnp.int32)
    lvl1_v = T.make_level1(ms_pos, radv, fv_vdw, gamma_ms, ish)
    lvl1_l = T.make_level1(ms_pos, radv, fv_large, -gamma_ms, ish)
    return lvl1_v, lvl1_l


def _ms_cavity_fwd(ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f, topo_ms):
    lvl1_v, lvl1_l = _ms_lvl1(ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f)
    levels_v, levels_l = T.rescan_volumes2(topo_ms, lvl1_v, lvl1_l)
    red_l, red_v = T.reduce_tree2(levels_l, levels_v, lvl1_l, lvl1_v,
                                  with_selfvol_b=True)
    out = (red_v["energy"], red_l["energy"], red_v["self_volume"])
    return out, (ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f, topo_ms)


def _ms_cavity_bwd(res, cots):
    ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f, topo_ms = res
    g2, g1, w = cots
    lvl1_v, lvl1_l = _ms_lvl1(ms_pos, fv_vdw, fv_large, gamma_ms, ish_ms_f)
    levels_v, levels_l = T.rescan_volumes2(topo_ms, lvl1_v, lvl1_l)
    gam_v = {**lvl1_v, "gamma1i": g2 * gamma_ms + w}
    gam_l = {**lvl1_l, "gamma1i": -g1 * gamma_ms}
    red_v = T.reduce_tree(T.rescan_gammas(levels_v, gam_v), gam_v,
                          with_selfvol=False, with_dv=True)
    red_l = T.reduce_tree(T.rescan_gammas(levels_l, gam_l), gam_l,
                          with_selfvol=False, with_dv=True)

    # the reduce dv channel is V_i * dE/dV_i (an n-body Gaussian product
    # volume is LINEAR in each constituent volume, so V dgvol/dV == gvol
    # exactly; the chain accumulates gvol-weighted sfp terms).  Divide by
    # the level-1 volume for the plain dE/d(fv) cotangent; zero-volume
    # (masked/padded) particles contribute nothing downstream either.
    def dvol(red, lvl1):
        gv = lvl1["gv"]
        return jnp.where(gv > 0.0, red["dv"] / jnp.where(gv > 0.0, gv, 1.0),
                         0.0)

    return (red_v["dr"] + red_l["dr"], dvol(red_v, lvl1_v),
            dvol(red_l, lvl1_l), jax.tree.map(_zero_cot, gamma_ms),
            jax.tree.map(_zero_cot, ish_ms_f),
            jax.tree.map(_zero_cot, topo_ms))


_ms_cavity.defvjp(_ms_cavity_fwd, _ms_cavity_bwd)


def make_pair_cavity(cutoff, pair_pad: int, pair_interpret: bool,
                     horizon=None, pair_tiles=None):
    """GB/vdW pair phases through the fused v1 Pallas tile kernels with an
    ANALYTIC custom VJP — the v2 analogue of routing AGBNPBornRadii.cl/
    AGBNPGBEnergy.cl under the hand-derived chain instead of autodiff.

    Forward: _pair_phases_pallas (born sums -> Born radii -> GB self/pair +
    vdW + direct forces -> BrW/BrU -> descreening sweep), which already
    produces the exact reverse quantities: pair_force = -dE/dpos at fixed
    volume scaling factors, and W + U = dE/d(s_factor) (the identity behind
    the reference's two gamma-rescan force passes,
    ReferenceAGBNPKernels.cpp:523-586).

    Returns pair_cavity(pos, s_factor, arrays) -> (e_pair, details).
    NOTE: only the ENERGY output carries a gradient; the details dict
    (born radii, per-term energies) is reporting-only and its cotangents
    are discarded (the v2 energy function uses it for details only)."""
    from .agbnp_jax import _pair_phases_pallas

    def _run(pos, s_factor, pa):
        pp = _pair_phases_pallas(pa, pos, cutoff, None, pair_pad,
                                 pair_interpret, horizon=horizon,
                                 pair_tiles=pair_tiles)(s_factor)
        e = pp["gb_self"] + pp["gb_pair"] + pp["e_vdw"]
        det = dict(born_radius=pp["born_radius"], gb_self=pp["gb_self"],
                   gb_pair=pp["gb_pair"], e_vdw=pp["e_vdw"])
        return e, det, pp

    @jax.custom_vjp
    def pair_cavity(pos, s_factor, pa):
        e, det, _ = _run(pos, s_factor, pa)
        return e, det

    def _fwd(pos, s_factor, pa):
        e, det, pp = _run(pos, s_factor, pa)
        res = (pp["pair_force"], pp["evdw_der_W"] + pp["egb_der_U"], pa)
        return (e, det), res

    def _bwd(res, cots):
        pair_force, wu, pa = res
        g_e, _ = cots  # detail cotangents are zero by construction
        return (-g_e * pair_force, g_e * wu,
                jax.tree.map(_zero_cot, pa))

    pair_cavity.defvjp(_fwd, _bwd)
    return pair_cavity


def agbnp2_energy(a, pos, caps, caps_ms, roffset, ntypes_j,
                  ms_pi, ms_pj, ms_pv, cap_ms, ms_kmax, common_gamma,
                  cutoff=None, topology=None, with_topology: bool = False,
                  ms_sub_k: int = 0, ms_sub_rcut: float = 0.0,
                  pair_phases=None):
    """Total AGBNP2 energy as one jittable function of positions.

    topology (from an earlier with_topology=True call at nearby
    coordinates) replaces both tree builds with fixed-topology volume
    rescans and reuses the frozen MS compaction — the v2 analogue of the
    v1 stale-topology MD window (volumes exact at the current positions,
    node sets stale until the next rebuild).  ms_pi/ms_pj/ms_pv must then
    be the same frozen candidate rows the topology was built from.
    with_topology=True additionally returns the topology dict."""
    gamma_dr = a["gamma"] / roffset
    radw = SOLVENT_RADIUS

    # atomic cavity passes: the build (topology discovery) carries no
    # gradient path — node values are recomputed by the fixed-topology
    # rescan inside _atomic_cavity, whose custom_vjp replaces the
    # transposed tree sweeps with the v1 analytic gamma-pass machinery
    if topology is None:
        lvl1_large = T.make_level1(pos, a["radii_large"], a["vol_large"],
                                   gamma_dr, a["ishydrogen"])
        levels_b, diag = T.build_tree(lvl1_large, a["pairs_i"],
                                      a["pairs_j"], caps,
                                      pairs_valid=a["pairs_valid"])
        topo_atoms = T.tree_topology(levels_b)
    else:
        topo_atoms = topology["atoms"]
        diag = dict(
            counts=jnp.stack([jnp.sum(t["valid"])
                              for t in topo_atoms]).astype(jnp.int32),
            max_siblings=jnp.zeros(7, jnp.int32))
    lvl1_args = (a["radii_large"], a["vol_large"], a["radii_vdw"],
                 a["vol_vdw"], gamma_dr,
                 jnp.asarray(a["ishydrogen"]).astype(pos.dtype))
    e_vol1, e_vol2, sv_large, sv_vdw = _atomic_cavity(pos, lvl1_args,
                                                      topo_atoms)
    energy = e_vol1 + e_vol2

    # MS particles + free volumes.  With ms_sub_k > 0 the subtraction is
    # bounded to the atoms inside the static horizon (exact — excluded
    # overlaps sit below the VOLMINA switch); the [cap_ms, k] list is built
    # here at a full build and frozen into the topology for the window.
    ms = ms_particles(pos, a["radii_vdw"], ms_pi, ms_pj, ms_pv, cap_ms,
                      idx=None if topology is None else topology["ms_idx"],
                      count=None if topology is None
                      else topology["ms_count"])
    nbr = None
    ms_sub_max = jnp.zeros((), jnp.int32)
    if topology is not None:
        nbr = topology.get("ms_nbr")
    elif ms_sub_k > 0:
        idx_n, nvalid_n, ms_sub_max = ms_atom_neighbors(
            ms["pos"], ms["valid"], pos, a["ishydrogen"] == 0,
            ms_sub_rcut, ms_sub_k)
        nbr = (idx_n, nvalid_n)
        ms_sub_max = ms_sub_max.astype(jnp.int32)
    fv_large = ms_free_volumes(ms, pos, a["radii_large"],
                               sv_large, a["ishydrogen"], nbr=nbr)
    fv_vdw = ms_free_volumes(ms, pos, a["radii_vdw"],
                             sv_vdw, a["ishydrogen"], nbr=nbr)

    # MS overlap trees (both parameterizations through one analytic-VJP
    # cavity pass, _ms_cavity; the build carries no gradient path)
    n_ms = cap_ms
    gamma_ms = jnp.full(n_ms, -common_gamma / roffset, pos.dtype)
    ish_ms = 1 - ms["valid"].astype(jnp.int32)
    if topology is None:
        lvl1_ms = T.make_level1(ms["pos"], jnp.full(n_ms, radw, pos.dtype),
                                fv_vdw, gamma_ms, ish_ms)
        mpi, mpj, mpv, m_nbmax = half_neighbor_pairs(ms["pos"], ms["valid"],
                                                     tree_pair_cutoff([radw]),
                                                     ms_kmax)
        mlevels, mdiag = T.build_tree(lvl1_ms, mpi, mpj, caps_ms,
                                      pairs_valid=mpv)
        topo_ms = T.tree_topology(mlevels)
        # MS-capacity overflow channels (count vs cap_ms truncation, MS-tree
        # neighbor list) ride the diagnostics for the MD PanicButton
        mdiag = {**mdiag, "ms_count": ms["count"], "ms_nbmax": m_nbmax,
                 "ms_sub_max": ms_sub_max}
    else:
        topo_ms = topology["ms"]
        mdiag = dict(
            counts=jnp.stack([jnp.sum(t["valid"])
                              for t in topo_ms]).astype(jnp.int32),
            max_siblings=jnp.zeros(7, jnp.int32),
            ms_count=ms["count"], ms_nbmax=jnp.zeros((), jnp.int32),
            ms_sub_max=jnp.zeros((), jnp.int32))
    e_ms_vdw, e_ms_large, sv_ms = _ms_cavity(
        ms["pos"], fv_vdw, fv_large, gamma_ms, ish_ms.astype(pos.dtype),
        topo_ms)
    energy = energy + e_ms_vdw

    # MS self volumes added 50/50 to parents
    svadd = (0.5 * jax.ops.segment_sum(sv_ms, ms["p1"],
                                       num_segments=pos.shape[0])
             + 0.5 * jax.ops.segment_sum(sv_ms, ms["p2"],
                                         num_segments=pos.shape[0]))
    self_volume = sv_vdw + svadd

    # GB / vdW phases (shared with AGBNP1).  With pair_phases (a
    # make_pair_cavity closure), they run through the fused Pallas tile
    # kernels with the analytic reverse chain instead of XLA + autodiff.
    s_factor = self_volume / a["vol_vdw_all"]
    if pair_phases is not None:
        e_pair, pdet = pair_phases(pos, s_factor, a)
        br = pdet["born_radius"]
        gb = dict(gb_self=pdet["gb_self"], gb_pair=pdet["gb_pair"])
        e_vdw = pdet["e_vdw"]
        energy = energy + e_pair
    else:
        geom = B.born_radii(pos, a["radii_vdw"], s_factor, a["ishydrogen"],
                            a["type_i"], a["type_j"], a["yflat"],
                            a["y2flat"], ntypes_j)
        br = geom["born_radius"]
        gb = B.gb_energy(pos, a["charge"], br, geom, cutoff=cutoff)
        e_vdw = B.vdw_energy(a["alpha"], br)
        energy = energy + gb["gb_self"] + gb["gb_pair"] + e_vdw

    # MS pass with large-radii free volumes (second output of _ms_cavity)
    energy = energy + e_ms_large

    details = dict(e_vol1=e_vol1, e_vol2=e_vol2,
                   e_ms_vdw=e_ms_vdw, e_ms_large=e_ms_large,
                   gb_self=gb["gb_self"], gb_pair=gb["gb_pair"], e_vdw=e_vdw,
                   num_ms=ms["count"], self_volume=self_volume,
                   born_radius=br)
    if with_topology:
        topo = dict(atoms=topo_atoms,
                    ms=topo_ms,
                    ms_idx=ms["idx"], ms_count=ms["count"],
                    ms_nbr=nbr)
        return energy, (diag, mdiag), details, topo
    return energy, (diag, mdiag), details


class AGBNP2Model:
    """Prepared AGBNP2 system: jitted energy and autodiff forces."""

    def __init__(self, params_in: AGBNPParams, dtype=np.float32,
                 positions=None, cutoff=None, ms_boost: float = 1.6,
                 caps=None, caps_ms=None, cap_ms=None, ms_kmax=None,
                 ms_sub_k=None, pair_kernel: bool | None = None):
        from .agbnp_jax import prepare_arrays

        params = AGBNPParams(radius=params_in.radius, gamma=params_in.gamma,
                             alpha=params_in.alpha, charge=params_in.charge,
                             ishydrogen=params_in.ishydrogen,
                             roffset=AGBNP2_RADIUS_INCREMENT)
        self.params = params
        self.dtype = dtype
        self.cutoff = cutoff
        # shared-interface attributes Simulation reads off `self.agbnp`
        # regardless of version (ff_state's fuse test, force dispatch)
        self.version = 2
        # fused Pallas GB/vdW phases with the analytic reverse chain:
        # default ON for the TPU f32 deployment path at >= 1024 atoms; at
        # tiny N the dense XLA phases are trivial and the kernel-launch
        # overheads dominate (measured on trp-cage: the Pallas-routed v2
        # step was ~2.7x slower than round 3's XLA step).  f64/CPU keeps
        # the XLA + autodiff formulation.
        if pair_kernel is None:
            import jax as _jax
            pair_kernel = (_jax.default_backend() == "tpu"
                           and np.dtype(dtype) == np.float32
                           and params.n >= 1024)
        self.pair_kernel = bool(pair_kernel)
        self.pair_interpret = False
        if self.pair_kernel:
            import jax as _jax
            self.pair_interpret = _jax.default_backend() != "tpu"
        from ..ops.pallas.pairs import pad_to, pick_tile
        self.pair_pad = (pad_to(params.n, pick_tile(params.n))
                         if self.pair_kernel else 0)
        self.arrays = prepare_arrays(params, dtype=dtype,
                                     pair_pad=self.pair_pad,
                                     positions=positions)
        self.ntypes_j = int(np.max(np.asarray(self.arrays["type_j"])) + 1)
        heavy = np.asarray(params.ishydrogen) == 0
        g = np.asarray(params.gamma)[heavy]
        self.common_gamma = float(g[0]) if len(g) else 0.0

        if positions is None:
            raise ValueError("AGBNP2Model needs initial positions for sizing")
        pos = np.asarray(positions)
        if caps is not None:
            self.caps = caps
        else:
            try:
                from ..runtime.native import size_tree_caps
                self.caps = size_tree_caps(params, pos)
            except Exception as exc:
                import warnings
                warnings.warn(
                    "native tree-sizing pre-pass unavailable "
                    f"({type(exc).__name__}: {exc}); falling back to "
                    "heuristic TreeCaps", RuntimeWarning)
                self.caps = T.TreeCaps.for_natoms(params.n)

        # MS candidate pairs + capacity sizing (host pre-pass)
        rc = ms_pair_cutoff(params.radii_vdw)
        d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
        jj = np.arange(params.n)
        ok = ((jj[None, :] > jj[:, None]) & (d < rc)
              & heavy[:, None] & heavy[None, :])
        pi, pj = np.nonzero(ok)
        self.ms_pi = jnp.asarray(pi, jnp.int32)
        self.ms_pj = jnp.asarray(pj, jnp.int32)
        self.ms_pv = jnp.ones(len(pi), bool)
        self.cap_ms = (cap_ms if cap_ms is not None else
                       max(128, int(np.ceil(len(pi) * ms_boost / 128)) * 128))
        self.ms_kmax = ms_kmax if ms_kmax is not None else 64
        self.caps_ms = (caps_ms if caps_ms is not None else
                        T.TreeCaps.for_natoms(max(self.cap_ms // 8, 64)))

        # neighbor-bounded MS free-volume subtraction: size the per-MS
        # atom-list width from the candidate midpoints (a superset of the
        # surviving MS particles) at the static horizon, 1.5x headroom
        self.ms_sub_rcut = ms_subtraction_horizon(params.radii_vdw,
                                                  params.radii_large)
        if ms_sub_k is None:
            if len(pi):
                r1 = params.radii_vdw[pi]
                r2 = params.radii_vdw[pj]
                dvec = pos[pj] - pos[pi]
                dd = np.linalg.norm(dvec, axis=-1) + 1e-30
                fms = 0.5 * (1.0 + (r1 - r2) / dd)
                mpos = pos[pj] * fms[:, None] + pos[pi] * (1.0 - fms)[:, None]
                if params.n <= 4096:
                    ph = pos[heavy]
                    dm = np.linalg.norm(mpos[:, None, :] - ph[None, :, :],
                                        axis=-1)
                    seen = int((dm < self.ms_sub_rcut).sum(axis=1).max())
                else:
                    # chunked count above the dense-memory comfort zone
                    ph = pos[heavy]
                    seen = 0
                    for s in range(0, len(mpos), 2048):
                        dm = np.linalg.norm(
                            mpos[s:s + 2048, None, :] - ph[None, :, :],
                            axis=-1)
                        seen = max(seen,
                                   int((dm < self.ms_sub_rcut)
                                       .sum(axis=1).max()))
                ms_sub_k = min(int(np.ceil(seen * 1.5 / 16) * 16),
                               int(heavy.sum()))
                # the [cap_ms, k] neighbor-bounded subtraction replaces a
                # gather-free dense [cap_ms, N] broadcast with k-wide
                # row-serial gathers (cap_ms*k gather rows per call —
                # ~10 ns/row on this runtime, and the gather graphs also
                # multiply compile time: measured 2.7x step cost and a
                # ~20-min compile on trp-cage, round 5).  Dense costs
                # cap_ms*N elementwise at HBM bandwidth, so it wins until
                # the [cap_ms, N] buffers stop fitting comfortably; use
                # the bounded mode only past that memory crossover.
                if self.cap_ms * params.n <= (1 << 26):
                    ms_sub_k = 0
            else:
                ms_sub_k = 16
        self.ms_sub_k = int(ms_sub_k)

        self.pair_phases = (make_pair_cavity(self.cutoff, self.pair_pad,
                                             self.pair_interpret)
                            if self.pair_kernel else None)
        ef = partial(agbnp2_energy, caps=self.caps, caps_ms=self.caps_ms,
                     roffset=params.roffset, ntypes_j=self.ntypes_j,
                     cap_ms=self.cap_ms, ms_kmax=self.ms_kmax,
                     common_gamma=self.common_gamma, cutoff=self.cutoff,
                     ms_sub_k=self.ms_sub_k, ms_sub_rcut=self.ms_sub_rcut,
                     pair_phases=self.pair_phases)

        def e_only(a, q, mpi, mpj, mpv):
            return ef(a, q, ms_pi=mpi, ms_pj=mpj, ms_pv=mpv)[0]

        def ef_full(a, q, mpi, mpj, mpv):
            e, diags, details = ef(a, q, ms_pi=mpi, ms_pj=mpj, ms_pv=mpv)
            force = -jax.grad(e_only, argnums=1)(a, q, mpi, mpj, mpv)
            return dict(energy=e, force=force, diags=diags, details=details)

        self._jit = jax.jit(ef_full)

    def energy_forces(self, pos, with_details: bool = False):
        out = self._jit(self.arrays, jnp.asarray(pos, self.dtype),
                        self.ms_pi, self.ms_pj, self.ms_pv)
        if with_details:
            return out["energy"], out["force"], out
        return out["energy"], out["force"]
