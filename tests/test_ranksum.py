"""Parity tests for the rank-space Pallas upward-reduction kernels
(ops/pallas/ranksum.py), run in Pallas interpret mode on CPU.

The kernels replace the XLA sorted-scatter segment-sums of the bottom-up
tree reduction (ops/tree.py::_upward_segment_sum); these tests pin their
semantics to jax.ops.segment_sum exactly (the bf16 3-split makes the MXU
products exact in f32, so parity is bitwise up to summation order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_agbnp_plugin_tpu.ops.tree as T
from openmm_agbnp_plugin_tpu.ops.pallas import ranksum


def _random_sorted_segments(rng, rows, parent_cap, empty_frac=0.3):
    """Monotone parent ids over `rows` slots with gaps (childless parents)
    and an invalid zero tail, mimicking _compact_rows output."""
    nvalid = int(rows * (1 - empty_frac))
    widths = rng.choice([1, 1, 2, 3, 5, 8], size=nvalid)
    seg_of_row = np.searchsorted(np.cumsum(widths), np.arange(nvalid),
                                 side="right")
    nseg = seg_of_row[-1] + 1
    gaps = rng.choice([1, 1, 2, 4], size=nseg)
    seg_pid = np.cumsum(gaps) - gaps[0]
    assert seg_pid[-1] < parent_cap
    pmono = np.full(rows, parent_cap - 1, np.int32)  # tail jump like
    pmono[:nvalid] = seg_pid[seg_of_row]             # _compact_rows' clip
    nonempty = np.zeros(parent_cap, bool)
    nonempty[seg_pid] = True
    return pmono, nonempty, nvalid


@pytest.mark.parametrize("rows,parent_cap,nch", [
    (1024, 640, 8),
    (4096, 4096, 8),
    (4096, 2560, 16),
])
def test_upward_sum_matches_segment_sum(rows, parent_cap, nch):
    rng = np.random.RandomState(rows + nch)
    pmono, nonempty, nvalid = _random_sorted_segments(rng, rows, parent_cap)
    x = rng.randn(rows, nch).astype(np.float32)
    x[nvalid:] = 0.0  # invalid tail carries zero data, like the tree levels

    info = jax.jit(ranksum.upward_info)(jnp.asarray(pmono),
                                        jnp.asarray(nonempty))
    kcap = -(-min(rows, parent_cap) // ranksum.G) * ranksum.G + ranksum.G
    assert ranksum.supports(kcap, nch)
    out = ranksum.upward_sum(jnp.asarray(x), info, parent_cap, kcap,
                             interpret=True)
    ref = jax.ops.segment_sum(jnp.asarray(x), jnp.asarray(pmono),
                              num_segments=parent_cap,
                              indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("rows,parent_cap,nch", [
    (1024, 640, 8),
    (4096, 2560, 32),
])
def test_rank_gather_matches_sorted_gather(rows, parent_cap, nch):
    rng = np.random.RandomState(rows + nch + 7)
    pmono, _, nvalid = _random_sorted_segments(rng, rows, parent_cap)
    src = rng.randn(parent_cap, nch).astype(np.float32)

    kcap = -(-min(rows, parent_cap) // ranksum.G) * ranksum.G + ranksum.G
    assert ranksum.supports_gather(kcap, nch)
    info = jax.jit(lambda p: ranksum.gather_info(p, kcap))(
        jnp.asarray(pmono))
    out = ranksum.rank_gather(jnp.asarray(src), info, rows, interpret=True)
    ref = src[pmono]
    # contract: valid prefix rows exact; tail rows are junk (masked by
    # validity downstream), like the sorted-gather path
    np.testing.assert_array_equal(np.asarray(out)[:nvalid], ref[:nvalid])
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("rows,natoms,nch", [(1500, 264, 8), (4096, 1310, 8)])
def test_atom_scatter_sum_matches_segment_sum(rows, natoms, nch):
    rng = np.random.RandomState(rows)
    atoms = rng.randint(0, natoms, size=rows).astype(np.int32)
    x = rng.randn(rows, nch).astype(np.float32)
    nvalid = int(rows * 0.8)
    x[nvalid:] = 0.0
    atoms[nvalid:] = 0
    out = ranksum.atom_scatter_sum(jnp.asarray(x), jnp.asarray(atoms),
                                   natoms, interpret=True)
    ref = jax.ops.segment_sum(jnp.asarray(x), jnp.asarray(atoms),
                              num_segments=natoms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_upward_sum_all_empty():
    """A level with zero valid rows: pmono pinned at the tail parent,
    nonempty all-False (the _compact_rows empty-level encoding)."""
    rows, parent_cap = 1024, 256
    pmono = np.full(rows, parent_cap - 1, np.int32)
    nonempty = np.zeros(parent_cap, bool)
    info = ranksum.upward_info(jnp.asarray(pmono), jnp.asarray(nonempty))
    x = jnp.zeros((rows, 8), jnp.float32)
    out = ranksum.upward_sum(x, info, parent_cap, 2 * ranksum.G,
                             interpret=True)
    assert not np.any(np.asarray(out))


@pytest.mark.slow
def test_tree_reduction_rank_path_parity(gaussvol_system):
    """End-to-end: build the 264-atom fixture's tree on the row path with
    rank info attached, reduce with the Pallas kernels (interpret mode),
    and compare energy/gradients/self-volumes against the scatter path."""
    from openmm_agbnp_plugin_tpu.ops.neighbors import (half_neighbor_pairs,
                                                       tree_pair_cutoff)

    params, pos = gaussvol_system
    n = params.n
    radii = np.asarray(params.radius) + 0.05
    vols = 4.0 / 3.0 * np.pi * radii ** 3
    gamma = np.full(n, 0.5)
    ish = np.asarray(params.ishydrogen)

    f32 = jnp.float32
    lvl1 = T.make_level1(jnp.asarray(pos, f32), jnp.asarray(radii, f32),
                         jnp.asarray(vols, f32), jnp.asarray(gamma, f32),
                         jnp.asarray(ish))
    rcut = tree_pair_cutoff(radii)
    pi, pj, pv, _ = half_neighbor_pairs(jnp.asarray(pos, f32),
                                        jnp.asarray(ish == 0), rcut, 64)
    caps = T.TreeCaps.for_natoms(n)

    results = {}
    old = T.RANKSUM_MODE
    try:
        for mode in ("off", "interpret"):
            T.RANKSUM_MODE = mode
            levels, diag = T.build_tree(lvl1, pi, pj, caps, pairs_valid=pv,
                                        pair_rows=True)
            if mode == "interpret":
                assert "rank" in levels[0]["bnd"]
                assert "nz_idx" in levels[0]["bnd"]["rank"]
            res = T.reduce_tree(levels, lvl1, with_selfvol=True)
            # fixed-topology passes exercise _parent_gather's rank path
            topo = T.tree_topology(levels)
            relvl = T.rescan_volumes(topo, lvl1)
            res["rescan"] = T.reduce_tree(relvl, lvl1)["energy"]
            glvl = T.rescan_gammas(relvl, lvl1)
            res["gamma"] = T.reduce_tree(glvl, lvl1,
                                         with_selfvol=False)["energy"]
            results[mode] = jax.tree_util.tree_map(np.asarray, res)
    finally:
        T.RANKSUM_MODE = old

    a, b = results["off"], results["interpret"]
    np.testing.assert_allclose(b["energy"], a["energy"], rtol=1e-6)
    np.testing.assert_allclose(b["rescan"], a["rescan"], rtol=1e-6)
    np.testing.assert_allclose(b["gamma"], a["gamma"], rtol=1e-6)
    np.testing.assert_allclose(b["dr"], a["dr"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b["self_volume"], a["self_volume"],
                               rtol=1e-5, atol=1e-6)
