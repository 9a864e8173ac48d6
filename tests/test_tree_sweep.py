"""Parity tests for the banded Pallas tree-sweep backend
(ops/pallas/tree_sweep.py) against the XLA tree ops, in float64 interpret
mode on the 264-atom reference fixture.

The sweep must reproduce rescan_volumes2 / reduce_tree2 / the gamma-rescan
W/U pass to reduction-order roundoff, and the MD step must be bit-identical
through the Simulation layer (tree_kernel=True vs False).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def built(gaussvol_system):
    import jax.numpy as jnp

    from openmm_agbnp_plugin_tpu.models.agbnp_jax import prepare_arrays
    from openmm_agbnp_plugin_tpu.ops import tree as T
    from openmm_agbnp_plugin_tpu.ops.pallas import tree_sweep as TS

    params, pos = gaussvol_system
    a = prepare_arrays(params, dtype=np.float64)
    caps = TS.align_caps(T.TreeCaps.for_natoms(params.n))
    pos = jnp.asarray(pos, np.float64)
    gdr = a["gamma"] / params.roffset
    lvl1_large = T.make_level1(pos, a["radii_large"], a["vol_large"], gdr,
                               a["ishydrogen"])
    lvl1_vdw = T.make_level1(pos, a["radii_vdw"], a["vol_vdw"], -gdr,
                             a["ishydrogen"])
    levels, _ = T.build_tree(lvl1_large, a["pairs_i"], a["pairs_j"], caps,
                             pairs_valid=a["pairs_valid"])
    topo = T.tree_topology(levels)

    npad = TS.pad_rows(params.n)
    parent_caps = [npad] + [l["valid"].shape[0] for l in topo[:-1]]
    spans = np.asarray(TS.level_spans(topo, parent_caps))
    windows = TS.size_windows(spans, parent_caps)
    assert TS.windows_ok(spans, windows)
    at6 = TS.atom_statics(a, params.roffset, npad, np.float64)
    sweep = TS.sweep_statics(topo, at6, windows, npad)
    return dict(params=params, a=a, topo=topo, sweep=sweep, windows=windows,
                npad=npad, lvl1_large=lvl1_large, lvl1_vdw=lvl1_vdw)


def test_rescan_reduce_parity(built):
    import jax.numpy as jnp

    from openmm_agbnp_plugin_tpu.ops import tree as T
    from openmm_agbnp_plugin_tpu.ops.pallas import tree_sweep as TS

    b = built
    la, lb = T.rescan_volumes2(b["topo"], b["lvl1_large"], b["lvl1_vdw"])
    r1, r2 = T.reduce_tree2(la, lb, b["lvl1_large"], b["lvl1_vdw"])

    dats = TS.rescan2_sweep(b["sweep"], b["lvl1_large"], b["lvl1_vdw"],
                            b["windows"], b["npad"], interpret=True)
    for dat2, lv_a, lv_b in zip(dats, la, lb):
        ref = jnp.concatenate([lv_a["_dat"], lv_b["_dat"]], axis=1)
        v = np.asarray(lv_a["valid"])[:, None]
        assert (np.abs(np.asarray(dat2) - np.asarray(ref)) * v).max() < 1e-12

    p1, p2 = TS.reduce2_sweep(dats, b["sweep"], b["lvl1_large"],
                              b["lvl1_vdw"], b["windows"], b["npad"],
                              interpret=True)
    assert abs(float(p1["energy"]) - float(r1["energy"])) < 1e-9
    assert abs(float(p2["energy"]) - float(r2["energy"])) < 1e-9
    assert np.abs(np.asarray(p1["dr"]) - np.asarray(r1["dr"])).max() < 1e-10
    assert np.abs(np.asarray(p2["dr"]) - np.asarray(r2["dr"])).max() < 1e-10
    assert np.abs(np.asarray(p2["self_volume"])
                  - np.asarray(r2["self_volume"])).max() < 1e-12


def test_wu_pass_parity(built):
    import jax.numpy as jnp

    from openmm_agbnp_plugin_tpu.ops import tree as T
    from openmm_agbnp_plugin_tpu.ops.pallas import tree_sweep as TS

    b = built
    n = b["params"].n
    rng = np.random.default_rng(0)
    gamma_wu = jnp.asarray(rng.uniform(-1.0, 1.0, n))

    _, lb = T.rescan_volumes2(b["topo"], b["lvl1_large"], b["lvl1_vdw"])
    lvl1_wu = {**b["lvl1_vdw"], "gamma1i": gamma_wu}
    ref = T.reduce_tree(T.rescan_gammas(lb, lvl1_wu), lvl1_wu,
                        with_selfvol=False)

    dats = TS.rescan2_sweep(b["sweep"], b["lvl1_large"], b["lvl1_vdw"],
                            b["windows"], b["npad"], interpret=True)
    pal = TS.wu_sweep(dats, b["sweep"], gamma_wu, b["windows"], b["npad"], n,
                      interpret=True)
    assert np.abs(np.asarray(pal["dr"]) - np.asarray(ref["dr"])).max() < 1e-10


def test_md_step_parity():
    """Simulation with tree_kernel on vs off: bit-identical f64 trajectories."""
    import os

    from openmm_agbnp_plugin_tpu.io.dms import load_dms
    from openmm_agbnp_plugin_tpu.md.simulation import Simulation

    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "data")
    dms = load_dms(os.path.join(data, "trpcage_agbnp1.dms"))
    res = {}
    for tk in (False, True):
        sim = Simulation(dms, version=1, dtype=np.float64, skin=0.25,
                         tree_kernel=tk, pair_kernel=False)
        if tk:
            assert sim.agbnp.tree_kernel and sim.agbnp.tree_windows
        res[tk] = sim.benchmark_langevin(nsteps=2, dt=0.001,
                                         neighbor_every=2, warmup=False)
    assert np.array_equal(res[True]["energies"], res[False]["energies"])
    assert np.array_equal(np.asarray(res[True]["final_pos"]),
                          np.asarray(res[False]["final_pos"]))
    assert not res[True]["overflow"]
