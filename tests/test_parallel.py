"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_agbnp_plugin_tpu.parallel.sharding import (
    atom_sharded_born_sums,
    replica_mesh,
)


@pytest.fixture(scope="module")
def tiny_sim(fixture_dir):
    import os

    from openmm_agbnp_plugin_tpu.io.dms import load_dms
    from openmm_agbnp_plugin_tpu.md.simulation import Simulation

    dms = load_dms(os.path.join(os.path.dirname(fixture_dir), "..",
                                "benchmarks", "data", "trpcage_agbnp1.dms"))
    return Simulation(dms, version=1, dtype=np.float64)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_atom_sharded_born_sums_psum():
    mesh = replica_mesh(8)
    rows, cols = 32, 48
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(size=(rows, cols)))
    s = jnp.asarray(rng.uniform(size=(cols,)))
    brw = jnp.asarray(rng.uniform(size=(rows,)))
    fn = atom_sharded_born_sums(mesh)
    row, col = fn(q, s, brw)
    np.testing.assert_allclose(np.asarray(row), np.asarray(q) @ np.asarray(s),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(col),
                               np.asarray(brw) @ np.asarray(q), rtol=1e-12)


def test_replica_ensemble_md(tiny_sim):
    """8 replicas sharded over 8 CPU devices; energies diverge per replica
    (independent noise) and stay finite."""
    from openmm_agbnp_plugin_tpu.parallel.ensemble import ReplicaEnsemble

    ens = ReplicaEnsemble(tiny_sim, n_replicas=8)
    run = ens.make_runner(dt=0.001)
    states = ens.initial_states(jitter=1e-4)
    states, energies = run(states, 3)
    energies = np.asarray(energies)
    assert energies.shape == (8, 3)
    assert np.isfinite(energies).all()
    # different PRNG streams -> trajectories diverge
    assert len(np.unique(energies[:, -1])) > 1
