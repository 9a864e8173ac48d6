"""Reference-parity tests of the public AGBNPForce/Context API surface."""

import numpy as np
import pytest

from openmm_agbnp_plugin_tpu import AGBNPForce, Context, NonbondedMethod


def _build_force(params, pos, version=1):
    force = AGBNPForce()
    force.setVersion(version)
    for i in range(params.n):
        force.addParticle(params.radius[i], params.gamma[i], params.alpha[i],
                          params.charge[i], bool(params.ishydrogen[i]))
    return force


def test_defaults():
    f = AGBNPForce()
    assert f.getVersion() == 1
    assert f.getNonbondedMethod() == NonbondedMethod.NoCutoff
    assert f.getCutoffDistance() == 1.0


def test_version_validation():
    f = AGBNPForce()
    with pytest.raises(ValueError):
        f.setVersion(3)
    f.setVersion(0)
    f.setVersion(2)


def test_common_gamma_validation():
    f = AGBNPForce()
    f.addParticle(0.16, 40.0, -60.0, 0.0, False)
    f.addParticle(0.16, 41.0, -60.0, 0.0, False)
    with pytest.raises(ValueError, match="multiple gamma"):
        f.to_params()
    # hydrogens may carry any gamma; it is zeroed
    f2 = AGBNPForce()
    f2.addParticle(0.16, 40.0, -60.0, 0.0, False)
    f2.addParticle(0.12, 99.0, -20.0, 0.0, True)
    p = f2.to_params()
    assert p.gamma[1] == 0.0


def test_particle_roundtrip():
    f = AGBNPForce()
    i = f.addParticle(0.165, 48.95, -73.4, 0.25, False)
    assert i == 0
    assert f.getNumParticles() == 1
    r, g, a, q, h = f.getParticleParameters(0)
    assert (r, g, a, q, h) == (0.165, 48.95, -73.4, 0.25, False)
    f.setParticleParameters(0, 0.17, 48.95, -70.0, 0.1, False)
    assert f.getParticleParameters(0)[0] == 0.17


def test_context_energy_golden(gaussvol_system):
    """End-to-end through the public API, float64: the v1 golden anchor."""
    params, pos = gaussvol_system
    force = _build_force(params, pos, version=1)
    ctx = Context(force, dtype=np.float64)
    ctx.setPositions(pos)
    e, f = ctx.getEnergyForces()
    assert float(e) == pytest.approx(-2476.66, abs=0.01)


def test_context_v2_oracle_backed(gaussvol_system):
    """Version 2 is served by the float64 AGBNP2 oracle (the reference marks
    AGBNP2 work-in-progress; see models/oracle_agbnp2.py)."""
    params, pos = gaussvol_system
    force = _build_force(params, pos, version=1)
    force.setVersion(2)
    ctx = Context(force)
    ctx.setPositions(pos[:48])  # small subset: the oracle is O(N^2 x MS)
    # rebuild force table for the subset
    f2 = AGBNPForce()
    f2.setVersion(2)
    for i in range(48):
        f2.addParticle(params.radius[i], params.gamma[i], params.alpha[i],
                       params.charge[i], bool(params.ishydrogen[i]))
    ctx = Context(f2)
    ctx.setPositions(pos[:48])
    e, f = ctx.getEnergyForces()
    assert np.isfinite(e)
    assert np.isfinite(np.asarray(f)).all()
