"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The TPU compute path is validated on CPU here (float64 available, no TPU
needed in CI); multi-chip sharding tests use the 8 virtual devices.  Real-TPU
benchmarking lives in bench.py, not in the test suite.
"""

import os

# The container's sitecustomize imports jax at interpreter start (remote-TPU
# axon plugin), so env vars set here are too late; use jax.config directly.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Opt-in real-TPU lane: AGBNP_TPU_TESTS=1 leaves the platform alone so
# tests/test_tpu.py runs the golden anchors and kernel parity checks on the
# actual chip (f32 tolerances); everything else still runs (CPU fallback
# inside jax when no accelerator).  Default: forced CPU + x64.
TPU_LANE = os.environ.get("AGBNP_TPU_TESTS") == "1"
if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is dominated by XLA:CPU compiles
# of the big fused programs, which are identical run-to-run.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def fixture_dir():
    return os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def gaussvol_system(fixture_dir):
    """The 264-atom reference fixture as an AGBNPParams + positions."""
    from openmm_agbnp_plugin_tpu.io.gaussvol_dat import load_gaussvol_dat
    from openmm_agbnp_plugin_tpu.models.oracle import AGBNPParams

    pos, radius, charge, gamma, alpha, ish = load_gaussvol_dat(
        os.path.join(fixture_dir, "gaussvol.dat"))
    params = AGBNPParams(radius=radius, gamma=gamma, alpha=alpha,
                         charge=charge, ishydrogen=ish)
    return params, pos
