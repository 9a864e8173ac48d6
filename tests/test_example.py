"""CI pin for the documented install test (examples/test_agbnp.py).

Runs the example's actual main() — not a re-implementation — with tiny step
counts, so a change to any runner signature or API it touches fails here
instead of rotting silently (the reference documents this script as THE
install check, reference README.md:69-78, example/test_agbnp.py).
"""

import importlib.util
import os
import sys

import pytest

pytestmark = pytest.mark.slow


def test_install_example_runs():
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "..", "examples", "test_agbnp.py")
    spec = importlib.util.spec_from_file_location("agbnp_install_example",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    os.environ["AGBNP_TEST_LANGEVIN_STEPS"] = "20"
    os.environ["AGBNP_TEST_VERLET_STEPS"] = "10"
    os.environ["AGBNP_TEST_MINIMIZE_ITERS"] = "5"
    # a drift RATE over 10 fs of an unequilibrated state is meaningless;
    # this test pins the code path (energy-drift physics is asserted at real
    # length in tests/test_constraints.py / test_md.py)
    os.environ["AGBNP_TEST_DRIFT_TOL"] = "1e9"
    try:
        rc = mod.main("trpcage_agbnp1")
    finally:
        for k in ("AGBNP_TEST_LANGEVIN_STEPS", "AGBNP_TEST_VERLET_STEPS",
                  "AGBNP_TEST_MINIMIZE_ITERS", "AGBNP_TEST_DRIFT_TOL"):
            os.environ.pop(k, None)
    assert rc == 0
