"""Multi-chip communication accounting for the sharded AGBNP1 step.

Counts the exact per-step collective volume of sharded_energy_forces (the
block-sharded tree passes + row-sharded pair phases) by recording every
TreeComm / pair-phase collective's operand size at trace time — shapes
under jit are static, so the count on the virtual 8-device CPU mesh equals
the count on real chips (VERDICT r4 item 9).

Wire-byte model per device (bidirectional ring over ICI, the standard XLA
collective cost model from the scaling literature):
    all_gather   (block in, full out): sends (ndev-1) x block_bytes
    psum_scatter (full in, block out): sends (ndev-1)/ndev x full_bytes
    psum         (full in, full out):  reduce_scatter + all_gather
                                       = 2 (ndev-1)/ndev x full_bytes

Outputs a per-kind table, the total wire bytes per evaluation, and the
bytes-vs-compute ratio against the measured single-chip step time.

Usage: python benchmarks/comm_accounting.py [system] [ndev]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ndev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
# the container's sitecustomize imports jax at interpreter start, so env
# vars are too late for platform selection — use jax.config (conftest.py
# does the same); XLA_FLAGS is still read at first CPU-client creation
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={ndev}"
                           ).strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from openmm_agbnp_plugin_tpu.io.dms import load_dms
from openmm_agbnp_plugin_tpu.md.simulation import Simulation
from openmm_agbnp_plugin_tpu.ops import tree as T
from openmm_agbnp_plugin_tpu.parallel.sharding import (
    atom_mesh,
    sharded_energy_forces,
)


def wire_bytes(entry):
    n, b = entry["ndev"], entry["bytes"]
    if entry["kind"] == "all_gather":
        return (n - 1) * b
    if entry["kind"] == "psum_scatter":
        return (n - 1) * b // n
    return 2 * (n - 1) * b // n  # psum


def main():
    system = sys.argv[1] if len(sys.argv) > 1 else "1li2_agbnp1"
    here = os.path.dirname(os.path.abspath(__file__))
    dms = load_dms(os.path.join(here, "data", f"{system}.dms"))
    sim = Simulation(dms, version=1, cutoff=1.0, dtype=np.float32,
                     include_mm=False, pair_kernel=False)
    mesh = atom_mesh(ndev)

    # pad the tree capacities to a device multiple (the runner does this
    # through TreeCaps alignment; cap alignment is already 128)
    a = {k: jnp.asarray(v) for k, v in sim.agbnp.arrays.items()}
    pos = jnp.asarray(sim.positions, np.float32)
    gdr = a["gamma"] / sim.agbnp.params.roffset
    pi, pj, pv, _ = sim.neighbor_fn(pos, sim.heavy_mask, sim.rcut_list,
                                    sim.kmax)
    lvl1 = T.make_level1(pos, a["radii_large"], a["vol_large"], gdr,
                         a["ishydrogen"])
    levels, _ = T.build_tree(lvl1, pi, pj, sim.agbnp.caps, pairs_valid=pv,
                             pair_rows=True)
    topo = T.tree_topology(levels)

    fn = sharded_energy_forces(mesh, sim.agbnp.arrays,
                               sim.agbnp.params.roffset, sim.agbnp.ntypes_j,
                               cutoff=1.0,
                               descreen_horizon=sim.agbnp.descreen_horizon)
    log = T.start_comm_log()
    jax.make_jaxpr(lambda q: fn(q, topo))(pos)
    log = T.stop_comm_log()

    n = sim.agbnp.params.n
    rows = sum(int(t["valid"].shape[0]) for t in topo)
    print(f"system={system} n={n} ndev={ndev} tree_rows={rows} "
          f"caps={sim.agbnp.caps.caps}")
    by_kind = {}
    for e in log:
        k = e["kind"]
        agg = by_kind.setdefault(k, dict(calls=0, op_bytes=0, wire=0))
        agg["calls"] += 1
        agg["op_bytes"] += e["bytes"]
        agg["wire"] += wire_bytes(e)
    total_wire = 0
    for k, agg in sorted(by_kind.items()):
        total_wire += agg["wire"]
        print(f"  {k:13s} calls={agg['calls']:4d} "
              f"operand={agg['op_bytes']/2**20:8.2f} MiB "
              f"wire/device={agg['wire']/2**20:8.2f} MiB")
    print(f"  TOTAL wire bytes per evaluation per device: "
          f"{total_wire/2**20:.2f} MiB")
    # context: measured single-chip per-step times (RESULTS.md round 3/4)
    step_ms = {"1li2_agbnp1": 3.0, "2clr_agbnp1": 19.0}.get(system)
    if step_ms:
        # v5e-class ICI ~ 4x45 GB/s/link usable; one axis of a ring uses
        # ~2 links concurrently -> take 90 GB/s as the per-device budget
        t_comm_ms = total_wire / 90e9 * 1e3
        print(f"  vs measured single-chip step {step_ms:.1f} ms: "
              f"ring time ~{t_comm_ms:.2f} ms at 90 GB/s "
              f"({t_comm_ms/step_ms*100:.0f}% of the step)")
    import json
    out = dict(system=system, n=n, ndev=ndev,
               by_kind={k: v for k, v in by_kind.items()},
               total_wire_bytes=int(total_wire))
    with open(os.path.join(here, "comm_accounting.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/comm_accounting.json")


if __name__ == "__main__":
    main()
