"""Batched conformer rescoring: score B conformations of one molecule in a
single vmapped evaluation, optionally sharded over a device mesh.

This is a TPU-native capability with no direct reference analogue — the
reference plugin (openmmapi/src/AGBNPForceImpl.cpp:32-36) evaluates one
conformation per Context call, so rescoring a pose ensemble costs B serial
GPU round trips.  Here the whole batch is one jit executable: the overlap
tree builds, Born-radius sweeps, and GB sums batch on the leading axis, and
with a replica mesh the batch is data-parallel across chips with no
collectives (embarrassingly parallel scoring, the docking/rescoring
workload AGBNP was built for).

Semantics per conformer are identical to api.force.Context.getEnergyForces:
the same energy_forces pipeline, the same PanicButton capacity-regrow loop
(worst case over the batch via batched_diag_max).
"""

from __future__ import annotations

import numpy as np

from .force import AGBNPForce, NonbondedMethod

_DETAIL_TERMS = ("e_cav", "e_vol1", "e_vol2", "gb_self", "gb_pair", "e_vdw")


class ConformerScorer:
    """Vectorized AGBNP scorer over conformations of a fixed particle table.

    Parameters
    ----------
    force: an AGBNPForce (version 0 or 1; NoCutoff or CutoffNonPeriodic).
    positions: representative coordinates [N, 3] or a batch [B, N, 3] used
        to size the overlap-tree capacities (the native sizing pre-pass runs
        on the largest-tree candidate); scoring positions may differ.
    mesh: optional jax.sharding.Mesh with one axis; the batch axis is
        sharded over it (batches are padded to a device multiple).
    dtype: compute dtype (float32 for TPU deployment, float64 for parity).
    """

    def __init__(self, force: AGBNPForce, positions, dtype=np.float32,
                 mesh=None, mixed: bool = False, caps=None,
                 caps_boost: float = 1.6):
        from ..models.agbnp_jax import AGBNPModel

        if force.getVersion() not in (0, 1):
            raise ValueError(
                "ConformerScorer supports versions 0 and 1 (AGBNP2's MS "
                "sizing is per-conformation; score those through Context)")
        if force.getNonbondedMethod() == NonbondedMethod.CutoffPeriodic:
            raise ValueError(
                "ConformerScorer is for gas-phase/implicit-solvent poses; "
                "CutoffPeriodic is not supported")
        if mesh is not None and len(mesh.axis_names) != 1:
            raise ValueError("mesh must have exactly one axis")
        pos = np.asarray(positions, dtype=np.float64)
        if pos.ndim == 3:
            pos = pos[0]
        cutoff = (None
                  if force.getNonbondedMethod() == NonbondedMethod.NoCutoff
                  else force.getCutoffDistance())
        self._model = AGBNPModel(force.to_params(),
                                 version=force.getVersion(), cutoff=cutoff,
                                 dtype=dtype, caps=caps,
                                 caps_boost=caps_boost, mixed=mixed,
                                 positions=pos, pair_kernel=False)
        self._mesh = mesh
        self._force = force

    @property
    def model(self):
        return self._model

    def updateParametersInContext(self, force: AGBNPForce | None = None):
        """Parameter-only refresh (AGBNPForce.cpp:76-78 semantics): swaps
        the jit-argument arrays; the compiled batch executable is reused
        when every static shape is unchanged."""
        self._model.update_params((force or self._force).to_params())

    def _shard(self, pos_batch):
        """Pad the batch to a device multiple and shard the leading axis."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = self._mesh.devices.size
        b = pos_batch.shape[0]
        pad = (-b) % ndev
        if pad:
            pos_batch = np.concatenate(
                [pos_batch, np.repeat(pos_batch[-1:], pad, axis=0)], axis=0)
        sharding = NamedSharding(self._mesh, P(self._mesh.axis_names[0]))
        return jax.device_put(pos_batch, sharding), b

    def refine(self, positions, maxiter: int = 200, **fire_kw):
        """FIRE-minimize every conformation (vmapped), then rescore.

        The batched analogue of the reference workflow's per-pose
        simulation.minimizeEnergy() (reference example/test_agbnp.py:49).
        Returns the score() dict plus "positions" [B, N, 3] (minimized) and
        "energy_trace" [B, maxiter].  Tree capacities regrow from the worst
        tree seen by ANY pose at ANY iteration (the minimizer tracks
        running diag maxima, md/minimize.py::make_fire_runner).
        """
        import jax

        from ..models.agbnp_jax import batched_diag_max
        from ..md.minimize import make_fire_runner

        pos = np.asarray(positions, dtype=np.float64)
        if pos.ndim == 2:
            pos = pos[None]
        if pos.ndim != 3 or pos.shape[1:] != (self._model.params.n, 3):
            raise ValueError(
                f"expected positions [B, {self._model.params.n}, 3], got "
                f"{pos.shape}")
        nb = pos.shape[0]
        if self._mesh is not None:
            pos, nb = self._shard(pos)

        for _ in range(8):
            m = self._model
            if m.pair_pad > 0:
                raise ValueError("refine requires the XLA pair path")
            key = (id(m.caps), maxiter, tuple(sorted(fire_kw.items())))
            if getattr(self, "_refine_key", None) != key:
                from functools import partial

                from ..models.agbnp_jax import energy_forces

                def run(arrays, pos0):
                    fn = partial(energy_forces, arrays, caps=m.caps,
                                 version=m.version, roffset=m.params.roffset,
                                 ntypes_j=m.ntypes_j, cutoff=m.cutoff,
                                 mixed=m.mixed,
                                 neighbor_rcut=m.neighbor_rcut,
                                 neighbor_kmax=m.neighbor_kmax,
                                 neighbor_grid=m.neighbor_grid, box=m.box,
                                 descreen_horizon=m.descreen_horizon)
                    return make_fire_runner(fn, maxiter=maxiter,
                                            **fire_kw)(pos0)

                self._refine_jit = jax.jit(jax.vmap(run, in_axes=(None, 0)))
                self._refine_key = key
            import jax.numpy as jnp

            pmin, etrace, diag = self._refine_jit(
                m.arrays, jnp.asarray(pos, m.dtype))
            if not m.check_and_grow(batched_diag_max(diag)):
                break
        else:
            raise RuntimeError("overlap tree capacities failed to converge")
        res = self.score(np.asarray(pmin)[:nb])
        res["positions"] = np.asarray(pmin)[:nb]
        res["energy_trace"] = np.asarray(etrace)[:nb]
        return res

    def score(self, positions, forces: bool = False, details: bool = False):
        """Score a batch of conformations.

        positions: [B, N, 3] (or [N, 3], treated as B=1).
        Returns a dict with "energy" [B] (kJ/mol), plus "force" [B, N, 3]
        when forces=True and per-term energies (e_cav, gb_self, gb_pair,
        e_vdw, ...) when details=True.
        """
        pos = np.asarray(positions, dtype=np.float64)
        if pos.ndim == 2:
            pos = pos[None]
        if pos.ndim != 3 or pos.shape[1:] != (self._model.params.n, 3):
            raise ValueError(
                f"expected positions [B, {self._model.params.n}, 3], got "
                f"{pos.shape}")
        from ..models.agbnp_jax import batched_diag_max

        nb = pos.shape[0]
        if self._mesh is not None:
            pos, nb = self._shard(pos)
        for _ in range(8):
            out = self._model.batched_energy_forces(pos)
            if not self._model.check_and_grow(batched_diag_max(out["diag"])):
                break
        else:
            raise RuntimeError("overlap tree capacities failed to converge")
        res = {"energy": np.asarray(out["energy"])[:nb]}
        if forces:
            res["force"] = np.asarray(out["force"])[:nb]
        if details:
            for k in _DETAIL_TERMS:
                if k in out["details"]:
                    res[k] = np.asarray(out["details"][k])[:nb]
        return res
