"""Headline benchmark: AGBNP1 MD ns/day on t4lysozyme (1li2), single chip.

Reference protocol: 10,000 Langevin steps at 1 fs / 300 K with wall-clock
timing (reference example/t4lysozyme_benchmark.py:21-34, system
1li2_agbnp1.dms, CutoffNonPeriodic 1 nm, OpenCL backend).  Here the same
system runs with the full AGBNP1 + OPLS force field fused under jit/lax.scan
on whatever jax.devices() provides (TPU if available).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
baseline constant below is the wall-clock-derived estimate for the
reference's OpenCL backend on a mid-2017 GPU for this 1310-atom system at
1 fs (~10k steps in ~170 s -> ~5 ns/day), consistent with the GaussVol GPU
paper's era (README.md:126).  It is an assumption, recorded here
explicitly, not a measured number — but it is now BRACKETED by a
measurement: the in-repo native C++ engine (the Reference-platform-class
CPU implementation, runtime/gaussvol_native.cpp) measures 0.49 ns/day on
1li2 on this host, so the 5 ns/day OpenCL estimate credits the 2017 GPU
backend with a generous ~10x over its own CPU platform; see BASELINE.md
"Quantitative baseline bracket".
"""

import json
import os
import sys
import time

BASELINE_NS_DAY = 5.0

# the reference protocol is 10,000 steps wall-clock
# (example/t4lysozyme_benchmark.py:22-31)
NSTEPS = int(os.environ.get("BENCH_STEPS", "10000"))
SYSTEM = os.environ.get("BENCH_SYSTEM", "1li2_agbnp1")
PROBE_TIMEOUT = float(os.environ.get("BENCH_PROBE_TIMEOUT", "900"))
# extra 10k-step metrics riding the same JSON line: trp-cage (the other
# named BASELINE metric) and the parity-anchored 2 nm LUT horizon run
EXTRA = os.environ.get("BENCH_EXTRA", "1") == "1"


def _accelerator_alive(timeout: float) -> bool:
    """True if a non-CPU device materializes AND compiles a trivial program
    within the bound (subprocess probe — a dead axon tunnel can hang
    jax.devices() indefinitely)."""
    from openmm_agbnp_plugin_tpu.runtime.devices import probe_accelerators

    return probe_accelerators(timeout, compile_check=True) > 0


def main():
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    note = None
    nsteps = NSTEPS
    if not _accelerator_alive(PROBE_TIMEOUT):
        # accelerator service down: fall back to CPU so the round still
        # records a (much slower, honestly labelled) number instead of
        # hanging the driver
        note = "accelerator unavailable; CPU fallback, not a TPU number"
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        nsteps = min(nsteps, 50)

    import jax

    if note is not None:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from openmm_agbnp_plugin_tpu.io.dms import load_dms
    from openmm_agbnp_plugin_tpu.md.simulation import Simulation

    here = os.path.dirname(os.path.abspath(__file__))
    platform = jax.devices()[0].platform
    dtype = np.float32 if platform != "cpu" else np.float64

    # CutoffNonPeriodic 1 nm: the reference benchmark configuration for this
    # system (example/t4lysozyme_benchmark.py:14-16).  In cutoff mode the
    # reference's OpenCL backend truncates its Born/descreening sweeps at
    # the cutoff too (r2 < CUTOFF_SQUARED over the cutoff neighbor list,
    # OpenCLAGBNPKernels.cpp:2258 / AGBNPBornRadii.cl:268), so matching
    # that is the apples-to-apples configuration; set
    # BENCH_DESCREEN_HORIZON=lut for the Reference-platform 2 nm horizon.
    dh = os.environ.get("BENCH_DESCREEN_HORIZON", "cutoff")
    dh = None if dh == "lut" else ("cutoff" if dh == "cutoff" else float(dh))

    accounting = {}

    def measure(key, name, horizon, wu_every: int = 1):
        """One reference-protocol run; the overflow/regrow state of the
        run the number came from is recorded per metric (a number from an
        overflowed run must never look clean in a round artifact — the
        reference's PanicButton contract is overflow => forces invalid =>
        retry, OpenCLAGBNPKernels.cpp:3598-3634)."""
        d = load_dms(os.path.join(here, "benchmarks", "data", f"{name}.dms"))
        sim = Simulation(d, version=1, cutoff=1.0, dtype=dtype, skin=0.25,
                         descreen_horizon=horizon)
        r = sim.benchmark_langevin(nsteps=nsteps, dt=0.001,
                                   temperature=300.0, friction=1.0,
                                   neighbor_every=40, wu_every=wu_every)
        accounting[key] = {"overflow": bool(r["overflow"]),
                           "regrows": int(r.get("regrows", 0))}
        if r["overflow"]:
            return None  # tainted: retries exhausted; never report ns/day
        return round(r["ns_day"], 3)

    # headline: the WU gamma-rescan force pass as an r-RESPA impulse every
    # 4 steps — validated at the 10k-step protocol length being timed
    # (benchmarks/mts_validation.json: Langevin ensemble statistics match
    # the exact integrator to 0.03 K / <=0.4% PE on 1li2 and trp-cage;
    # in strict NVE the impulse heats 1li2 at ~9e3 kJ/mol/ns — absorbed by
    # the protocol's 1/ps thermostat; NVE-grade work should use the strict
    # wu_every=1 extra metric; benchmarks/RESULTS.md round 4).  The
    # protocol-matched baseline comparison (vs_baseline) uses the STRICT
    # full-force-every-step run, the reference's own integrator protocol;
    # the mts_wu4 ratio rides separately as vs_baseline_mts_wu4.
    sysname = SYSTEM.split('_')[0]
    headline_key = f"ns_day_{sysname}_agbnp1_mts_wu4"
    headline = measure(headline_key, SYSTEM, dh, wu_every=4)
    strict = measure(f"ns_day_{sysname}_agbnp1_strict", SYSTEM, dh)
    out = {
        "metric": headline_key,
        "value": headline,
        "unit": "ns/day",
        "vs_baseline": round((strict if strict is not None else headline)
                             / BASELINE_NS_DAY, 3),
        "vs_baseline_mts_wu4": round(headline / BASELINE_NS_DAY, 3),
        "protocol": (f"{nsteps} Langevin steps @ 1 fs / 300 K, "
                     "CutoffNonPeriodic 1 nm, wall-clock "
                     "(reference example/t4lysozyme_benchmark.py:22-31); "
                     "WU force pass as r-RESPA impulse — validated for "
                     "thermostatted protocols, strict-NVE work should use "
                     "the wu_every=1 extra metric "
                     "(benchmarks/mts_validation.json); vs_baseline is the "
                     "protocol-matched strict run"),
    }
    if EXTRA and note is None:
        # the strict-semantics run + the other named BASELINE metric + the
        # parity-anchored horizon, same 10k-step protocol, one JSON line
        extra = {}
        if strict is not None:
            extra[f"ns_day_{sysname}_agbnp1_strict"] = strict
        try:
            v = measure("ns_day_trpcage_agbnp1", "trpcage_agbnp1", dh)
            if v is not None:
                extra["ns_day_trpcage_agbnp1"] = v
            v = measure(f"ns_day_{sysname}_agbnp1_lut_horizon", SYSTEM, None)
            if v is not None:
                extra[f"ns_day_{sysname}_agbnp1_lut_horizon"] = v
            # the production-throughput configuration beyond the reference
            # protocol: 4 fs r-RESPA outer / 2 fs bonded + SHAKE/RATTLE
            # X-H constraints, validated at protocol length for the
            # thermostatted ensemble (benchmarks/validate_mts4.py ->
            # mts_validation.json "<system>_mts4": T within 0.6 K of the
            # 1 fs exact run, PE shift == the analytic 0.5 kT x n_con
            # rigid-bond removal, NVE drift ~2.3x the 1 fs f32 noise
            # floor — NVE-grade work should use 1 fs)
            d4 = load_dms(os.path.join(here, "benchmarks", "data",
                                       f"{SYSTEM}.dms"))
            sim4 = Simulation(d4, version=1, cutoff=1.0, dtype=dtype,
                              skin=0.25, descreen_horizon=dh,
                              constraints=True)
            r4 = sim4.benchmark_langevin(nsteps=max(1, nsteps // 4),
                                         dt=0.004, temperature=300.0,
                                         friction=1.0, neighbor_every=10,
                                         mts_inner=2)
            accounting[f"ns_day_{sysname}_mts4fs_constraints"] = {
                "overflow": bool(r4["overflow"]),
                "regrows": int(r4.get("regrows", 0))}
            if not r4["overflow"]:
                extra[f"ns_day_{sysname}_mts4fs_constraints"] = round(
                    r4["ns_day"], 3)
            # large-system MD (the OpenCL backend's raison d'etre —
            # scaling): 10,240-atom synthetic protein through the
            # segmented run_md loop; step count bounded so the whole
            # bench stays driver-friendly (the >=1k-step validation run
            # lives in benchmarks/RESULTS.md)
            synth_steps = int(os.environ.get("BENCH_SYNTH_STEPS", "400"))
            if synth_steps > 0:
                from benchmarks.synthetic_scale import run_md as synth_md
                r = synth_md(10240, nsteps=synth_steps)
                accounting["ns_day_synth10k"] = {
                    "overflow": bool(r["overflow"]),
                    "regrows": int(r.get("regrows", 0)),
                    "windows": int(r.get("windows", 0))}
                if not r["overflow"]:
                    extra["ns_day_synth10k"] = round(r["ns_day"], 3)
        except Exception as exc:  # extras must never kill the headline
            extra["error"] = f"{type(exc).__name__}: {exc}"
        out["extra_metrics"] = extra
    out["overflow_accounting"] = accounting
    if note is not None:
        out["note"] = note
    print(json.dumps(out))


if __name__ == "__main__":
    main()
