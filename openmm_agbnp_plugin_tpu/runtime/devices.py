"""Device provisioning and accelerator probing shared by the entry points.

Two recurring needs, previously duplicated across bench.py,
__graft_entry__.py and examples/multichip_md.py:

* ``probe_accelerators``: the remote-TPU (axon tunnel) service has been
  observed to hang ``jax.devices()`` indefinitely when down, so any
  "is an accelerator alive?" check must run in a SUBPROCESS with a hard
  timeout.
* ``provision_virtual_cpu``: multi-chip code paths need >= n devices; on a
  single-chip (or zero-chip) host they fall back to a virtual CPU mesh via
  ``--xla_force_host_platform_device_count``, which must be injected before
  the first backend touch.
"""

from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["probe_accelerators", "provision_virtual_cpu"]


def probe_accelerators(timeout: float = 120.0,
                       compile_check: bool = False) -> int:
    """Count live non-CPU jax devices, probing in a subprocess so a hung
    backend cannot hang the caller.  With compile_check, the probe also
    compiles and runs a small matmul on the default device, so "alive"
    means "can execute", not just "enumerates".  Returns 0 on timeout or
    any probe failure.
    """
    body = "import jax; d = jax.devices(); "
    if compile_check:
        body += ("import jax.numpy as jnp; x = jnp.ones((128, 128)); "
                 "(x @ x).block_until_ready(); ")
    body += "print(sum(x.platform != 'cpu' for x in d))"
    try:
        r = subprocess.run([sys.executable, "-c", body], timeout=timeout,
                           capture_output=True, text=True)
        if r.returncode != 0:
            return 0
        return int(r.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        return 0


def provision_virtual_cpu(n_devices: int):
    """Make sure jax exposes >= n_devices devices, provisioning a virtual
    CPU mesh if the host has fewer real chips (the bench host has one TPU).

    XLA_FLAGS is read at backend initialization, and the container's
    sitecustomize imports jax at interpreter start, so both the env flag and
    jax.config must be set before the first jax.devices() touch; if a
    backend already got initialized with too few devices, reset it.
    Returns the jax module.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={n_devices}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n_devices:
        # a backend was initialized before the flags took hold — reset
        for reset in (getattr(jax, "clear_backends", None),
                      getattr(getattr(jax, "extend", None), "backend", None)):
            try:
                if callable(reset):
                    reset()
                elif reset is not None:
                    reset.clear_backends()
            except Exception:
                pass
            if len(jax.devices()) >= n_devices:
                break
    assert len(jax.devices()) >= n_devices, (
        f"could not provision {n_devices} devices "
        f"(have {len(jax.devices())}: {jax.devices()})")
    return jax
