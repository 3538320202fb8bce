"""Multi-host (DCN) initialization helpers (SURVEY.md §5 "failure detection"
and §2.1 distributed rows — the reference is single-process with no comm
backend at all).

Single-host single-chip deployments (this environment) never need these; a
multi-host pod slice calls :func:`initialize` once per process before any
jax usage, then builds a global (dp, tp) mesh with :func:`global_mesh` —
data parallelism rides DCN across hosts, tensor parallelism stays on ICI
within a host, matching the BASELINE scale-out design.

Failure model: JAX multi-host programs are SPMD with a coordinator; a lost
process fails the collective and surfaces as a distinct error on every peer.
Recovery = re-`initialize` + reload params (deterministic RNG keys make any
generation replayable bit-for-bit, the functional substitute for
mid-generation checkpointing).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Wire this process into a multi-host JAX cluster.  No-op when the
    environment provides the cluster config (GKE/TPU-VM auto-detection) and
    for single-process runs."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def health_check(mesh: Optional[Mesh] = None) -> dict:
    """Heartbeat over the device fleet (SURVEY.md §5 failure-detection row):
    per-device round trips plus one all-device collective, so a wedged chip
    or broken ICI path surfaces as a structured report instead of a hang
    deep inside a generation.

    Returns {"ok", "devices": n, "device_errors": {idx: msg},
    "collective_ok"}.  Cheap enough to run between serving batches.
    """
    import jax.numpy as jnp

    devices = list(mesh.devices.ravel()) if mesh is not None else jax.devices()
    report = {"devices": len(devices), "device_errors": {}, "collective_ok": False}
    for i, d in enumerate(devices):
        try:
            x = jax.device_put(jnp.float32(i), d)
            if float(x) != float(i):
                report["device_errors"][i] = "round-trip value mismatch"
        except Exception as exc:  # surface, don't raise — this IS the probe
            report["device_errors"][i] = repr(exc)
    try:
        hb = Mesh(np.asarray(devices), ("hb",))
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        ones = jnp.ones((len(devices),), jnp.float32)
        total = shard_map(
            lambda x: jax.lax.psum(x, "hb"),
            mesh=hb, in_specs=P("hb"), out_specs=P("hb"),
        )(ones)
        report["collective_ok"] = float(np.asarray(total)[0]) == len(devices)
    except Exception as exc:
        report["collective_error"] = repr(exc)
    report["ok"] = not report["device_errors"] and report["collective_ok"]
    return report


def global_mesh(dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """A (dp, tp) mesh over ALL devices in the cluster.  tp should divide the
    per-host device count so tensor-parallel collectives stay on ICI; dp
    spans hosts over DCN.  Defaults to dp = total_devices // tp."""
    devices = jax.devices()
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    dp = dp or n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    local = jax.local_device_count()
    if tp > local:
        raise ValueError(
            f"tp={tp} exceeds local device count {local}; tensor-parallel "
            "collectives must stay on ICI (within one host)"
        )
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
