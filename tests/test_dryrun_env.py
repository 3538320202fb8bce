"""Driver-environment regression tests for ``dryrun_multichip``.

MULTICHIP_r03 (rc=124) and MULTICHIP_r04 (rc=1) were both environment-handling
failures, not sharding failures: the driver's child env *says*
``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count=8``, but the
axon sitecustomize on the driver's PYTHONPATH imports jax, registers the TPU
plugin, and overrides the pin before ``__graft_entry__`` ever runs — so any
in-process decision made from ``os.environ`` is a lie and ``jax.devices()``
returns 1 TPU, not 8 CPUs.

These tests reproduce that poisoning exactly (a sitecustomize that initializes
the jax host backend with a DIFFERENT device count than the env claims, then
restores the env) and assert the entry point still reaches n virtual devices —
i.e. it never trusts the parent's in-process state and always re-execs into a
scrubbed child.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A faithful mimic of the failure mode: by the time user code runs, the jax
# host backend is ALREADY initialized with 1 device, while os.environ claims
# cpu + 8 devices.  (The real axon sitecustomize does the analogous thing
# with the TPU plugin; we can't load that here, but the poisoned invariant —
# "env says ready, live backend says otherwise" — is identical.)
_POISON_SITECUSTOMIZE = """\
import os
_flags = os.environ.pop("XLA_FLAGS", "")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.devices()  # initialize the host backend with the DEFAULT 1 device
os.environ["XLA_FLAGS"] = _flags  # env now lies: says 8, backend has 1
os.environ["JAX_PLATFORMS"] = "cpu"
"""


def _driver_like_env(poison_dir: str) -> dict:
    env = dict(os.environ)
    env.pop("SDTPU_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # driver-style PYTHONPATH: sitecustomize dir first, repo importable
    env["PYTHONPATH"] = os.pathsep.join([poison_dir, REPO])
    # smoke mode: device/mesh proof only, no parity-segment compiles
    env["SDTPU_DRYRUN_SEGMENTS"] = "devices"
    return env


def test_dryrun_survives_poisoned_sitecustomize(tmp_path):
    """Simulates the exact MULTICHIP_r04 driver env: cpu env pin + a
    sitecustomize that pre-initializes the backend with the wrong device
    count.  The entry point must still end up with 8 virtual devices."""
    (tmp_path / "sitecustomize.py").write_text(_POISON_SITECUSTOMIZE)
    code = (
        "import jax, os, __graft_entry__ as g;"
        # prove the poisoning is live in THIS process before the call
        "assert len(jax.devices()) == 1, jax.devices();"
        "g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_like_env(str(tmp_path)),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "DEVICES-ONLY OK: 8 devices (cpu)" in proc.stdout, proc.stdout


def test_dryrun_clean_env_also_reexecs(tmp_path):
    """With a clean cpu env (no poisoning) the entry point must behave
    identically — a single deterministic path, no env-sniffing branch left
    to rot."""
    env = dict(os.environ)
    env.pop("SDTPU_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    env["SDTPU_DRYRUN_SEGMENTS"] = "devices"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "DEVICES-ONLY OK: 8 devices (cpu)" in proc.stdout, proc.stdout


def test_scrub_flag_removes_duplicates():
    import __graft_entry__ as g

    flags = (
        "--xla_force_host_platform_device_count=1 "
        "--xla_other=keep --xla_force_host_platform_device_count=4"
    )
    out = g._scrub_flag(flags, "xla_force_host_platform_device_count")
    assert "xla_force_host_platform_device_count" not in out
    assert "--xla_other=keep" in out


def test_budget_overrun_is_warning_not_failure():
    """A passing parity run must not be converted to rc!=0 by wall-clock
    alone (VERDICT r4 weak #2 / ADVICE r4).  Grep the source for the old
    assert shape so a reintroduction is caught without running the 3-min
    dryrun."""
    src = open(os.path.join(REPO, "__graft_entry__.py")).read()
    assert "assert elapsed <= budget" not in src
    assert "WARNING" in src and "soft budget" in src
