"""Test configuration.

Tests run on CPU with 8 virtual XLA host devices so multi-chip sharding logic
is exercised without TPU hardware (the TPU analogue of testing multi-node
without a cluster — SURVEY.md §4).  Environment must be set before the first
jax import, hence this happens at conftest import time.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the
# axon PJRT handshake costs ~85 s per process — tests must not pay that or
# occupy the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA:CPU optimization passes dominate suite wall time on this 1-core host
# (the cold suite is compile-bound: 75 min at default opt, NOTES_r4).  Opt
# level 0 compiles the same programs 1.7-4x faster and every golden/fixture
# tolerance still holds (measured: fixture_regression 108 s vs 186 s,
# unet_full_golden ~4x).  Opt out with SDTPU_TEST_XLA_OPT=default when
# chasing a suspected XLA-optimization bug.
if (
    os.environ.get("SDTPU_TEST_XLA_OPT", "0") == "0"
    and "xla_backend_optimization_level" not in os.environ["XLA_FLAGS"]
):
    os.environ["XLA_FLAGS"] += " --xla_backend_optimization_level=0"

import jax  # noqa: E402
from jax._src import xla_bridge  # noqa: E402

# The axon plugin registers itself (and imports jax) via sitecustomize before
# conftest runs, so the env var alone is too late — update the live config and
# deregister the axon factory so jax never initializes the tunnel.
jax.config.update("jax_platforms", "cpu")
xla_bridge._backend_factories.pop("axon", None)

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache for the CPU test suite: OPT-IN via
# SDTPU_TEST_CACHE=<dir>.  Off by default: XLA:CPU's executable.serialize()
# (the cache-write path) segfaulted deterministically ~340 tests into a
# cold full-suite run on this host (twice, incl. after wiping the cache;
# python faulthandler pointed at compilation_cache.put_executable_and_time)
# — and foreign-machine entries are a separate SIGILL hazard (CLAUDE.md).
# A cold suite run is slower but stable.
_cache_dir = os.environ.get("SDTPU_TEST_CACHE")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --- per-test CPU-time budget (VERDICT r3 item 6 / r4 item 4) ---------------
# Any non-slow-marked test whose call phase exceeds the budget fails the run
# at session end, so suite-time growth is caught when it happens rather than
# rediscovered as a 90-minute run.
#
# The budget meters CPU TIME (os.times user+sys, INCLUDING reaped subprocess
# children — the acceptance-rehearsal/opt-default lanes burn their CPU in
# children), not wall time: on this 1-core host 4 xdist workers contend, so a
# test's wall reading is ~4-10x its real cost depending on what happens to
# run beside it (round-5 audit: test_real_dims_tiny_sd read 355 s wall in the
# suite vs 21 s solo).  CPU time is scheduling-independent, so the budget is
# reproducible.  Override with SDTPU_TEST_TIME_BUDGET_S (0 disables).
_TIME_BUDGET_S = float(os.environ.get("SDTPU_TEST_TIME_BUDGET_S", "60"))
_over_budget = []
# Opt-in full CPU ranking (setup+call+teardown per test) written to this path
# at session end — the tool for finding where suite CPU actually goes, since
# the terminal's wall-clock "slowest durations" are contention noise here.
_CPU_REPORT = os.environ.get("SDTPU_TEST_CPU_REPORT")
_cpu_by_test = {}


def _cpu_now() -> float:
    t = os.times()
    return t.user + t.system + t.children_user + t.children_system


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_setup(item):
    start = _cpu_now()
    yield
    item._sdtpu_cpu_setup = _cpu_now() - start


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    start = _cpu_now()
    yield
    item._sdtpu_cpu_s = _cpu_now() - start


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_teardown(item):
    start = _cpu_now()
    yield
    item._sdtpu_cpu_teardown = _cpu_now() - start


def pytest_runtest_logreport(report):
    # Runs on the xdist CONTROLLER with a deserialized report: only standard
    # fields plus user_properties survive the wire, so the worker-side
    # makereport hook below stashes the CPU reading there.
    keywords = getattr(report, "keywords", {})
    cpu_s = None
    for name, value in getattr(report, "user_properties", ()):
        if name == "sdtpu_cpu_s" and value[0] == report.when:
            cpu_s = value[1]
    if cpu_s is not None and _CPU_REPORT:
        rec = _cpu_by_test.setdefault(report.nodeid, {})
        rec[report.when] = (cpu_s, report.duration)
    if (
        _TIME_BUDGET_S
        and report.when == "call"
        and cpu_s is not None
        and cpu_s > _TIME_BUDGET_S
        and "slow" not in keywords
        and "nobudget" not in keywords
    ):
        _over_budget.append((report.nodeid, cpu_s, report.duration))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    report = outcome.get_result()
    attr = {"setup": "_sdtpu_cpu_setup", "call": "_sdtpu_cpu_s",
            "teardown": "_sdtpu_cpu_teardown"}[call.when]
    cpu_s = getattr(item, attr, None)
    if cpu_s is not None:
        report.user_properties.append(
            ("sdtpu_cpu_s", (call.when, float(cpu_s))))


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if _over_budget:
        terminalreporter.write_sep(
            "=", f"tests over the {_TIME_BUDGET_S:.0f}s CPU-time budget"
        )
        for nodeid, cpu, wall in sorted(_over_budget, key=lambda t: -t[1]):
            terminalreporter.write_line(
                f"  {cpu:7.1f}s cpu ({wall:7.1f}s wall)  {nodeid}"
            )
        terminalreporter.write_line(
            "  (mark @pytest.mark.slow, split the test, or raise "
            "SDTPU_TEST_TIME_BUDGET_S)"
        )
    if _CPU_REPORT and _cpu_by_test:
        rows = []
        for nodeid, phases in _cpu_by_test.items():
            total_cpu = sum(c for c, _ in phases.values())
            total_wall = sum(w for _, w in phases.values())
            setup_cpu = phases.get("setup", (0.0, 0.0))[0]
            rows.append((total_cpu, setup_cpu, total_wall, nodeid))
        rows.sort(reverse=True)
        with open(_CPU_REPORT, "w") as f:
            f.write("total_cpu_s\tsetup_cpu_s\ttotal_wall_s\tnodeid\n")
            for total_cpu, setup_cpu, total_wall, nodeid in rows:
                f.write(f"{total_cpu:.1f}\t{setup_cpu:.1f}\t"
                        f"{total_wall:.1f}\t{nodeid}\n")
        terminalreporter.write_line(
            f"per-test CPU report ({len(rows)} tests, "
            f"{sum(r[0] for r in rows):.0f}s total cpu) -> {_CPU_REPORT}")


def pytest_sessionfinish(session, exitstatus):
    # Strict mode (default ON since round 5: the offenders are under the
    # honest CPU budget) fails the run on over-budget tests; opt out with
    # SDTPU_TEST_TIME_BUDGET_STRICT=0 when intentionally iterating on a
    # known-slow test.
    if (
        _over_budget
        and session.exitstatus == 0
        and os.environ.get("SDTPU_TEST_TIME_BUDGET_STRICT", "1") == "1"
    ):
        session.exitstatus = 1


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_pipe():
    """ONE shared tiny pipeline (TINY config, seed 0) for every test module
    that doesn't mutate it — jit programs compile once per suite run instead
    of once per module (the round-1 suite spent most of its 17 min
    recompiling identical tiny-pipeline buckets)."""
    from sdtpu.pipeline.pipeline import StableDiffusionPipeline

    from test_pipeline import TINY

    return StableDiffusionPipeline.from_random(TINY, seed=0)


def assert_allclose(actual, desired, *, rtol=1e-5, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(desired), rtol=rtol, atol=atol
    )


def assert_images_match(actual, desired, *, levels=1, atol=1e-4):
    """Cross-PROGRAM image parity: the same request rendered by two
    DIFFERENT compiled programs (batch-1 vs batch-N, engine vs direct,
    with-feature-at-identity vs without).  XLA:CPU retiles GEMMs per
    matrix shape, so per-row float results drift ~1e-6 between programs
    even when each row's math is identical on paper; with random test
    weights the drift amplifies through the denoise loop and can flip a
    uint8 pixel that happens to sit on a rounding boundary (this bit
    round 5 when the init VALUES changed: see NOTES_r5.md).  The on-chip
    batch-invariance gate uses the same >=1-level threshold
    (tools/check_batch_invariance.py).  A real cross-row contamination
    bug shows up as tens of levels on random weights, far above this.
    Exact equality remains the bar for SAME-program determinism tests."""
    a, d = np.asarray(actual), np.asarray(desired)
    assert a.shape == d.shape and a.dtype == d.dtype
    if a.dtype == np.uint8:
        diff = int(np.abs(a.astype(np.int16) - d.astype(np.int16)).max())
        assert diff <= levels, f"max level diff {diff} > {levels}"
    else:
        np.testing.assert_allclose(a, d, atol=atol, rtol=0)
