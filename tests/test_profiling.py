"""Observability utilities (SURVEY.md §5 tracing/sanitizer rows)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.utils.profiling import StageTimer, checked, stage


class TestStageTimer:
    def test_accumulates(self):
        timer = StageTimer()
        with timer.time("a"):
            _ = 1 + 1
        with timer.time("a"):
            _ = 2 + 2
        with timer.time("b"):
            pass
        assert timer.counts["a"] == 2
        assert timer.counts["b"] == 1
        report = timer.report()
        assert "a" in report and "b" in report

    def test_syncs_result(self):
        timer = StageTimer()
        out = jnp.ones((4,)) * 2
        with timer.time("compute", result_holder=[out]):
            pass
        assert timer.totals["compute"] >= 0


class TestNamedScope:
    def test_usable_under_jit(self):
        def f(x):
            with stage("double"):
                return x * 2

        out = jax.jit(f)(jnp.ones(3))
        np.testing.assert_array_equal(np.asarray(out), [2, 2, 2])


class TestCheckify:
    def test_detects_nan(self):
        def f(x):
            return jnp.log(x)  # nan for negative input

        err, out = checked(f)(jnp.array([-1.0]))
        assert err.get() is not None  # error recorded

    def test_clean_run_no_error(self):
        def f(x):
            return x * 2

        err, out = checked(f)(jnp.ones(3))
        assert err.get() is None
        np.testing.assert_array_equal(np.asarray(out), [2, 2, 2])
