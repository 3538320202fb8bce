"""Golden-parity lane at XLA's DEFAULT optimization level.

The suite compiles everything at --xla_backend_optimization_level=0 for wall
time (tests/conftest.py), which means an optimization-level-dependent
miscompile or numerics drift in XLA's optimized lowering would pass CI while
real TPU runs compile at default opt (ADVICE r4).  This one test re-runs a
single frozen pipeline case in a subprocess WITHOUT the opt-level-0 flag and
compares against the same committed fixture.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                            "pipeline_golden.npz")

_CHILD = """\
import numpy as np
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from test_pipeline import TINY

pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
ids = np.array([[1, 5, 9, 2] + [0] * 12, [3, 4] + [0] * 14])
out = pipe.generate("x", token_ids=ids, num_inference_steps=3, seed=40,
                    output="float")
np.save({out_path!r}, np.asarray(out, np.float32))
"""


@pytest.mark.nobudget
def test_golden_case_at_default_opt(tmp_path):
    if not os.path.exists(FIXTURE_PATH):
        pytest.skip("fixture not generated — run tools/make_fixtures.py")
    out_path = str(tmp_path / "out.npy")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 8 virtual devices to match the fixture-producing environment, but NO
    # optimization_level flag: exercise XLA's default optimized lowering.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = os.pathsep.join([REPO, os.path.dirname(__file__)])
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(out_path=out_path)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    got = np.load(out_path)
    with np.load(FIXTURE_PATH) as z:
        want = z["txt2img_ddpm_cfg"]
    assert got.shape == want.shape
    # same tolerance as the opt-0 lane (test_fixture_regression.ATOL)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)
