"""First-network-day rehearsal: drive tools/acceptance.py end to end
against a synthetic diffusers checkpoint so the runbook cannot rot
(VERDICT.md round-4 item 7).

The acceptance tool is the single documented entry point for the
real-weights PSNR >= 40 dB north star (SURVEY.md §6 / BASELINE.md).  It was
smoke-run by hand in round 4; this test makes the drill part of the default
suite: synthetic checkpoint dir in, every step must report PASS or SKIP
exactly as designed offline — any FAIL (including harness crashes, which
the tool records as FAIL) breaks the build.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Steps that MUST pass against a local synthetic checkpoint (no network):
_MUST_PASS = {"checkpoint", "component-parity", "clip-parity",
              "int8-fidelity", "encoder-cache-quality", "guidance-features"}
# Steps that legitimately SKIP offline / without optional assets:
_MAY_SKIP = {"tokenizer-assets", "real-vocab-tests", "e2e-psnr", "lora-ti"}


@pytest.mark.nobudget
def test_acceptance_runbook_on_synthetic_checkpoint(tmp_path):
    from test_config_infer_e2e import build_inferred_ckpt

    ckpt = build_inferred_ckpt(tmp_path / "someones-finetune-v3")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    # keep the drill cheap: tiny dims come from the checkpoint configs, and
    # opt level 0 matches the suite default for CPU lanes
    env["XLA_FLAGS"] = (
        env.get("SDTPU_TEST_XLA_FLAGS", "")
        or "--xla_backend_optimization_level=0"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "acceptance.py"),
         "--model-dir", str(ckpt), "--steps", "2"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    assert proc.returncode == 0, f"acceptance.py rc={proc.returncode}\n{tail}"

    summary = None
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            summary = json.loads(line)
            break
    assert summary is not None, f"no JSON summary line\n{tail}"
    assert summary["status"] in ("PASS", "partial"), summary

    by_step = {r["step"]: r["status"] for r in summary["steps"]}
    fails = {k: v for k, v in by_step.items() if v == "FAIL"}
    assert not fails, f"acceptance steps FAILed: {fails}\n{tail}"
    missing = _MUST_PASS - {k for k, v in by_step.items() if v == "PASS"}
    assert not missing, (
        f"steps expected to PASS offline did not: {missing}; got {by_step}"
    )
    unknown = set(by_step) - _MUST_PASS - _MAY_SKIP
    assert not unknown, f"unexpected steps (update the rehearsal): {unknown}"
