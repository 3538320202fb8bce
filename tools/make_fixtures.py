"""Generate the frozen pipeline-output fixtures committed under
tests/fixtures/ (VERDICT round 1, item 1: refactors must not silently shift
numbers).

Run on CPU from the repo root after any INTENTIONAL numerics change:

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_fixtures.py

and commit the regenerated .npz together with the change that justified it.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402


def main() -> None:
    from test_fixture_regression import FIXTURE_PATH, generate_cases

    cases = generate_cases()
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    np.savez_compressed(FIXTURE_PATH, **cases)
    print(f"wrote {FIXTURE_PATH}:")
    for name, arr in cases.items():
        print(f"  {name}: {arr.shape} {arr.dtype}")


if __name__ == "__main__":
    main()
