"""Golden fixed-seed planner trajectories for all 7 task environments.

A silent change to the noise schedule, spline boundary handling, softmax
weighting, reward stacks, or physics that merely *degrades* plans (without
breaking finiteness) fails these comparisons. Snapshots live in
tests/golden/*.npz; regenerate deliberately with tests/golden/generate.py
(see its docstring) when arithmetic changes on purpose.
"""

import os

import numpy as np
import pytest

from golden_utils import GOLDEN_CASES, run_case


@pytest.fixture(autouse=True)
def _free_compiled_programs():
    """Release each case's compiled planner programs before the next.

    Seven planner programs in one process push the XLA:CPU client into
    fatal territory (observed: segfault inside the persistent-cache
    executable serializer under memory pressure). Recompiles are served
    by the persistent cache.
    """
    yield
    import jax

    jax.clear_caches()


GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.mark.parametrize("name", GOLDEN_CASES)
def test_golden_trajectory(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing snapshot {path}; run python tests/golden/generate.py {name}"
    )
    ref = np.load(path)
    out = run_case(name)
    # same platform + same compiled program => numerically identical; the
    # tolerance only absorbs compiler-version fusion differences
    np.testing.assert_allclose(out["Y"], ref["Y"], atol=1e-6, err_msg=name)
    np.testing.assert_allclose(out["reward"], ref["reward"], atol=1e-5, err_msg=name)
    np.testing.assert_allclose(out["qpos"], ref["qpos"], atol=1e-6, err_msg=name)
