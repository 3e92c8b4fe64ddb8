"""Regenerate the golden planner-trajectory snapshots.

Run after any INTENTIONAL change to planner arithmetic, noise schedule,
spline boundary handling, reward stacks, or physics:

    cd /root/repo && python tests/golden/generate.py [case ...]

then review the diff (rewards should stay in the same ballpark) and commit
the updated .npz files together with the change that motivated them.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("DIAL_MPC_PALLAS", "0")
os.environ.setdefault("DIAL_MPC_ENGINE", "xla")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")),
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from golden_utils import GOLDEN_CASES, run_case

if __name__ == "__main__":
    cases = sys.argv[1:] or GOLDEN_CASES
    outdir = os.path.dirname(os.path.abspath(__file__))
    for name in cases:
        print(f"generating {name} ...", flush=True)
        trace = run_case(name)
        np.savez(os.path.join(outdir, f"{name}.npz"), **trace)
        print(
            f"  rewards = {np.round(trace['reward'], 4).tolist()}",
            flush=True,
        )
