"""Test configuration: force CPU backend with a virtual 8-device mesh.

The axon TPU tunnel registers itself regardless of JAX_PLATFORMS, so the
platform must be forced through jax.config before any backend is touched.
float64 is enabled session-wide: physics tests compare against CPU MuJoCo
at oracle precision (the production TPU path runs float32; dtype threading
is covered by dedicated f32 smoke tests).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# CPU tests exercise the XLA reference paths; the Pallas kernels are only
# checked by the dedicated (small-batch, interpret-mode) tests in
# test_pallas.py, which opt in explicitly.
os.environ.setdefault("DIAL_MPC_PALLAS", "0")
os.environ.setdefault("DIAL_MPC_ENGINE", "xla")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the unrolled physics pipelines are compile-heavy,
# and the cache cuts repeat test runs from minutes to seconds
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "dial_mpc_tpu", "models")


def load_mj(scene: str):
    import mujoco

    return mujoco.MjModel.from_xml_path(os.path.join(MODELS_DIR, scene))
