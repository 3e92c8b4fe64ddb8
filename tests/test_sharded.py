"""Sharded planner: mesh-shape invariance and reduction correctness.

Runs on the virtual 8-device CPU mesh from conftest's
--xla_force_host_platform_device_count=8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dial_mpc_tpu.envs as dial_envs
from dial_mpc_tpu.core.dial_config import DialConfig
from dial_mpc_tpu.parallel import ShardedMBDPI, make_sample_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = DialConfig(
        env_name="unitree_go2_walk",
        Nsample=16,
        Hsample=16,
        Hnode=4,
        Ndiffuse=2,
    )
    env_cfg_cls = dial_envs.get_config(cfg.env_name)
    env = dial_envs.get_environment(cfg.env_name, env_cfg_cls(kd=0.0))
    return cfg, env


def _run(cfg, env, n_devices, n_levels=2):
    mesh = make_sample_mesh(jax.devices()[:n_devices])
    planner = ShardedMBDPI(cfg, env, mesh)
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    Y = jnp.zeros((cfg.Hnode + 1, planner.nu))
    state, Y, rng, info = planner.control_step(state, Y, rng, n_levels)
    return np.asarray(Y), {k: np.asarray(v) for k, v in info.items()}


def test_mesh_shape_invariance(setup):
    """Same seed => same plan on 1, 2 and 8 devices.

    The per-sample RNG layout is mesh-invariant by construction; the only
    residual is f32 reduction-order noise in the psum reductions (different
    summation trees on different mesh shapes), so tolerances are ~1e-4.
    """
    cfg, env = setup
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    Y1, info1 = _run(cfg, env, 1)
    Y2, info2 = _run(cfg, env, 2)
    Y8, info8 = _run(cfg, env, 8)
    np.testing.assert_allclose(Y1, Y8, atol=1e-4)
    np.testing.assert_allclose(Y2, Y8, atol=1e-4)
    np.testing.assert_allclose(info1["xbar"], info8["xbar"], atol=1e-3)


def test_sharded_pallas_kernel_matches_xla(setup, monkeypatch):
    """Pallas mega-kernel dispatched INSIDE shard_map — the composition a
    real pod executes (`ShardedMBDPI._reverse_once_local` on a v5e-16
    dispatches the kernel per shard). Interpret mode, tiny lane layout;
    pinned against the XLA-engine sharded result and for mesh invariance
    under the kernel path.

    Engine choice is baked at trace time, so each run builds a fresh
    planner (fresh jit caches) and clears the kernel core cache.
    """
    from dial_mpc_tpu.physics import engine_pallas, solver

    _, env = setup
    # short horizon: the composition under certification (kernel dispatch
    # inside shard_map) is horizon-independent, and each engine variant
    # costs a full interpret-mode planner compile — Hsample=4 keeps the
    # three compiles affordable on the CPU test runner
    cfg = DialConfig(
        env_name="unitree_go2_walk",
        Nsample=16,
        Hsample=4,
        Hnode=2,
        Ndiffuse=1,
    )
    # tiny 2-D lane layout: per-shard batch is local+1 = 3 rows at 8
    # devices; (S=1, W=4) pads 3 -> 4 instead of a full 1-D block
    monkeypatch.setenv("DIAL_MPC_LANES2D", "1")
    monkeypatch.setenv("DIAL_MPC_LANE_W", "4")

    def run(engine, n_devices):
        monkeypatch.setenv("DIAL_MPC_ENGINE", engine)
        monkeypatch.setenv("DIAL_MPC_PALLAS", "1" if engine == "pallas" else "0")
        engine_pallas._CORE_CACHE.clear()
        solver._CORE_CACHE.clear()
        try:
            return _run(cfg, env, n_devices, n_levels=1)
        finally:
            engine_pallas._CORE_CACHE.clear()
            solver._CORE_CACHE.clear()
            # each engine variant is a full planner program; keeping three
            # of them live has aborted the XLA:CPU runner on RSS growth
            jax.clear_caches()

    Y_pallas, info_pallas = run("pallas", 8)
    Y_pallas1, _ = run("pallas", 1)
    Y_xla, info_xla = run("xla", 8)

    assert np.all(np.isfinite(Y_pallas))
    # kernel-vs-XLA parity through 17 rollout steps + softmax weighting
    np.testing.assert_allclose(Y_pallas, Y_xla, atol=1e-5)
    np.testing.assert_allclose(
        info_pallas["rews"], info_xla["rews"], atol=1e-5
    )
    # mesh invariance must hold under the kernel path too
    np.testing.assert_allclose(Y_pallas, Y_pallas1, atol=1e-4)


def test_sharded_plan_is_finite_and_nontrivial(setup):
    cfg, env = setup
    Y, info = _run(cfg, env, 8)
    assert np.all(np.isfinite(Y))
    assert np.abs(Y).max() > 1e-4  # annealing actually moved the plan
    assert info["rews"].shape == (2, cfg.Nsample)
