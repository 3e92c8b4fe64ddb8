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


def test_sharded_plan_is_finite_and_nontrivial(setup):
    cfg, env = setup
    Y, info = _run(cfg, env, 8)
    assert np.all(np.isfinite(Y))
    assert np.abs(Y).max() > 1e-4  # annealing actually moved the plan
    assert info["rews"].shape == (2, cfg.Nsample)
