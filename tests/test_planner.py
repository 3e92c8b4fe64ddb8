"""Planner core: noise schedule, shift semantics, determinism, improvement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dial_mpc_tpu.envs as dial_envs
from dial_mpc_tpu.core.dial_config import DialConfig
from dial_mpc_tpu.core.dial_core import MBDPI


@pytest.fixture(scope="module")
def planner():
    cfg = DialConfig(
        env_name="unitree_go2_walk",
        Nsample=8,
        Hsample=16,
        Hnode=4,
        Ndiffuse=2,
        Ndiffuse_init=2,
        n_steps=2,
    )
    env_cfg_cls = dial_envs.get_config(cfg.env_name)
    env = dial_envs.get_environment(cfg.env_name, env_cfg_cls(kd=0.0))
    return cfg, env, MBDPI(cfg, env)


def test_sigma_control_schedule(planner):
    cfg, env, mbdpi = planner
    expected = 0.9 ** np.arange(cfg.Hnode + 1)[::-1]
    np.testing.assert_allclose(mbdpi.sigma_control, expected, rtol=1e-6)
    # annealing factors decay by traj_diffuse_factor per level
    factors = mbdpi.diffuse_factors(3)
    np.testing.assert_allclose(factors[1], factors[0] * cfg.traj_diffuse_factor)


def test_shift_of_zero_plan_is_zero(planner):
    _, _, mbdpi = planner
    Y = jnp.zeros((mbdpi.args.Hnode + 1, mbdpi.nu))
    np.testing.assert_allclose(mbdpi.shift_jit(Y), 0.0, atol=1e-7)


def test_node2u_constant_plan(planner):
    """A constant node plan interpolates to the same constant controls."""
    _, _, mbdpi = planner
    Y = jnp.ones((mbdpi.args.Hnode + 1, mbdpi.nu)) * 0.3
    us = mbdpi.node2u(Y)
    assert us.shape == (mbdpi.args.Hsample + 1, mbdpi.nu)
    np.testing.assert_allclose(us, 0.3, atol=1e-5)


def test_control_step_deterministic(planner):
    cfg, env, mbdpi = planner
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    Y0 = jnp.zeros((cfg.Hnode + 1, mbdpi.nu))
    out1 = mbdpi.control_step(state, Y0, rng, 2)
    out2 = mbdpi.control_step(state, Y0, rng, 2)
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))


def test_rng_stream_matches_reference_order(planner):
    """The sampling stream reproduces the reference's draw order exactly.

    Reference (dial_core.py:104-115): ``rng, k = split(rng)`` then one
    ``normal(k, (Nsample, Hnode+1, nu))``; noised nodes are built by
    scale+shift, node 0 re-pinned, the mean appended, then a +/-1 clip.
    This test re-derives that stream shape-for-shape and requires bitwise
    identity, so identical seeds yield the reference's sample set.
    """
    cfg, env, mbdpi = planner
    rng = jax.random.PRNGKey(42)
    Ybar = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (cfg.Hnode + 1, mbdpi.nu)),
        jnp.float32,
    )
    noise = mbdpi.sigma_control.astype(jnp.float32)

    rng_out, Y0s = mbdpi.sample_nodes(rng, Ybar, noise)

    # the reference's stream, re-derived independently
    rng_ref, k = jax.random.split(rng)
    eps = jax.random.normal(k, (cfg.Nsample, cfg.Hnode + 1, mbdpi.nu))
    ref = eps * noise[None, :, None] + Ybar
    ref = ref.at[:, 0].set(Ybar[0])
    ref = jnp.concatenate([ref, Ybar[None]], axis=0)
    ref = jnp.clip(ref, -1.0, 1.0)

    np.testing.assert_array_equal(np.asarray(Y0s), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(rng_out), np.asarray(rng_ref))


def test_reverse_once_improves_plan_reward(planner):
    """After annealing from zero, the weighted plan out-scores zero controls."""
    cfg, env, mbdpi = planner
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    Y = jnp.zeros((cfg.Hnode + 1, mbdpi.nu))

    rew_zero = None
    for i in range(4):
        rng, Y, info = mbdpi.reverse_once_jit(
            state, rng, Y, mbdpi.sigma_control * (0.5**i)
        )
        if rew_zero is None:
            rew_zero = float(info["rews"][-1])  # last sample = the mean plan
    rew_final = float(info["rews"][-1])
    assert np.isfinite(rew_final)
    assert rew_final > rew_zero, (rew_zero, rew_final)


def test_all_nonfinite_rollouts_keep_plan(planner):
    """Degradation semantics: if EVERY rollout (mean included) diverges, the
    plan update must return the current plan unchanged and finite — softmax
    over all -inf must not produce NaN (the Allegro pinch-explosion case)."""
    cfg, env, mbdpi = planner
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    # poison the state: all rollouts (and the mean rollout) go non-finite
    from dial_mpc_tpu.physics.kinematics import replace as drep

    bad = state.replace(
        pipeline_state=drep(
            state.pipeline_state,
            qvel=jnp.full_like(state.pipeline_state.qvel, jnp.nan),
        )
    )
    Y = 0.123 * jnp.ones((cfg.Hnode + 1, mbdpi.nu))
    _, Ybar, info = mbdpi.reverse_once_jit(bad, rng, Y, mbdpi.sigma_control)
    assert bool(jnp.isfinite(Ybar).all()), "plan went non-finite"
    np.testing.assert_allclose(
        np.asarray(Ybar), np.clip(np.asarray(Y), -1, 1), atol=1e-7,
        err_msg="all-diverged update should keep the (clipped) current plan",
    )


def test_control_step_freezes_on_divergence(planner):
    """If the physics advance diverges, control_step keeps the last finite
    pipeline state instead of propagating NaNs to every later solve."""
    cfg, env, mbdpi = planner
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    from dial_mpc_tpu.physics.kinematics import replace as drep

    bad = state.replace(
        pipeline_state=drep(
            state.pipeline_state,
            qvel=jnp.full_like(state.pipeline_state.qvel, jnp.inf),
        )
    )
    Y = jnp.zeros((cfg.Hnode + 1, mbdpi.nu))
    state2, Y2, _, _ = mbdpi.control_step(bad, Y, rng, 1)
    # the advance from an inf state is non-finite, so the guard keeps the
    # (already-inf) old state rather than NaN-ing qpos; the plan stays finite
    assert bool(jnp.isfinite(Y2).all())
