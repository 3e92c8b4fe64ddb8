"""Smoke tests: every registered environment resets and steps on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dial_mpc_tpu.envs as dial_envs

ALL_ENVS = [
    "unitree_go2_walk",
    "unitree_go2_seq_jump",
    "unitree_go2_crate_climb",
    "unitree_h1_walk",
    "unitree_h1_push_crate",
    "unitree_h1_loco",
    "allegro_reorient",
]


@pytest.mark.parametrize("name", ALL_ENVS)
def test_env_reset_step(name):
    cfg_cls = dial_envs.get_config(name)
    env = dial_envs.get_environment(name, cfg_cls())
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(state.obs)))

    step = jax.jit(env.step)
    action = jnp.zeros(env.action_size)
    for _ in range(2):
        state = step(state, action)
    assert np.isfinite(float(state.reward))
    assert bool(jnp.all(jnp.isfinite(state.pipeline_state.qpos)))
    # vmapped batch of 3 must also work (the planner's usage pattern)
    stateB = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (3,) + np.shape(x)), state
    )
    actsB = jnp.zeros((3, env.action_size))
    outB = jax.jit(jax.vmap(env.step))(stateB, actsB)
    assert bool(jnp.all(jnp.isfinite(outB.reward)))
