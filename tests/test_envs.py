"""Smoke tests: every registered environment resets and steps on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import yaml

import dial_mpc_tpu.envs as dial_envs
from dial_mpc_tpu.utils.io_utils import get_example_path, load_dataclass_from_dict


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


# env name -> shipped example config (the reference configures envs through
# these YAMLs; some envs, e.g. seq_jump, have no usable defaults)
ENV_EXAMPLES = {
    "unitree_go2_walk": "unitree_go2_trot",
    "unitree_go2_seq_jump": "unitree_go2_seq_jump",
    "unitree_go2_crate_climb": "unitree_go2_crate_climb",
    "unitree_h1_walk": "unitree_h1_jog",
    "unitree_h1_push_crate": "unitree_h1_push_crate",
    "unitree_h1_loco": "unitree_h1_loco",
    "allegro_reorient": "allegro_reorient",
}


def make_env(name):
    with open(get_example_path(ENV_EXAMPLES[name] + ".yaml")) as f:
        config_dict = yaml.safe_load(f)
    cfg = load_dataclass_from_dict(
        dial_envs.get_config(name), config_dict, convert_list_to_array=True
    )
    return dial_envs.get_environment(name, cfg)


@pytest.mark.parametrize("name", sorted(ENV_EXAMPLES))
def test_env_reset_step(name):
    env = make_env(name)
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
