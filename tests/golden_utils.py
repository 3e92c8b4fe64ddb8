"""Shared fixed-seed planner trajectory runner for golden-snapshot tests.

Used by tests/golden/generate.py (writes the snapshots) and
tests/test_golden.py (compares a fresh run against them). Must be executed
under the conftest environment (CPU backend, x64 enabled, XLA engine) so
generation and comparison share numerics.
"""

import numpy as np

GOLDEN_CASES = [
    "unitree_go2_trot",
    "unitree_go2_seq_jump",
    "unitree_go2_crate_climb",
    "unitree_h1_jog",
    "unitree_h1_loco",
    "unitree_h1_push_crate",
    "allegro_reorient",
]

# small-but-nontrivial planner settings, identical for generation and test
OVERRIDES = dict(Nsample=8, n_steps=3, Ndiffuse=1, Ndiffuse_init=2)


def run_case(example_name):
    """Run n_steps fixed-seed control steps; return the full trace."""
    import jax
    import jax.numpy as jnp
    import yaml

    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.core.dial_core import MBDPI
    from dial_mpc_tpu.utils.io_utils import get_example_path, load_dataclass_from_dict

    cfgd = yaml.safe_load(open(get_example_path(example_name + ".yaml")))
    cfgd.update(OVERRIDES)
    cfg = load_dataclass_from_dict(DialConfig, cfgd)
    env_cfg = load_dataclass_from_dict(
        dial_envs.get_config(cfg.env_name), cfgd, convert_list_to_array=True
    )
    env = dial_envs.get_environment(cfg.env_name, env_cfg)
    mbdpi = MBDPI(cfg, env)

    rng = jax.random.PRNGKey(seed=cfg.seed)
    rng, rng_reset = jax.random.split(rng)
    state = jax.jit(env.reset)(rng_reset)
    rng, _ = jax.random.split(rng)
    Y = jnp.zeros((cfg.Hnode + 1, mbdpi.nu))

    Ys, rewards, qpos = [], [], []
    for t in range(cfg.n_steps):
        n_diffuse = cfg.Ndiffuse_init if t == 0 else cfg.Ndiffuse
        state, Y, rng, info = mbdpi.control_step(state, Y, rng, n_diffuse)
        Ys.append(np.asarray(Y, np.float64))
        rewards.append(float(state.reward))
        qpos.append(np.asarray(state.pipeline_state.qpos, np.float64))
    return {
        "Y": np.stack(Ys),
        "reward": np.asarray(rewards),
        "qpos": np.stack(qpos),
    }
