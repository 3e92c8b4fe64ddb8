"""Behavioral task-success gates: the planner must achieve the task.

The reference's de-facto acceptance test is "run the example and watch
the robot do the task" (reference README.md:64-106). Golden snapshots pin
bits, and the physics suite pins dynamics — but neither fails when a
reward-weight typo or spline off-by-one merely *degrades* skill while
everything stays finite. These tests close that gap: each runs the real
planner loop (shipped YAML hyperparameters, reduced Nsample so CPU can
afford it) and asserts the *task outcome*:

  - Go2 trot: the robot tracks its commanded forward velocity and does
    not fall;
  - Go2 seq-jump: the staged contact-target sequence advances past
    stage 0;
  - H1 loco: the torso stays above the termination height (no collapse).

Thresholds are deliberately loose vs the full-sample runs (Nsample here
is 16-32x smaller than deployment); they are calibrated so a healthy
planner passes with wide margin while a planner that has gone subtly
wrong (e.g. a flipped reward sign, a broken gait clock, a stale spline
shift) lands nowhere near them.
"""

import numpy as np
import pytest
import yaml

import dial_mpc_tpu.envs as dial_envs
from dial_mpc_tpu.core.dial_config import DialConfig
from dial_mpc_tpu.core.dial_core import MBDPI
from dial_mpc_tpu.utils.io_utils import get_example_path, load_dataclass_from_dict


def run_planner(example, overrides):
    """Run the sync planner loop; return per-step (qpos, info scalars)."""
    import jax
    import jax.numpy as jnp

    cfgd = yaml.safe_load(open(get_example_path(example + ".yaml")))
    cfgd.update(overrides)
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

    qpos, stages, dones = [], [], []
    for t in range(cfg.n_steps):
        nd = cfg.Ndiffuse_init if t == 0 else cfg.Ndiffuse
        state, Y, rng, info = mbdpi.control_step(state, Y, rng, nd)
        qpos.append(np.asarray(state.pipeline_state.qpos))
        dones.append(float(state.done))
        if "contact_stage" in state.info:
            stages.append(int(state.info["contact_stage"]))
    return np.stack(qpos), stages, np.asarray(dones), env


def test_go2_trot_tracks_commanded_velocity():
    """2 s of trot must move the base forward at roughly the commanded
    0.8 m/s (the YAML command, 1 s ramp-up) without falling."""
    qpos, _, dones, env = run_planner(
        "unitree_go2_trot",
        dict(Nsample=128, n_steps=100, Ndiffuse=2, Ndiffuse_init=10),
    )
    dt = env.dt
    # steady-state window: after the 1 s command ramp
    vx = np.diff(qpos[:, 0]) / dt
    vx_late = float(vx[len(vx) // 2 :].mean())
    assert 0.4 < vx_late < 1.2, (
        f"commanded 0.8 m/s, tracked {vx_late:.2f} m/s - gait is broken"
    )
    assert float(qpos[:, 2].min()) > 0.12, "base height collapsed (fell over)"
    # done includes joint-limit grazing, which sampled torque control touches
    # transiently without losing the task - gate on *persistent* termination
    assert float(dones.mean()) < 0.5, "episode persistently terminated"


def test_go2_seq_jump_advances_stages():
    """The staged contact-target sequence must advance past stage 0
    (first jump lands) within 1.5 s."""
    qpos, stages, dones, env = run_planner(
        "unitree_go2_seq_jump",
        dict(Nsample=128, n_steps=75, Ndiffuse=2, Ndiffuse_init=10),
    )
    assert stages, "seq-jump env did not report contact_stage"
    assert max(stages) >= 1, (
        f"contact stage never advanced (final={stages[-1]}) - jumping is broken"
    )
    assert float(qpos[:, 2].min()) > 0.08, "base height collapsed"


def test_h1_loco_stays_upright():
    """2 s of H1 locomotion: the torso must stay above the termination
    height the whole run (a humanoid that collapses drifts under it)."""
    qpos, _, dones, env = run_planner(
        "unitree_h1_loco",
        dict(Nsample=128, n_steps=100, Ndiffuse=2, Ndiffuse_init=10),
    )
    assert float(qpos[:, 2].min()) > 0.6, (
        f"torso dropped to {qpos[:, 2].min():.2f} m - H1 collapsed"
    )
    assert float(dones.mean()) < 0.5, "episode persistently terminated"
