"""H1 reward stacks vs an independent numpy/scipy oracle, term by term.

Same method as test_rewards.py (crafted next-state via the pipeline_next
playback hook, from-scratch numpy re-derivation): reference
dial_mpc/envs/unitree_h1_env.py — walk :221-298, push_crate :458-544,
loco :740-825. Every nonzero-weight term contributes a distinct nonzero
value, so a sign flip or weight change in any single term fails.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dial_mpc_tpu.envs as dial_envs
from test_rewards import _act2ctrl_np, _foot_step_np, _rot, _unit_quat


def _h1_crafted(env, state, seed, z_feet):
    """Synthetic next state: tilted-but-alive torso, live velocities, foot
    contact distances injected at the re-derived floor slots."""
    rng = np.random.default_rng(seed)
    d = state.pipeline_state
    torso = int(env._torso_idx) - 1

    x_pos = np.asarray(d.x_pos, np.float64).copy()
    x_pos[torso] = [0.15, -0.05, 0.95]
    x_rot = np.asarray(d.x_rot, np.float64).copy()
    x_rot[torso] = _unit_quat(seed + 1, max_angle=0.3)
    if torso != 0:
        x_rot[0] = _unit_quat(seed + 2, max_angle=0.3)

    xd_vel = np.asarray(d.xd_vel, np.float64).copy()
    xd_ang = np.asarray(d.xd_ang, np.float64).copy()
    xd_vel[torso] = [0.9, -0.15, 0.1]
    xd_ang[torso] = [10.0, -20.0, 30.0]  # deg/s upstream convention

    # foot-floor contact distances at the env's derived slots; everything
    # else pushed far away so the per-foot min picks our values
    dist = np.asarray(d.contact.dist, np.float64).copy()
    dist[:] = 1.0
    dist[np.asarray(env._left_foot_slots)] = z_feet[0] + np.array(
        [0.002 * k for k in range(len(env._left_foot_slots))]
    )
    dist[np.asarray(env._right_foot_slots)] = z_feet[1] + np.array(
        [0.002 * k for k in range(len(env._right_foot_slots))]
    )

    # feet sites airborne (no touch) for deterministic air-time bookkeeping
    site_xpos = np.asarray(d.site_xpos, np.float64).copy()
    site_xpos[int(env._left_foot_idx), 2] = 0.05
    site_xpos[int(env._right_foot_idx), 2] = 0.08

    qvel = np.asarray(d.qvel, np.float64).copy()
    qvel[6:] = rng.normal(0, 0.5, len(qvel) - 6)

    f32 = jnp.float32
    d_next = dataclasses.replace(
        d,
        qvel=jnp.asarray(qvel, f32),
        x_pos=jnp.asarray(x_pos, f32),
        x_rot=jnp.asarray(x_rot, f32),
        xd_vel=jnp.asarray(xd_vel, f32),
        xd_ang=jnp.asarray(xd_ang, f32),
        site_xpos=jnp.asarray(site_xpos, f32),
        contact=dataclasses.replace(d.contact, dist=jnp.asarray(dist, f32)),
    )
    return d_next, dict(
        x_pos=x_pos, x_rot=x_rot, xd_vel=xd_vel, xd_ang=xd_ang, qvel=qvel,
        torso=torso, dist=dist,
    )


def _h1_common_terms(env, state, c, step0, gait_params, gait_phases):
    """The shared walk-family terms, from scratch in numpy."""
    cfg = env._config
    dt = cfg.dt
    vel_tar = np.array([cfg.default_vx, cfg.default_vy, 0.0])
    ang_vel_tar = np.array([0.0, 0.0, cfg.default_vyaw])
    ramp = step0 * dt / cfg.ramp_up_time
    vel_tar = np.minimum(vel_tar * ramp, vel_tar)
    ang_vel_tar = np.minimum(ang_vel_tar * ramp, ang_vel_tar)

    gp = np.asarray(gait_params[cfg.gait], np.float64)
    phases = np.asarray(gait_phases[cfg.gait], np.float64)
    z_tar = _foot_step_np(gp[0], gp[1], gp[2], phases, step0 * dt)
    z_feet = np.array(
        [
            np.float32(c["dist"][np.asarray(env._left_foot_slots)]).min(),
            np.float32(c["dist"][np.asarray(env._right_foot_slots)]).min(),
        ],
        np.float64,
    )
    r_gait = -np.sum((z_tar - z_feet) ** 2)

    rt = _rot(c["x_rot"][c["torso"]])
    vec = _rot(c["x_rot"][0]).apply([0.0, 0.0, 1.0])
    r_upright = -np.sum((vec - [0.0, 0.0, 1.0]) ** 2)

    yaw = rt.as_euler("xyz")[2]
    yaw_tar = 0.0 + ang_vel_tar[2] * dt * step0
    d_yaw = yaw - yaw_tar
    r_yaw = -np.arctan2(np.sin(d_yaw), np.cos(d_yaw)) ** 2

    vb = rt.apply(c["xd_vel"][c["torso"]], inverse=True)
    ab = rt.apply(np.asarray(c["xd_ang"][c["torso"]]) * np.pi / 180.0, inverse=True)
    r_vel = -np.sum((vb[:2] - vel_tar[:2]) ** 2)

    r_height = -np.sum(
        (c["x_pos"][c["torso"], 2] - np.asarray(state.info["pos_tar"])[2]) ** 2
    )
    return dict(
        r_gait=r_gait, r_upright=r_upright, r_yaw=r_yaw, r_vel=r_vel,
        r_height=r_height, ab=ab, ang_vel_tar=ang_vel_tar,
    )


@pytest.mark.parametrize("seed", [0, 5])
def test_h1_walk_reward_oracle(seed):
    from dial_mpc_tpu.envs.unitree_h1_env import H1_GAIT_PHASES, H1_WALK_GAIT_PARAMS

    env = dial_envs.get_environment(
        "unitree_h1_walk", dial_envs.get_config("unitree_h1_walk")()
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step0 = 7
    info = dict(state.info)
    info["step"] = jnp.asarray(step0, jnp.int32)
    state = state.replace(info=info)

    d_next, c = _h1_crafted(env, state, seed, z_feet=np.array([0.015, 0.09]))
    action = jnp.asarray(
        np.random.default_rng(seed + 3).uniform(-0.5, 0.5, env.action_size),
        jnp.float32,
    )
    out = env.step(state, action, pipeline_next=d_next)

    t = _h1_common_terms(env, state, c, step0, H1_WALK_GAIT_PARAMS, H1_GAIT_PHASES)
    r_ang_vel = -np.sum((t["ab"][2] - t["ang_vel_tar"][2]) ** 2)
    # energy: PD torques from the PRE-step state (reference :278-282)
    pre = state.pipeline_state
    ctrl = _act2ctrl_np(
        env, action, np.asarray(pre.qpos, np.float64),
        np.asarray(pre.qvel, np.float64), "torque",
    )
    tq_max = np.asarray(env.joint_torque_range, np.float64)[:, 1]
    r_energy = -np.sum((np.float32(ctrl).astype(np.float64) / tq_max) ** 2)

    expected = (
        5.0 * t["r_gait"] + 0.5 * t["r_upright"] + 0.1 * t["r_yaw"]
        + 1.0 * t["r_vel"] + 1.0 * r_ang_vel + 0.5 * t["r_height"]
        + 0.01 * r_energy
    )
    np.testing.assert_allclose(float(out.reward), expected, rtol=2e-4, atol=2e-4)
    assert float(out.done) == 0.0


def test_h1_loco_reward_oracle():
    from dial_mpc_tpu.envs.unitree_h1_env import H1_GAIT_PHASES, H1_LOCO_GAIT_PARAMS

    env = dial_envs.get_environment(
        "unitree_h1_loco", dial_envs.get_config("unitree_h1_loco")()
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step0 = 4
    info = dict(state.info)
    info["step"] = jnp.asarray(step0, jnp.int32)
    state = state.replace(info=info)

    seed = 13
    d_next, c = _h1_crafted(env, state, seed, z_feet=np.array([0.03, 0.12]))
    # tilt the foot sites so the loco foot-level term is nonzero
    site_xmat = np.asarray(d_next.site_xmat, np.float64).copy()
    tilt_l = _rot(_unit_quat(seed + 4, 0.25)).as_matrix()
    tilt_r = _rot(_unit_quat(seed + 5, 0.25)).as_matrix()
    site_xmat[int(env._left_foot_idx)] = tilt_l
    site_xmat[int(env._right_foot_idx)] = tilt_r
    d_next = dataclasses.replace(
        d_next, site_xmat=jnp.asarray(site_xmat, jnp.float32)
    )
    action = jnp.asarray(
        np.random.default_rng(seed).uniform(-0.5, 0.5, env.action_size), jnp.float32
    )
    out = env.step(state, action, pipeline_next=d_next)

    t = _h1_common_terms(env, state, c, step0, H1_LOCO_GAIT_PARAMS, H1_GAIT_PHASES)
    # loco tracks the FULL angular velocity vector (reference :795)
    r_ang_vel = -np.sum((t["ab"] - t["ang_vel_tar"]) ** 2)
    # loco energy: torque * next-state joint velocity / 160 (reference :807)
    pre = state.pipeline_state
    ctrl = _act2ctrl_np(
        env, action, np.asarray(pre.qpos, np.float64),
        np.asarray(pre.qvel, np.float64), "torque",
    )
    n = env.joint_range.shape[0]
    tq_max = np.asarray(env.joint_torque_range, np.float64)[:, 1]
    qd_next = np.float32(c["qvel"][6 : 6 + n]).astype(np.float64)
    r_energy = -np.sum(
        (np.float32(ctrl).astype(np.float64) / tq_max * qd_next / 160.0) ** 2
    )
    vt = np.array([0.0, 0.0, 1.0])
    r_foot = -np.sum((tilt_l @ vt - vt) ** 2 + (tilt_r @ vt - vt) ** 2)

    expected = (
        10.0 * t["r_gait"] + 0.5 * t["r_upright"] + 0.5 * t["r_yaw"]
        + 1.0 * t["r_vel"] + 1.0 * r_ang_vel + 0.5 * t["r_height"]
        + 0.02 * r_foot + 0.01 * r_energy
    )
    np.testing.assert_allclose(float(out.reward), expected, rtol=2e-4, atol=2e-4)


def test_h1_push_crate_contact_oracle():
    env = dial_envs.get_environment(
        "unitree_h1_push_crate", dial_envs.get_config("unitree_h1_push_crate")()
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step0 = 6
    info = dict(state.info)
    info["step"] = jnp.asarray(step0, jnp.int32)
    state = state.replace(info=info)

    seed = 17
    d_next, c = _h1_crafted(env, state, seed, z_feet=np.array([0.02, 0.06]))
    # craft hand-crate touch (one wanted slot, below 1.1 m) and one
    # unwanted (leg/torso) crate touch
    dist = np.asarray(d_next.contact.dist, np.float64).copy()
    pos = np.asarray(d_next.contact.pos, np.float64).copy()
    wanted = np.asarray(env._wanted_contacts)
    unwanted = np.asarray(env._unwanted_contacts)
    assert len(wanted) and len(unwanted)
    dist[wanted[0]] = -0.002
    pos[wanted[0], 2] = 0.9
    if len(wanted) > 1:  # second hand slot touching but ABOVE the 1.1 m gate
        dist[wanted[1]] = -0.001
        pos[wanted[1], 2] = 1.3
    dist[unwanted[0]] = -0.004
    d_next = dataclasses.replace(
        d_next,
        contact=dataclasses.replace(
            d_next.contact,
            dist=jnp.asarray(dist, jnp.float32),
            pos=jnp.asarray(pos, jnp.float32),
        ),
    )
    c["dist"] = dist
    out = env.step(state, jnp.zeros(env.action_size), pipeline_next=d_next)

    from dial_mpc_tpu.envs.unitree_h1_env import H1_GAIT_PHASES, H1_WALK_GAIT_PARAMS

    t = _h1_common_terms(env, state, c, step0, H1_WALK_GAIT_PARAMS, H1_GAIT_PHASES)
    r_ang_vel = -np.sum((t["ab"][2] - t["ang_vel_tar"][2]) ** 2)
    pre = state.pipeline_state
    ctrl = _act2ctrl_np(
        env, np.zeros(env.action_size), np.asarray(pre.qpos, np.float64),
        np.asarray(pre.qvel, np.float64), "torque",
    )
    tq_max = np.asarray(env.joint_torque_range, np.float64)[:, 1]
    r_energy = -np.sum((np.float32(ctrl).astype(np.float64) / tq_max) ** 2)
    r_contact = 1.0 - 1.0  # one gated hand touch, one unwanted touch

    expected = (
        5.0 * t["r_gait"] + 0.01 * t["r_upright"] + 0.1 * t["r_yaw"]
        + 1.0 * t["r_vel"] + 1.0 * r_ang_vel + 0.5 * t["r_height"]
        + 0.01 * r_energy + 0.05 * r_contact
    )
    np.testing.assert_allclose(float(out.reward), expected, rtol=2e-4, atol=2e-4)
