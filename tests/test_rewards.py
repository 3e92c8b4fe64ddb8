"""Reward stacks vs an independent numpy/scipy oracle, term by term.

Each test crafts a synthetic next-pipeline-state (injected via the
``pipeline_next`` playback hook, so no physics runs), calls ``env.step``,
and compares the returned reward against a from-scratch numpy re-derivation
of the reference formulas (reference: dial_mpc/envs/unitree_go2_env.py
:164-239 walk, :424-496 seq-jump, :698-783 crate). Every nonzero-weight
term contributes a distinct nonzero value, so a sign flip or weight change
in any single term fails the equality.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import dial_mpc_tpu.envs as dial_envs


def _unit_quat(seed, max_angle=0.4):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = max_angle * rng.uniform(0.3, 1.0)
    r = R.from_rotvec(ang * axis)
    x, y, z, w = r.as_quat()
    return np.array([w, x, y, z])


def _rot(q_wxyz):
    w, x, y, z = q_wxyz
    return R.from_quat([x, y, z, w])


def _foot_step_np(duty_ratio, cadence, amplitude, phases, time):
    """Numpy re-derivation of the gait profile (function_utils.py:26-46)."""
    t = time * 2 * np.pi * cadence + np.pi
    out = []
    for ph in phases:
        footphase = 2 * np.pi * ph
        angle = (t + np.pi - footphase) % (2 * np.pi) - np.pi
        if duty_ratio < 1:
            angle = angle * 0.5 / (1 - duty_ratio)
        clipped = np.clip(angle, -np.pi / 2, np.pi / 2)
        value = np.cos(clipped) if duty_ratio < 1 else 0.0
        out.append(abs(value) if abs(value) >= 1e-6 else 0.0)
    return amplitude * np.array(out)


def _act2ctrl_np(env, action, qpos, qvel, mode):
    """Numpy act2joint/act2tau (reference base_env.py:37-66)."""
    cfg = env._config
    jr = np.asarray(env.joint_range, np.float64)
    pr = np.asarray(env.physical_joint_range, np.float64)
    tq = np.asarray(env.joint_torque_range, np.float64)
    act_norm = (np.asarray(action) * cfg.action_scale + 1.0) / 2.0
    jt = np.clip(jr[:, 0] + act_norm * (jr[:, 1] - jr[:, 0]), pr[:, 0], pr[:, 1])
    if mode == "position":
        return jt
    nu = len(jt)
    q = np.asarray(qpos)[7 : 7 + nu]
    qd = np.asarray(qvel)[6 : 6 + nu]
    kp = np.broadcast_to(np.asarray(cfg.kp, np.float64), (nu,))
    kd = np.broadcast_to(np.asarray(cfg.kd, np.float64), (nu,))
    return np.clip(kp * (jt - q) - kd * qd, tq[:, 0], tq[:, 1])


def _crafted_next(env, state, seed):
    """A synthetic contact-rich next state with every term nonzero."""
    rng = np.random.default_rng(seed)
    d = state.pipeline_state
    nbody1 = d.x_pos.shape[0]
    torso = int(env._torso_idx) - 1

    x_pos = np.asarray(d.x_pos, np.float64).copy()
    x_pos[torso] = [0.12, -0.04, 0.24]
    x_rot = np.asarray(d.x_rot, np.float64).copy()
    q_t = _unit_quat(seed + 1)
    x_rot[torso] = q_t
    if torso != 0:
        x_rot[0] = _unit_quat(seed + 2)

    site_xpos = np.asarray(d.site_xpos, np.float64).copy()
    feet = np.asarray(env._feet_site_id)
    z_feet = np.array([0.01, 0.06, 0.002, 0.11]) + rng.uniform(0, 0.01, 4)
    for k, sid in enumerate(feet):
        site_xpos[sid, 2] = z_feet[k]

    xd_vel = np.asarray(d.xd_vel, np.float64).copy()
    xd_ang = np.asarray(d.xd_ang, np.float64).copy()
    xd_vel[torso] = [0.7, -0.2, 0.05]
    xd_ang[torso] = [5.0, -8.0, 20.0]  # degrees/sec convention upstream

    qpos = np.asarray(d.qpos, np.float64).copy()
    nu = env.action_size
    jr = np.asarray(env.joint_range, np.float64)
    qpos[7 : 7 + nu] = np.clip(
        qpos[7 : 7 + nu] + rng.normal(0, 0.03, nu), jr[:, 0] + 0.05, jr[:, 1] - 0.05
    )
    qvel = np.asarray(d.qvel, np.float64).copy()
    qvel[6:] = rng.normal(0, 0.4, len(qvel) - 6)

    f32 = jnp.float32
    d_next = dataclasses.replace(
        d,
        qpos=jnp.asarray(qpos, f32),
        qvel=jnp.asarray(qvel, f32),
        x_pos=jnp.asarray(x_pos, f32),
        x_rot=jnp.asarray(x_rot, f32),
        xd_vel=jnp.asarray(xd_vel, f32),
        xd_ang=jnp.asarray(xd_ang, f32),
        site_xpos=jnp.asarray(site_xpos, f32),
    )
    return d_next, dict(
        x_pos=x_pos, x_rot=x_rot, z_feet=z_feet, xd_vel=xd_vel, xd_ang=xd_ang,
        qpos=qpos, qvel=qvel, torso=torso,
    )


@pytest.mark.parametrize("seed", [0, 7])
def test_go2_walk_reward_oracle(seed):
    from dial_mpc_tpu.envs.unitree_go2_env import GAIT_PARAMS, GAIT_PHASES

    env = dial_envs.get_environment(
        "unitree_go2_walk", dial_envs.get_config("unitree_go2_walk")()
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    info = dict(state.info)
    step0 = 5
    info["step"] = jnp.asarray(step0, jnp.int32)
    state = state.replace(info=info)

    d_next, c = _crafted_next(env, state, seed)
    action = jnp.asarray(np.random.default_rng(seed + 3).uniform(-0.6, 0.6, env.action_size), jnp.float32)
    out = env.step(state, action, pipeline_next=d_next)

    # ---- oracle (reference unitree_go2_env.py:142-248) ----
    cfg = env._config
    dt = cfg.dt
    vel_tar = np.array([cfg.default_vx, cfg.default_vy, 0.0])
    ang_vel_tar = np.array([0.0, 0.0, cfg.default_vyaw])
    ramp = step0 * dt / cfg.ramp_up_time
    vel_tar = np.minimum(vel_tar * ramp, vel_tar)
    ang_vel_tar = np.minimum(ang_vel_tar * ramp, ang_vel_tar)

    gp = np.asarray(GAIT_PARAMS[cfg.gait], np.float64)
    phases = np.asarray(GAIT_PHASES[cfg.gait], np.float64)
    z_tar = _foot_step_np(gp[0], gp[1], gp[2], phases, step0 * dt)
    # env computes the gait error at f32 state precision
    z_feet32 = np.float32(c["z_feet"]).astype(np.float64)
    r_gait = -np.sum(((z_tar - z_feet32) / 0.05) ** 2)

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
    r_ang_vel = -np.sum((ab[2] - ang_vel_tar[2]) ** 2)

    r_height = -(c["x_pos"][c["torso"], 2] - 0.3) ** 2

    expected = (
        0.1 * r_gait + 0.5 * r_upright + 0.3 * r_yaw
        + 1.0 * r_vel + 1.0 * r_ang_vel + 1.0 * r_height
    )
    np.testing.assert_allclose(float(out.reward), expected, rtol=2e-4, atol=2e-5)

    # termination oracle: crafted state is upright, inside limits, above 0.18
    assert float(out.done) == 0.0


def test_go2_walk_airtime_and_contact_bookkeeping():
    """first-contact air-time bonus + last_contact/feet_air_time updates."""
    env = dial_envs.get_environment(
        "unitree_go2_walk", dial_envs.get_config("unitree_go2_walk")()
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    info = dict(state.info)
    info["step"] = jnp.asarray(3, jnp.int32)
    info["feet_air_time"] = jnp.array([0.3, 0.0, 0.2, 0.4], jnp.float32)
    info["last_contact"] = jnp.array([False, False, True, False])
    state = state.replace(info=info)

    d_next, c = _crafted_next(env, state, 11)
    # feet z: 0=touching (contact), 1=air, 2=air but last_contact, 3=air
    site_xpos = np.asarray(d_next.site_xpos, np.float64).copy()
    feet = np.asarray(env._feet_site_id)
    z = [env._foot_radius + 5e-4, 0.08, 0.09, 0.1]
    for k, sid in enumerate(feet):
        site_xpos[sid, 2] = z[k]
    d_next = dataclasses.replace(d_next, site_xpos=jnp.asarray(site_xpos, jnp.float32))

    out = env.step(state, jnp.zeros(env.action_size), pipeline_next=d_next)
    dt = env._config.dt
    # contact = [True, False, False, False]; filt adds leg 2 from last_contact
    # first_contact = air_time>0 & filt -> legs 0 and 2
    # bonus = (0.3+dt-0.1) + (0.2+dt-0.1)  (weight 0.0 in the total reward,
    # so verify the bookkeeping outputs instead)
    np.testing.assert_array_equal(
        np.asarray(out.info["last_contact"]), [True, False, False, False]
    )
    np.testing.assert_allclose(
        np.asarray(out.info["feet_air_time"]),
        [0.0, dt, 0.0, 0.4 + dt],  # reset where contact_filt, else += dt
        atol=1e-6,
    )


def test_go2_seq_jump_contact_reward_oracle():
    import yaml

    from dial_mpc_tpu.utils.io_utils import get_example_path, load_dataclass_from_dict

    cfgd = yaml.safe_load(open(get_example_path("unitree_go2_seq_jump.yaml")))
    env_cfg = load_dataclass_from_dict(
        dial_envs.get_config("unitree_go2_seq_jump"), cfgd, convert_list_to_array=True
    )
    env = dial_envs.get_environment("unitree_go2_seq_jump", env_cfg)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    stage = 1
    info = dict(state.info)
    info["step"] = jnp.asarray(int(stage * env._config.jump_dt / env._config.dt) + 1, jnp.int32)
    info["contact_stage"] = jnp.asarray(stage, jnp.int32)
    state = state.replace(info=info)

    d_next, c = _crafted_next(env, state, 21)
    targets = np.asarray(state.info["contact_targets"], np.float64)
    radius = np.asarray(state.info["contact_target_radius"], np.float64)

    # slots 0-3 are the feet-floor contacts by construction; craft:
    #  foot 0: touching inside the ACTIVE stage target -> reward
    #  foot 1: touching inside stage 0 (inactive) target -> no reward, no penalty
    #  foot 2: touching outside every target -> penalty
    #  foot 3: NOT touching but inside the active target circle -> still
    #          rewarded (the reference gates the reward on the xy circle
    #          only, not on touch: unitree_go2_env.py:461-471)
    dist = np.asarray(d_next.contact.dist, np.float64).copy()
    pos = np.asarray(d_next.contact.pos, np.float64).copy()
    dist[:4] = [-0.004, -0.002, -0.003, 0.05]
    pos[0, :2] = targets[stage, 0, :2]
    pos[1, :2] = targets[0, 1, :2]
    far = targets[:, 2, :2].mean(axis=0) + np.array([5.0, 5.0])
    pos[2, :2] = far
    pos[3, :2] = targets[stage, 3, :2]
    contact = dataclasses.replace(
        d_next.contact,
        dist=jnp.asarray(dist, jnp.float32),
        pos=jnp.asarray(pos, jnp.float32),
    )
    d_next = dataclasses.replace(d_next, contact=contact)

    out = env.step(state, jnp.zeros(env.action_size), pipeline_next=d_next)

    # oracle (reference :424-496)
    from dial_mpc_tpu.envs.unitree_go2_env import GAIT_PARAMS, GAIT_PHASES

    r_contact = np.clip(-dist[0] + 1.0, 0.0, 1.0) + np.clip(
        -dist[3] + 1.0, 0.0, 1.0
    )  # feet 0 (touching) and 3 (hovering in-circle) score
    n_penalty = 1.0  # only foot 2: touching and outside all targets
    torso = c["torso"]
    pos_tar = np.asarray(state.info["pose_target_sequence"], np.float64)[stage]
    r_pos = -np.sum((c["x_pos"][torso] - pos_tar) ** 2)
    vec = _rot(c["x_rot"][0]).apply([0, 0, 1.0])
    r_upright = -np.sum((vec - [0, 0, 1.0]) ** 2)
    yaw_tar = np.asarray(state.info["yaw_target_sequence"], np.float64)[stage]
    yaw = _rot(c["x_rot"][torso]).as_euler("xyz")[2]
    r_yaw = -((yaw - yaw_tar) ** 2)
    expected = (
        1.0 * r_pos + 1.0 * r_upright + 0.3 * r_yaw
        + 0.1 * r_contact - 0.1 * n_penalty + 10.0
    )
    np.testing.assert_allclose(float(out.reward), expected, rtol=2e-4, atol=2e-5)


def test_go2_crate_contact_window_oracle():
    env = dial_envs.get_environment(
        "unitree_go2_crate_climb", dial_envs.get_config("unitree_go2_crate_climb")()
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    info = dict(state.info)
    info["step"] = jnp.asarray(2, jnp.int32)
    state = state.replace(info=info)

    d_next, c = _crafted_next(env, state, 31)
    slots = env._crate_contact_slots
    pos = np.asarray(d_next.contact.pos, np.float64).copy()
    # foot 0 contact point on the crate top window; others far outside
    pos[slots[0]] = [1.3, 0.0, 0.6]
    for s in slots[1:]:
        pos[s] = [0.0, 0.0, 0.0]
    contact = dataclasses.replace(
        d_next.contact, pos=jnp.asarray(pos, jnp.float32)
    )
    d_next = dataclasses.replace(d_next, contact=contact)

    out = env.step(state, jnp.zeros(env.action_size), pipeline_next=d_next)

    torso = c["torso"]
    rt = _rot(c["x_rot"][torso])
    head = c["x_pos"][torso] + rt.as_matrix() @ [0.285, 0.0, 0.0]
    r_pos = -np.sum((head - [1.45, 0.0, 0.87]) ** 2)
    vec = _rot(c["x_rot"][0]).apply([0, 0, 1.0])
    r_upright = -np.sum((vec - [0, 0, 1.0]) ** 2)
    yaw = rt.as_euler("xyz")[2]
    r_yaw = -(yaw**2)
    r_contact = 1.0  # exactly one foot in the crate-top window
    expected = 1.0 * r_pos + 0.01 * r_upright + 0.3 * r_yaw + 0.02 * r_contact
    np.testing.assert_allclose(float(out.reward), expected, rtol=2e-4, atol=2e-5)
