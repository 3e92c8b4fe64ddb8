"""Allegro-hand in-hand reorientation task.

Behavioral parity target (logic re-derived): reference
dial_mpc/envs/manipulation.py:23-117 (AllegroReorientEnv — ball spinning
with 16 position-servo finger joints; act2joint offsets from the keyframe
pose; fixed 100-step episode; torque mode unsupported).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp

import mujoco

from dial_mpc_tpu.config.base_env_config import BaseEnvConfig
from dial_mpc_tpu.envs import register_env
from dial_mpc_tpu.envs.base_env import BaseEnv, State
from dial_mpc_tpu.utils.io_utils import get_model_path


@dataclass
class AllegroReorientEnvConfig(BaseEnvConfig):
    kp: Union[float, jax.Array] = 1.0
    kd: Union[float, jax.Array] = 0.1


class AllegroReorientEnv(BaseEnv):
    def __init__(self, config: AllegroReorientEnvConfig):
        super().__init__(config)
        self._object_body_idx = mujoco.mj_name2id(
            self.mj_model, mujoco.mjtObj.mjOBJ_BODY.value, "object"
        )
        self._init_q = jnp.array(self.mj_model.keyframe("in_hand_reorient").qpos)

    def make_system(self, config: AllegroReorientEnvConfig) -> mujoco.MjModel:
        model_path = get_model_path("wonik_allegro", "scene_left.xml")
        mj_model = mujoco.MjModel.from_xml_path(str(model_path))
        mj_model.opt.timestep = config.timestep
        return mj_model

    def reset(self, rng: jax.Array) -> State:
        rng, key = jax.random.split(rng)
        pipeline_state = self.pipeline_init(self._init_q, jnp.zeros(self._nv))
        f32 = jnp.float32
        state_info = {
            "rng": rng,
            "ang_vel_tar": jnp.array([0.0, 0.0, 0.5], f32),
            "pos_tar": jnp.array([0.0, 0.0, 0.13], f32),
            "step": jnp.asarray(0, jnp.int32),  # array, not python int: avoids a retrace after the first step
        }
        obs = jnp.zeros(1, f32)
        reward, done = jnp.zeros(2, f32)
        return State(pipeline_state, obs, reward, done, {}, state_info)

    def step(self, state: State, action: jax.Array, pipeline_next=None) -> State:
        rng, cmd_rng = jax.random.split(state.info["rng"], 2)
        f32 = jnp.float32

        if self._config.leg_control == "position":
            ctrl = self.act2joint(action)
        else:
            raise NotImplementedError("Allegro supports position control only")
        pipeline_state = self.advance(state, ctrl, pipeline_next)

        obj = self._object_body_idx - 1
        ball_ang_vel = pipeline_state.xd_ang[obj] * jnp.pi / 180.0
        ball_pos = pipeline_state.x_pos[obj]
        reward_ang_vel = -jnp.sum(
            jnp.square(ball_ang_vel - state.info["ang_vel_tar"])
        )
        reward_pos = -jnp.sum(jnp.square(ball_pos - state.info["pos_tar"]))
        reward_joint_angle_deviation = -jnp.sum(
            jnp.square(pipeline_state.qpos[7:] - self._init_q[7:])
        )
        reward = (
            reward_ang_vel * 1.0
            + reward_pos * 5.0
            + reward_joint_angle_deviation * 0.1
        )
        reward = jnp.asarray(reward, f32)

        # scalar, matching reset: the reference returns shape-() done from
        # reset but shape-(1,) from step (manipulation.py:58,86) — an aval
        # flip that forces a retrace and breaks float(state.done); keep it
        # scalar here
        done = jnp.zeros((), f32)
        done = jnp.where(state.info["step"] >= 100, 1.0, done)

        state_info = {
            "rng": rng,
            "ang_vel_tar": state.info["ang_vel_tar"],
            "pos_tar": state.info["pos_tar"],
            "step": state.info["step"] + 1,
        }
        obs = jnp.zeros(1, f32)
        return State(pipeline_state, obs, reward, done, {}, state_info)

    def act2joint(self, act: jax.Array) -> jax.Array:
        # offsets from the keyframe pose rather than absolute targets
        # (reference: manipulation.py:102-115)
        act_normalized = (act * self._config.action_scale + 1.0) / 2.0
        joint_targets = (
            self.joint_range[:, 0]
            + self._init_q[7:]
            + act_normalized * (self.joint_range[:, 1] - self.joint_range[:, 0])
        )
        return jnp.clip(
            joint_targets,
            self.physical_joint_range[:, 0],
            self.physical_joint_range[:, 1],
        )


register_env("allegro_reorient", AllegroReorientEnv, AllegroReorientEnvConfig)
