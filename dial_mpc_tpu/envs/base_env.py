"""Environment base: State pytree + BaseEnv on the TPU physics engine.

Replaces the reference's brax PipelineEnv substrate (reference:
dial_mpc/envs/base_env.py:14-66 and brax.envs.base.PipelineEnv) with a
direct wrapper over dial_mpc_tpu.physics. Same behavioral surface:
``reset/step/act2joint/act2tau/_get_obs``, ``n_frames = dt/timestep``
substepping, joint/torque ranges from the model, PD torque mapping.
Everything is functionally pure and jit/vmap/shard_map friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

import mujoco

from dial_mpc_tpu.config.base_env_config import BaseEnvConfig
from dial_mpc_tpu.physics import model as mlib
from dial_mpc_tpu.physics.forward import forward, step as physics_step
from dial_mpc_tpu.physics.kinematics import replace as data_replace


def _register(cls):
    fields = dataclasses.fields(cls)
    data = [f.name for f in fields if not f.metadata.get("static")]
    meta = [f.name for f in fields if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


@_register
@dataclasses.dataclass(frozen=True)
class State:
    """Environment state pytree (mirrors brax.envs.base.State)."""

    pipeline_state: mlib.Data
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array]
    info: Dict[str, Any]

    def replace(self, **kwargs) -> "State":
        return dataclasses.replace(self, **kwargs)


class BaseEnv:
    """Physics-backed task environment.

    Subclasses implement ``make_system`` (load + configure the MJCF model),
    ``reset`` and ``step``. The heavy physics state advance is
    ``pipeline_step``: n_frames substeps of the engine under one control.
    """

    def __init__(self, config: BaseEnvConfig):
        assert (
            abs(config.dt / config.timestep - round(config.dt / config.timestep))
            < 1e-9
        ), "dt must be an integer multiple of timestep"
        self._config = config
        self._n_frames = int(round(config.dt / config.timestep))
        mj_model = self.make_system(config)
        self.mj_model = mj_model
        self.sys = mlib.put_model(mj_model)

        # joint limit definitions (skip the free joint row, as the reference
        # does via sys.jnt_range[1:], base_env.py:23-25)
        self.physical_joint_range = jnp.asarray(mj_model.jnt_range[1:])
        self.joint_range = self.physical_joint_range
        # unlimited actuators clip to +/-inf (brax mjcf.load convention the
        # reference relies on — Go2's motors declare no ctrlrange)
        ctrl_range = np.array(mj_model.actuator_ctrlrange, dtype=np.float64)
        ctrl_range[mj_model.actuator_ctrllimited == 0] = [-np.inf, np.inf]
        self.joint_torque_range = jnp.asarray(ctrl_range)

        self._nv = mj_model.nv
        self._nq = mj_model.nq
        self._nu = mj_model.nu

    # -- model loading ------------------------------------------------------

    def make_system(self, config: BaseEnvConfig) -> mujoco.MjModel:
        raise NotImplementedError

    # -- sizes --------------------------------------------------------------

    @property
    def action_size(self) -> int:
        return self._nu

    @property
    def dt(self) -> float:
        return self._config.dt

    # -- physics pipeline ---------------------------------------------------

    def pipeline_init(self, q: jax.Array, qd: jax.Array) -> mlib.Data:
        """Lean Data at (q, qd): derived fields the task envs consume."""
        from dial_mpc_tpu.physics import engine_pallas

        d = mlib.make_data(self.sys)
        d = data_replace(d, qpos=q.astype(d.qpos.dtype), qvel=qd.astype(d.qvel.dtype))
        return engine_pallas.trim_data(self.sys, forward(self.sys, d))

    def pipeline_step(self, d: mlib.Data, ctrl: jax.Array) -> mlib.Data:
        """Advance n_frames simulator steps under one control vector.

        On TPU this dispatches to the lane-major Pallas mega-kernel (one
        kernel call per substep); elsewhere it runs the XLA reference
        pipeline. Both produce the same lean Data.
        """
        from dial_mpc_tpu.physics import engine_pallas

        ctrl = ctrl.astype(d.qpos.dtype)
        if engine_pallas.engine_enabled(self.sys):
            import os as _os

            if _os.environ.get("DIAL_MPC_FUSE_FRAMES", "1") != "0":
                # one kernel call for all n_frames substeps: the (qpos,
                # qvel) carry stays in VMEM; intermediate substeps touch
                # no HBM at all
                core = engine_pallas.step_core_for(
                    self.sys, n_steps=self._n_frames
                )
                outs = core(d.qpos, d.qvel, ctrl)
            else:
                core = engine_pallas.step_core_for(self.sys)
                qpos, qvel = d.qpos, d.qvel
                for _ in range(self._n_frames):
                    outs = core(qpos, qvel, ctrl)
                    qpos, qvel = outs[0], outs[1]
            return engine_pallas.lean_data(
                self.sys, d, outs, ctrl,
                self._n_frames * self.sys.opt.timestep.astype(d.qpos.dtype),
            )

        d = data_replace(d, ctrl=ctrl)
        if self._n_frames == 1:
            d = physics_step(self.sys, d)
        else:
            def body(d, _):
                # trim keeps the scan carry identical to the lean input
                return engine_pallas.trim_data(
                    self.sys, physics_step(self.sys, d)
                ), None

            d, _ = jax.lax.scan(body, d, None, length=self._n_frames)
        return engine_pallas.trim_data(self.sys, d)

    def advance(self, state, ctrl, pipeline_next=None):
        """Next pipeline state: live physics, or playback of a precomputed
        Data (test/replay injection; the applied ctrl is recorded either way)."""
        if pipeline_next is not None:
            return data_replace(
                pipeline_next, ctrl=ctrl.astype(pipeline_next.qpos.dtype)
            )
        return self.pipeline_step(state.pipeline_state, ctrl)

    # -- action mappings (reference: base_env.py:37-66) ---------------------

    def act2joint(self, act: jax.Array) -> jax.Array:
        act_normalized = (act * self._config.action_scale + 1.0) / 2.0
        joint_targets = self.joint_range[:, 0] + act_normalized * (
            self.joint_range[:, 1] - self.joint_range[:, 0]
        )
        return jnp.clip(
            joint_targets,
            self.physical_joint_range[:, 0],
            self.physical_joint_range[:, 1],
        )

    def act2tau(self, act: jax.Array, pipeline_state: mlib.Data) -> jax.Array:
        joint_target = self.act2joint(act)
        q = pipeline_state.qpos[7 : 7 + joint_target.shape[0]]
        qd = pipeline_state.qvel[6 : 6 + joint_target.shape[0]]
        q_err = joint_target - q
        tau = self._config.kp * q_err - self._config.kd * qd
        return jnp.clip(
            tau, self.joint_torque_range[:, 0], self.joint_torque_range[:, 1]
        )

    # -- env API ------------------------------------------------------------

    def reset(self, rng: jax.Array) -> State:
        raise NotImplementedError

    def step(self, state: State, action: jax.Array) -> State:
        raise NotImplementedError

    # -- rendering (reference: unitree_go2_env.py:288-296, brax
    # PipelineEnv.render; and dial_core.py:289-329 html flow) ---------------

    def render(self, trajectory, camera=None, width=240, height=320):
        """Rasterize a trajectory of States (or pipeline Datas) to a list of
        RGB uint8 arrays via CPU MuJoCo. Needs a GL backend (set MUJOCO_GL=
        egl/osmesa when headless); GL-less machines should use
        ``render_html`` instead."""
        renderer = mujoco.Renderer(self.mj_model, height=height, width=width)
        data = mujoco.MjData(self.mj_model)
        out = []
        try:
            for st in trajectory:
                ps = getattr(st, "pipeline_state", st)
                data.qpos[:] = np.asarray(ps.qpos)
                data.qvel[:] = np.asarray(ps.qvel)
                mujoco.mj_forward(self.mj_model, data)
                if camera is None:
                    renderer.update_scene(data)
                else:
                    renderer.update_scene(data, camera=camera)
                out.append(renderer.render())
        finally:
            renderer.close()
        return out

    def render_html(self, trajectory, path, fps=None, decimate=1):
        """Self-contained WebGL HTML viewer of a trajectory of States (or
        pipeline Datas, or raw qpos rows). Works headless; meshes render at
        full fidelity (decimated). Counterpart of the reference's brax
        ``html.render`` output (dial_core.py:289-329)."""
        from dial_mpc_tpu.viz.html_viewer import render_trajectory

        qpos = []
        for st in trajectory:
            ps = getattr(st, "pipeline_state", st)
            qpos.append(np.asarray(getattr(ps, "qpos", ps)))
        return render_trajectory(
            self.mj_model,
            np.stack(qpos),
            path,
            fps=(1.0 / self.dt if fps is None else fps),
            decimate=decimate,
        )
