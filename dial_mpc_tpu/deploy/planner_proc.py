"""Asynchronous planner process (the ``dial-mpc-plan`` entry point).

Counterpart of the reference's MBDPublisher (dial_mpc/deploy/
dial_plan.py:45-294): attach to the shm bus, inject the measured [q, qd]
into the planner state, warm-start the plan by the *wall-clock* elapsed
time via spline resampling (not integer steps), run Ndiffuse annealing
levels, and publish the action buffer (joint targets + torques) plus
predicted body positions and the plan timestamp.

TPU redesign: the whole per-tick solve — spline time-shift, the annealing
scan, control extraction, act2joint/act2tau — is ONE jitted device program
(`plan_once`); the host loop only moves 13-37 floats of state in and the
action buffer out. A separately compiled Ndiffuse_init program handles
cold starts and the reset-after-gap path, so no recompiles ever happen in
the control loop.
"""

from __future__ import annotations

import argparse
import importlib
import functools
import os
import sys
import time

import numpy as np
import yaml

import jax
import jax.numpy as jnp

import dial_mpc_tpu.envs as dial_envs
from dial_mpc_tpu.config.base_env_config import BaseEnvConfig
from dial_mpc_tpu.core.dial_config import DialConfig
from dial_mpc_tpu.core.dial_core import MBDPI
from dial_mpc_tpu.deploy.shm import ShmBus
from dial_mpc_tpu.examples import deploy_examples
from dial_mpc_tpu.physics.forward import forward
from dial_mpc_tpu.physics.kinematics import replace as data_replace
from dial_mpc_tpu.utils.io_utils import get_example_path, load_dataclass_from_dict
from dial_mpc_tpu.utils.spline import FixedSpline


class MBDPublisher:
    def __init__(
        self,
        env,
        env_config: BaseEnvConfig,
        dial_config: DialConfig,
        checkpoint_path: str | None = None,
        sharding: str = "none",
    ):
        self.dial_config = dial_config
        self.env = env
        self.env_config = env_config
        self.checkpoint_path = checkpoint_path

        # sharding: "none" (single device) or "mesh" (sample axis over all
        # devices) — same knob as the sync runner, so the north-star deploy
        # config (Nsample >= 8k) can ride a multi-chip mesh
        if sharding == "mesh" and len(jax.devices()) > 1:
            from dial_mpc_tpu.parallel import ShardedMBDPI, make_sample_mesh

            self.mbdpi = ShardedMBDPI(dial_config, env, make_sample_mesh())
        else:
            self.mbdpi = MBDPI(dial_config, env)
        self.rng = jax.random.PRNGKey(seed=dial_config.seed)
        # wall-clock warm-start resampler over the node grid
        # (reference: dial_plan.py:136-139)
        self.node_shift = FixedSpline(self.mbdpi.step_nodes, self.mbdpi.step_nodes)

        self.Y = jnp.zeros([dial_config.Hnode + 1, self.mbdpi.nu])
        self.ctrl_dt = env_config.dt
        self.n_acts = dial_config.Hsample + 1
        mj = env.mj_model
        self.nq, self.nv, self.nu = mj.nq, mj.nv, mj.nu
        self.default_q = mj.keyframe("home").qpos
        self.default_u = mj.keyframe("home").ctrl

        # viz-ref body count for the packed per-tick transfer: xbar covers
        # nbody-1 bodies (world excluded); the refs segment wants nu rows
        # starting after the trunk
        self._nb = min(mj.nu, mj.nbody - 2)

        self.bus = ShmBus(self.nq + self.nv, self.nu, self.n_acts, create=False)
        self.bus.acts[:] = self.default_u
        self.bus.refs[:] = 1.0
        self.bus.plan_time[0] = -self.ctrl_dt
        self.bus.state[: self.nq] = self.default_q

        self._reset_jit = jax.jit(self.env.reset)
        self._plan_warm = jax.jit(
            functools.partial(self._plan, n_diffuse=dial_config.Ndiffuse)
        )
        self._plan_init = jax.jit(
            functools.partial(self._plan, n_diffuse=dial_config.Ndiffuse_init)
        )

        # checkpoint/resume: the planner's only persistent state is (Y, rng).
        # The reference has no recovery story beyond a cold Ndiffuse_init
        # warm-up (SURVEY §5.4); restoring the plan avoids the transient.
        if checkpoint_path and os.path.exists(checkpoint_path):
            try:
                z = np.load(checkpoint_path)
                if z["Y"].shape == tuple(self.Y.shape):
                    self.Y = jnp.asarray(z["Y"])
                    self.rng = jnp.asarray(z["rng"])
                    print(f"resumed planner state from {checkpoint_path}")
            except Exception as e:
                print(f"[WARN] checkpoint restore failed: {e}")

    def save_checkpoint(self):
        if self.checkpoint_path:
            np.savez(
                self.checkpoint_path,
                Y=np.asarray(self.Y),
                rng=np.asarray(self.rng),
            )

    # -- single-program per-tick solve --------------------------------------

    def _plan(self, state, Y, rng, shift_time, n_diffuse):
        """shift + anneal + extract controls, all on device.

        Everything the shm bus needs per tick is packed into ONE flat f32
        vector on device: through the remote-TPU tunnel a device_get costs
        a ~10-30 ms round trip *per array*, so fetching joint targets,
        torques and viz refs separately tripled the readback. The host
        unpacks by the static layout (n_acts*nu | n_acts*nu | n_acts*nb*3).
        """
        Y = self.node_shift.shift(Y, shift_time)

        def reverse_scan(carry, factor):
            rng, Y, st = carry
            rng, Y, info = self.mbdpi.reverse_once(st, rng, Y, factor)
            return (rng, Y, st), info

        (rng, Y, _), info = jax.lax.scan(
            reverse_scan, (rng, Y, state), self.mbdpi.diffuse_factors(n_diffuse)
        )
        us = self.mbdpi.node2u(Y)
        joint_targets = self.env.act2joint(us)
        taus = self.env.act2tau(us, state.pipeline_state)
        x_targets = info["xbar"][-1]
        refs = x_targets[: self.n_acts, 1 : 1 + self._nb, :3]
        packed = jnp.concatenate(
            [
                joint_targets[: self.n_acts].reshape(-1),
                taus[: self.n_acts].reshape(-1),
                refs.reshape(-1),
            ]
        ).astype(jnp.float32)
        return Y, rng, packed

    # -- state injection (reference: dial_plan.py:141-155) ------------------

    def init_state(self, q, qd):
        state = self._reset_jit(jax.random.PRNGKey(0))
        d = self.env.pipeline_init(
            jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32)
        )
        obs = self.env._get_obs(d, state.info)
        return state.replace(pipeline_state=d, obs=obs)

    def update_state(self, state, q, qd, t):
        d = data_replace(
            state.pipeline_state,
            qpos=jnp.asarray(q, jnp.float32),
            qvel=jnp.asarray(qd, jnp.float32),
        )
        info = dict(state.info)
        # int32 *array*, not a Python int: env info pytrees keep stable leaf
        # types (weak-typed scalars change the aval and retrace _plan_warm)
        info["step"] = jnp.asarray(int(t / self.ctrl_dt), jnp.int32)
        return state.replace(pipeline_state=d, info=info)

    # -- host loop ----------------------------------------------------------

    def main_loop(self, max_iters=None, verbose=True):
        from dial_mpc_tpu.utils.telemetry import LatencyRecorder

        latency = LatencyRecorder()
        last_plan_time = float(self.bus.time[0])
        state = self.init_state(
            self.bus.state[: self.nq].copy(), self.bus.state[self.nq :].copy()
        )
        first_time = True
        iters = 0
        while max_iters is None or iters < max_iters:
            t0 = time.time()
            plan_time = float(self.bus.time[0])
            state = self.update_state(
                state,
                self.bus.state[: self.nq].copy(),
                self.bus.state[self.nq :].copy(),
                plan_time,
            )
            shift_time = plan_time - last_plan_time
            if shift_time > self.ctrl_dt + 1e-3 and verbose:
                print(f"[WARN] sim overtime {(shift_time - self.ctrl_dt) * 1000:.1f} ms")
            if shift_time > self.ctrl_dt * self.n_acts:
                if verbose:
                    print(
                        f"[WARN] long time unplanned {shift_time * 1000:.1f} ms,"
                        " reset control"
                    )
                self.Y = self.Y * 0.0
                shift_time = 0.0

            is_first = first_time
            first_time = False
            plan_fn = self._plan_init if is_first else self._plan_warm
            if is_first and verbose:
                print("Compiling DIAL-MPC solve")
            self.Y, self.rng, packed = plan_fn(
                state, self.Y, self.rng, jnp.float32(shift_time)
            )

            # ONE host transfer for everything the bus needs
            # (Y/rng stay on device for the next tick)
            packed = np.asarray(packed)
            na, nu, nb = self.n_acts, self.nu, self._nb
            self.bus.acts[:] = packed[: na * nu].reshape(na, nu)
            self.bus.tau[:] = packed[na * nu : 2 * na * nu].reshape(na, nu)
            self.bus.refs[:, :nb, :] = packed[2 * na * nu :].reshape(na, nb, 3)
            self.bus.plan_time[0] = plan_time
            last_plan_time = plan_time
            iters += 1
            if self.checkpoint_path and iters % 250 == 0:
                self.save_checkpoint()
            if not is_first:
                # steady-state ticks only: the first tick carries the
                # 30s-10min device compile and would poison p99/max
                latency.add(time.time() - t0)
            if time.time() - t0 > self.ctrl_dt and verbose:
                print(f"[WARN] real overtime {(time.time() - t0) * 1000:.1f} ms")
        if verbose:
            print(latency.report("plan latency"))
        self.last_latency = latency.summary()

    def close(self):
        self.bus.close()


def main(args=None):
    parser = argparse.ArgumentParser()
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--config", type=str, default=None)
    group.add_argument("--example", type=str, default=None)
    group.add_argument("--list-examples", action="store_true")
    parser.add_argument("--custom-env", type=str, default=None)
    parser.add_argument(
        "--checkpoint",
        type=str,
        default=None,
        help="path for periodic (Y, rng) planner-state checkpoints; resumes if present",
    )
    args = parser.parse_args(args)

    if args.custom_env is not None:
        sys.path.append(os.getcwd())
        importlib.import_module(args.custom_env)
    if args.list_examples:
        print("Available examples:")
        for example in deploy_examples:
            print(f"  - {example}")
        return
    if args.example is not None:
        if args.example not in deploy_examples:
            print(f"Example {args.example} not found.")
            return
        config_path = get_example_path(args.example + ".yaml")
    else:
        config_path = args.config
    with open(config_path) as f:
        config_dict = yaml.safe_load(f)

    dial_config = load_dataclass_from_dict(DialConfig, config_dict)
    env_config_type = dial_envs.get_config(dial_config.env_name)
    env_config = load_dataclass_from_dict(
        env_config_type, config_dict, convert_list_to_array=True
    )
    env = dial_envs.get_environment(dial_config.env_name, env_config)

    publisher = MBDPublisher(
        env,
        env_config,
        dial_config,
        checkpoint_path=args.checkpoint,
        sharding=config_dict.get("sharding", "none"),
    )
    try:
        publisher.main_loop()
    except KeyboardInterrupt:
        pass
    finally:
        publisher.save_checkpoint()
        publisher.close()


if __name__ == "__main__":
    main()
