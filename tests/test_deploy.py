"""Deploy runtime: shm bus semantics + sim2sim integration on CPU.

The integration test runs the headless sim server in a subprocess (sync
mode) and the planner in-process, communicating over the real POSIX shm
bus — the same process topology as deployment (reference: dial_sim.py +
dial_plan.py).
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from dial_mpc_tpu.deploy.shm import ShmBus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shm_bus_roundtrip():
    bus = ShmBus(nx=37, nu=12, n_acts=17, create=True)
    try:
        attached = ShmBus(nx=37, nu=12, n_acts=17, create=False)
        bus.acts[:] = 1.5
        bus.plan_time[0] = 0.42
        np.testing.assert_allclose(attached.acts, 1.5)
        np.testing.assert_allclose(attached.plan_time[0], np.float32(0.42))
        attached.state[:] = 2.0
        np.testing.assert_allclose(bus.state, 2.0)
        attached.close()
    finally:
        bus.close()


def test_publisher_sharded_mesh():
    """Deploy planner on the 8-device mesh: the north-star config path.

    The bus is created in-process (static clock); the publisher must build
    a ShardedMBDPI and publish finite, non-trivial plans.
    """
    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.deploy.planner_proc import MBDPublisher
    from dial_mpc_tpu.parallel import ShardedMBDPI

    dial_cfg = DialConfig(
        env_name="unitree_go2_walk",
        Nsample=16,
        Hsample=16,
        Hnode=4,
        Ndiffuse=1,
        Ndiffuse_init=2,
    )
    env_cfg = dial_envs.get_config(dial_cfg.env_name)(kd=0.0)
    env = dial_envs.get_environment(dial_cfg.env_name, env_cfg)
    nx = env.mj_model.nq + env.mj_model.nv
    bus = ShmBus(nx=nx, nu=env.mj_model.nu, n_acts=17, create=True)
    try:
        bus.state[: env.mj_model.nq] = env.mj_model.keyframe("home").qpos
        pub = MBDPublisher(env, env_cfg, dial_cfg, sharding="mesh")
        try:
            assert isinstance(pub.mbdpi, ShardedMBDPI)
            pub.main_loop(max_iters=3, verbose=False)
            taus = np.array(pub.bus.tau)
            acts = np.array(pub.bus.acts)
            refs = np.array(pub.bus.refs)
        finally:
            pub.close()
        assert np.isfinite(taus).all() and np.isfinite(acts).all()
        assert np.abs(taus).max() > 0.0, "sharded planner published empty torques"
        # the packed single-transfer layout must land real body positions in
        # the refs segment (bus init fills it with 1.0; a reshape slip would
        # leave it untouched or scramble magnitudes)
        nb = pub._nb
        assert np.isfinite(refs).all()
        assert not np.allclose(refs[:, :nb, :], 1.0), (
            "viz refs were never written by the packed transfer"
        )
        assert np.abs(refs[:, :nb, 2]).max() < 2.0, (
            "refs z out of range - packed layout reshape is misaligned"
        )
    finally:
        bus.close()


def test_publisher_no_retrace_and_steady_state_latency():
    """The warm-plan program compiles exactly once across ticks, and the
    latency histogram holds only steady-state ticks (the first tick carries
    the device compile and must be excluded)."""
    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.deploy.planner_proc import MBDPublisher

    dial_cfg = DialConfig(
        env_name="unitree_go2_walk",
        Nsample=8,
        Hsample=16,
        Hnode=4,
        Ndiffuse=1,
        Ndiffuse_init=2,
    )
    env_cfg = dial_envs.get_config(dial_cfg.env_name)(kd=0.0)
    env = dial_envs.get_environment(dial_cfg.env_name, env_cfg)
    nx = env.mj_model.nq + env.mj_model.nv
    bus = ShmBus(nx=nx, nu=env.mj_model.nu, n_acts=17, create=True)
    try:
        bus.state[: env.mj_model.nq] = env.mj_model.keyframe("home").qpos
        # advance the static clock between ticks so update_state sees
        # distinct (but type-stable) step values
        pub = MBDPublisher(env, env_cfg, dial_cfg)
        try:
            n_iters = 4
            pub.main_loop(max_iters=n_iters, verbose=False)
            assert pub._plan_warm._cache_size() == 1, (
                "warm plan retraced: info pytree leaf types are unstable"
            )
            assert pub.last_latency["n"] == n_iters - 1, (
                "latency histogram must exclude exactly the compile tick"
            )
        finally:
            pub.close()
    finally:
        bus.close()


def test_env_viewer_overlay_hook():
    """The sim server invokes env.update_viewer at viewer setup.

    The reference defines the same hook (contact-target cylinders,
    reference unitree_go2_env.py:633-646) but never calls it from any
    process. Here a fake viewer backed by a real MjvScene must receive
    the seq-jump contact-target cylinder geoms.
    """
    import types

    import mujoco
    import yaml

    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.deploy.sim_server import DialSim, DialSimConfig
    from dial_mpc_tpu.utils.io_utils import (
        get_example_path,
        load_dataclass_from_dict,
    )

    with open(get_example_path("unitree_go2_seq_jump_deploy.yaml")) as f:
        cfgd = yaml.safe_load(f)
    dial_cfg = load_dataclass_from_dict(DialConfig, cfgd)
    env_cfg = load_dataclass_from_dict(
        dial_envs.get_config(dial_cfg.env_name), cfgd, convert_list_to_array=True
    )
    sim_cfg = load_dataclass_from_dict(DialSimConfig, cfgd)
    sim_cfg.headless = True
    sim = DialSim(sim_cfg, env_cfg, dial_cfg, max_steps=1)
    try:
        scene = mujoco.MjvScene(sim.mj_model, maxgeom=1000)
        sim.viewer = types.SimpleNamespace(user_scn=scene)
        sim._init_env_overlay(dial_cfg, env_cfg)
        assert scene.ngeom > 0, "seq-jump contact targets were not drawn"
    finally:
        sim.viewer = None
        sim.close()


SIM_SCRIPT = """
import sys; sys.path.insert(0, {repo!r})
from dial_mpc_tpu.deploy.sim_server import DialSim, DialSimConfig
from dial_mpc_tpu.config.base_env_config import BaseEnvConfig
from dial_mpc_tpu.core.dial_config import DialConfig
sim = DialSim(
    DialSimConfig(robot_name="unitree_go2", scene_name="mjx_scene_force.xml",
                  sim_leg_control="torque", plot=False, record=False,
                  real_time_factor=1.0, sim_dt=0.005, sync_mode=True,
                  headless=True),
    BaseEnvConfig(dt=0.02, timestep=0.02),
    DialConfig(Hsample=16),
    max_steps=20,
)
try:
    sim.main_loop()
finally:
    sim.close()
print("SIM_DONE", sim.t)
"""


@pytest.mark.timeout(600)
def test_sim2sim_sync_integration(tmp_path):
    import jax

    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", SIM_SCRIPT.format(repo=REPO)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # wait for the sim server to create the shm segments
        deadline = time.time() + 60
        bus = None
        while time.time() < deadline:
            try:
                bus = ShmBus(nx=37, nu=12, n_acts=17, create=False)
                break
            except FileNotFoundError:
                time.sleep(0.2)
        if bus is None:
            proc.kill()
            out, _ = proc.communicate(timeout=30)
            raise AssertionError(f"sim server never created the shm bus:\n{out[-3000:]}")
        bus.close()

        import dial_mpc_tpu.envs as dial_envs
        from dial_mpc_tpu.core.dial_config import DialConfig
        from dial_mpc_tpu.deploy.planner_proc import MBDPublisher

        dial_cfg = DialConfig(
            env_name="unitree_go2_walk",
            Nsample=8,
            Hsample=16,
            Hnode=4,
            Ndiffuse=1,
            Ndiffuse_init=2,
        )
        env_cfg = dial_envs.get_config(dial_cfg.env_name)(kd=0.0)
        env = dial_envs.get_environment(dial_cfg.env_name, env_cfg)
        pub = MBDPublisher(env, env_cfg, dial_cfg)
        try:
            pub.main_loop(max_iters=60, verbose=False)
            t_sim = float(pub.bus.time[0])
            plan_t = float(pub.bus.plan_time[0])
            taus = np.array(pub.bus.tau)
        finally:
            pub.close()

        # the sync-mode sim advances exactly as plans arrive
        assert t_sim > 0.0, "sim clock never advanced"
        assert plan_t >= 0.0, "plan was never published"
        assert np.abs(taus).max() > 0.0, "planner published empty torques"
        out, _ = proc.communicate(timeout=120)
        assert "SIM_DONE" in out, out[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()
