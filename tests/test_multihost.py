"""Multi-host (multi-process) mesh: DCN-spanning collectives correctness.

Two OS processes, each owning 4 virtual CPU devices, form one 8-device
global mesh via ``jax.distributed`` (``parallel.distributed.init_distributed``)
— the same topology as a multi-host TPU pod (ICI within a process's
devices, DCN across). The sharded planner's control step must produce the
same plan as a single-process 8-device mesh: the per-sample RNG layout is
mesh- and process-invariant by construction, with only f32 reduction-order
noise from different psum trees.

Reference parity note: the reference has no multi-host story at all
(SURVEY §5.8 — its only transport is single-host POSIX shm); this is the
TPU-native replacement's correctness gate.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("DIAL_MPC_PALLAS", "0")
os.environ.setdefault("DIAL_MPC_ENGINE", "xla")
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", {cache!r})

from dial_mpc_tpu.parallel.distributed import init_distributed, global_sample_mesh

pid = int(sys.argv[1])
init_distributed("localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
import numpy as np
import dial_mpc_tpu.envs as dial_envs
from dial_mpc_tpu.core.dial_config import DialConfig
from dial_mpc_tpu.parallel import ShardedMBDPI

cfg = DialConfig(env_name="unitree_go2_walk", Nsample=16, Hsample=16, Hnode=4)
env = dial_envs.get_environment(cfg.env_name, dial_envs.get_config(cfg.env_name)(kd=0.0))
planner = ShardedMBDPI(cfg, env, global_sample_mesh())
state = jax.jit(env.reset)(jax.random.PRNGKey(1))
Y = jnp.zeros((cfg.Hnode + 1, planner.nu))
state, Y, rng, info = planner.control_step(state, Y, jax.random.PRNGKey(0), 2)
# Y is replicated; every process holds the full value in its local shards
Y_local = np.asarray(Y.addressable_shards[0].data)
np.save(sys.argv[2], Y_local)
print("WORKER_OK", pid, flush=True)
"""


@pytest.mark.timeout(900)
def test_two_process_mesh_matches_single_process(tmp_path):
    import jax
    import jax.numpy as jnp

    port = 29571
    cache = os.path.abspath(os.path.join(REPO, ".jax_cache"))
    script = WORKER.format(
        repo=REPO,
        tests=os.path.dirname(os.path.abspath(__file__)),
        cache=cache,
        port=port,
    )
    outs = [str(tmp_path / f"Y{i}.npy") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c", script, str(i), outs[i]],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        logs.append(out)
    for i, (p, out) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out

    Y0 = np.load(outs[0])
    Y1 = np.load(outs[1])
    np.testing.assert_allclose(Y0, Y1, atol=1e-12)  # SPMD consistency

    # single-process 8-device reference
    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.parallel import ShardedMBDPI, make_sample_mesh

    cfg = DialConfig(env_name="unitree_go2_walk", Nsample=16, Hsample=16, Hnode=4)
    env = dial_envs.get_environment(
        cfg.env_name, dial_envs.get_config(cfg.env_name)(kd=0.0)
    )
    planner = ShardedMBDPI(cfg, env, make_sample_mesh())
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    Y = jnp.zeros((cfg.Hnode + 1, planner.nu))
    _, Y_ref, _, _ = planner.control_step(state, Y, jax.random.PRNGKey(0), 2)
    np.testing.assert_allclose(Y0, np.asarray(Y_ref), atol=1e-4)
