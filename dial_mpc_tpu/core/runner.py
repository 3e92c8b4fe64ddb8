"""Synchronous receding-horizon driver (the ``dial-mpc`` entry point).

Counterpart of the reference's dial_mpc/core/dial_core.py:175-333 `main`:
load a flat YAML into DialConfig + env config, build the env and planner,
run n_steps of receding-horizon control, dump artifacts.

TPU redesign: each control step is ONE compiled program
(MBDPI.control_step) — env advance, plan shift and the full annealing scan
stay on device; the host loop only extracts telemetry. The first step runs
a separately-compiled Ndiffuse_init-level program (static shapes, no
recompiles afterward).
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

import dial_mpc_tpu.envs as dial_envs
from dial_mpc_tpu.core.dial_config import DialConfig
from dial_mpc_tpu.core.dial_core import MBDPI
from dial_mpc_tpu.examples import examples
from dial_mpc_tpu.utils.io_utils import get_example_path, load_dataclass_from_dict
from dial_mpc_tpu.utils.telemetry import LatencyRecorder


def run(config_dict, progress=True, serve=False):
    """Run the sync receding-horizon loop; returns (summary dict)."""
    dial_config = load_dataclass_from_dict(DialConfig, config_dict)
    rng = jax.random.PRNGKey(seed=dial_config.seed)

    env_config_type = dial_envs.get_config(dial_config.env_name)
    env_config = load_dataclass_from_dict(
        env_config_type, config_dict, convert_list_to_array=True
    )
    env = dial_envs.get_environment(dial_config.env_name, env_config)
    # sharding: "none" (single device) or "mesh" (sample axis over all
    # devices; multi-host after parallel.distributed.init_distributed)
    sharding = config_dict.get("sharding", "none")
    if sharding == "mesh" and len(jax.devices()) > 1:
        from dial_mpc_tpu.parallel import ShardedMBDPI, make_sample_mesh

        mbdpi = ShardedMBDPI(dial_config, env, make_sample_mesh())
    else:
        mbdpi = MBDPI(dial_config, env)

    rng, rng_reset = jax.random.split(rng)
    state = jax.jit(env.reset)(rng_reset)
    rng, _rng_exp = jax.random.split(rng)  # keep the reference's stream order

    Y0 = jnp.zeros([dial_config.Hnode + 1, mbdpi.nu])

    rollout_states = []
    ctrls = []
    rews = []
    rews_plan = []
    predictions = []
    freqs = []
    latency = LatencyRecorder()

    try:
        from tqdm import tqdm

        iterator = tqdm(range(dial_config.n_steps), desc="Rollout", disable=not progress)
    except ImportError:  # pragma: no cover
        iterator = range(dial_config.n_steps)

    # pack all per-step telemetry into ONE device array so the host loop
    # costs a single transfer per step (remote-TPU links are latency-bound)
    @jax.jit
    def pack_telemetry(state, u_exec, info):
        ps = state.pipeline_state
        return jnp.concatenate(
            [
                ps.qpos,
                ps.qvel,
                ps.ctrl,
                u_exec,
                state.reward[None],
                info["rews"][-1].mean()[None],
                info["xbar"][-1].reshape(-1),
            ]
        )

    nq, nv, nu = env.mj_model.nq, env.mj_model.nv, env.mj_model.nu
    xbar_shape = (dial_config.Hsample + 1, env.mj_model.nbody - 1, 3)

    for t in iterator:
        n_diffuse = (
            dial_config.Ndiffuse_init if t == 0 else dial_config.Ndiffuse
        )
        u_exec = Y0[0]
        t0 = time.time()
        state, Y0, rng, info = mbdpi.control_step(state, Y0, rng, n_diffuse)
        jax.block_until_ready(Y0)
        elapsed = time.time() - t0

        host = np.asarray(pack_telemetry(state, u_exec, info))
        o = 0
        qpos_h = host[o : o + nq]; o += nq
        qvel_h = host[o : o + nv]; o += nv
        ctrl_h = host[o : o + nu]; o += nu
        u_h = host[o : o + nu]; o += nu
        reward_h = host[o]; o += 1
        rew_plan_h = host[o]; o += 1
        xbar_h = host[o:].reshape(xbar_shape)
        rollout_states.append((qpos_h, qvel_h, ctrl_h))
        ctrls.append(u_h)
        rews.append(float(reward_h))
        rews_plan.append(float(rew_plan_h))
        predictions.append(xbar_h)
        freqs.append(1.0 / max(elapsed, 1e-9))
        if t > 0:  # exclude the compile step from latency stats
            latency.add(elapsed)
        if hasattr(iterator, "set_postfix"):
            iterator.set_postfix(
                {"rew": f"{float(state.reward):.2e}", "freq": f"{freqs[-1]:.2f}"}
            )

    mean_rew = float(np.mean(rews))
    print(f"mean reward = {mean_rew:.2e}")
    print(latency.report("solve latency"))

    # ---- artifacts (reference: dial_core.py:277-323) ----
    os.makedirs(dial_config.output_dir, exist_ok=True)
    timestamp = time.strftime("%Y%m%d-%H%M%S")
    data = np.array(
        [
            np.concatenate([[i], q, qd, ctrl])
            for i, (q, qd, ctrl) in enumerate(rollout_states)
        ]
    )
    xdata = np.array(predictions)
    np.save(os.path.join(dial_config.output_dir, f"{timestamp}_states"), data)
    np.save(os.path.join(dial_config.output_dir, f"{timestamp}_predictions"), xdata)

    # standalone HTML trajectory viewer
    html_path = None
    try:
        from dial_mpc_tpu.viz.html_viewer import render_trajectory

        html_path = os.path.join(
            dial_config.output_dir, f"{timestamp}_visualization.html"
        )
        render_trajectory(env.mj_model, data[:, 1 : 1 + env.mj_model.nq], html_path)
        print(f"visualization written to {html_path}")
    except Exception as e:  # viz is best-effort
        print(f"[WARN] visualization skipped: {e}")

    if serve and html_path:
        # serve the viewer like the reference's Flask app (dial_core.py:325-329)
        import http.server

        class _Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                with open(html_path, "rb") as f:
                    self.wfile.write(f.read())

            def log_message(self, *a):
                pass

        print("serving visualization at http://localhost:5000 (Ctrl-C to stop)")
        try:
            http.server.HTTPServer(("", 5000), _Handler).serve_forever()
        except KeyboardInterrupt:
            pass

    return {
        "mean_reward": mean_rew,
        "rews": rews,
        "rews_plan": rews_plan,
        "freqs": freqs,
        "latency": latency.summary(),
        "states_path": os.path.join(
            dial_config.output_dir, f"{timestamp}_states.npy"
        ),
    }


def main():
    parser = argparse.ArgumentParser()
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--config", type=str, default=None)
    group.add_argument("--example", type=str, default=None)
    group.add_argument("--list-examples", action="store_true")
    parser.add_argument(
        "--custom-env", type=str, default=None, help="import path of a module that self-registers envs"
    )
    parser.add_argument(
        "--serve", action="store_true", help="serve the HTML viewer at :5000 after the run"
    )
    args = parser.parse_args()

    if args.list_examples:
        print("Examples:")
        for example in examples:
            print(f"  {example}")
        return

    if args.custom_env is not None:
        sys.path.append(os.getcwd())
        importlib.import_module(args.custom_env)

    if args.example is not None:
        config_path = get_example_path(args.example + ".yaml")
    else:
        config_path = args.config
    with open(config_path) as f:
        config_dict = yaml.safe_load(f)

    run(config_dict, serve=args.serve)


if __name__ == "__main__":
    main()
