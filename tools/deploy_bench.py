"""Deploy-tick latency benchmark: the async planner loop against the shm bus.

Measures what a co-located deploy host experiences per tick of
`dial_mpc_tpu.deploy.planner_proc.MBDPublisher.main_loop`: solve +
spline/act extraction + the single batched `device_get` the bus needs.
The sim host is replaced by a pre-seeded static state on the bus — the
planner's per-tick cost does not depend on the state values, and the
async protocol reads state/time fresh each tick either way, so this
isolates the planner tick from sim-host scheduling noise. (The
two-process sim2sim integration itself is pinned in tests/test_deploy.py.)

The first tick carries the device compile and is excluded by
MBDPublisher itself (steady-state histogram only). On the remote-TPU
tunnel the per-tick device_get adds ~30 ms that co-located hardware
does not pay; README.md quotes both numbers.

Usage: python tools/deploy_bench.py [example] [ticks] [nsample]
       (default: unitree_go2_seq_jump_deploy, 300, the YAML's Nsample;
       nsample overrides it, e.g. 8192 for the BASELINE.md north-star
       shape)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import yaml


def main():
    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.deploy.planner_proc import MBDPublisher
    from dial_mpc_tpu.deploy.shm import ShmBus
    from dial_mpc_tpu.utils.io_utils import (
        get_example_path,
        load_dataclass_from_dict,
    )

    example = sys.argv[1] if len(sys.argv) > 1 else "unitree_go2_seq_jump_deploy"
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    with open(get_example_path(example + ".yaml")) as f:
        config_dict = yaml.safe_load(f)
    dial_config = load_dataclass_from_dict(DialConfig, config_dict)
    if len(sys.argv) > 3:
        import dataclasses

        dial_config = dataclasses.replace(dial_config, Nsample=int(sys.argv[3]))
    env_config = load_dataclass_from_dict(
        dial_envs.get_config(dial_config.env_name), config_dict,
        convert_list_to_array=True,
    )
    env = dial_envs.get_environment(dial_config.env_name, env_config)

    nx = env.mj_model.nq + env.mj_model.nv
    bus = ShmBus(nx=nx, nu=env.mj_model.nu, n_acts=dial_config.Hsample + 1,
                 create=True)
    try:
        key = env.mj_model.keyframe("home") if env.mj_model.nkey else None
        if key is not None:
            bus.state[: env.mj_model.nq] = key.qpos
        pub = MBDPublisher(env, env_config, dial_config,
                           sharding=config_dict.get("sharding", "none"))
        try:
            # +1: the compile tick is excluded from the histogram
            pub.main_loop(max_iters=ticks + 1, verbose=False)
            s = pub.last_latency
            print(
                f"{example}: Nsample={dial_config.Nsample} "
                f"Ndiffuse={dial_config.Ndiffuse} n={s['n']} "
                f"p50={s['p50_ms']:.1f}ms p90={s['p90_ms']:.1f}ms "
                f"p99={s['p99_ms']:.1f}ms max={s['max_ms']:.1f}ms"
            )
        finally:
            pub.close()
    finally:
        bus.close()


if __name__ == "__main__":
    main()
