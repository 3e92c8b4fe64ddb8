"""Benchmark: Go2 trot DIAL-MPC solve rate on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Hz", "vs_baseline": N}

Baseline: the reference runs Nsample=2048, Ndiffuse=2 at a 50 Hz control
budget on a CUDA GPU (reference configs: examples/unitree_go2_trot.yaml,
dt: 0.02). vs_baseline is solve_hz / 50.
"""

import json
import time

import jax
import jax.numpy as jnp

NSAMPLE = 2048
NDIFFUSE = 2
BASELINE_HZ = 50.0


def main():
    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.core.dial_core import MBDPI

    cfg = DialConfig(
        env_name="unitree_go2_walk",
        Nsample=NSAMPLE,
        Hsample=16,
        Hnode=4,
        Ndiffuse=NDIFFUSE,
        temp_sample=0.05,
    )
    env_cfg_cls = dial_envs.get_config(cfg.env_name)
    env = dial_envs.get_environment(cfg.env_name, env_cfg_cls(kd=0.0, default_vx=0.8, ramp_up_time=1.0))
    mbdpi = MBDPI(cfg, env)

    import numpy as np

    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    Y = jnp.zeros((cfg.Hnode + 1, mbdpi.nu), dtype=jnp.float32)

    # warmup (compile both programs)
    state, Y, rng, _ = mbdpi.control_step(state, Y, rng, NDIFFUSE)
    np.asarray(Y)
    state, Y, rng, _ = mbdpi.control_step(state, Y, rng, NDIFFUSE)
    np.asarray(Y)

    # one host<->device transfer, measured so it can be subtracted
    t0 = time.perf_counter()
    np.asarray(Y)
    xfer_s = time.perf_counter() - t0

    n_timed = 20

    # pipelined: issue n_timed dispatches, fetch the final plan. The fetch
    # (device_get) is the synchronization point — block_until_ready has been
    # observed to under-block through the remote-TPU tunnel — and one
    # measured transfer is subtracted. Dispatch overlaps device compute, so
    # this approximates pure device throughput (what a co-located deploy
    # host would see).
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state, Y, rng, _ = mbdpi.control_step(state, Y, rng, NDIFFUSE)
    np.asarray(Y)
    pipelined_hz = n_timed / max(time.perf_counter() - t0 - xfer_s, 1e-9)

    # blocked: full host<->device round trip per step (inflated by the
    # ~10-30 ms/step tunnel transfer when the TPU is remote; honest on
    # co-located hardware).
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state, Y, rng, _ = mbdpi.control_step(state, Y, rng, NDIFFUSE)
        np.asarray(Y)
    blocked_hz = n_timed / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": f"go2_trot_solve_hz_nsample{NSAMPLE}_ndiffuse{NDIFFUSE}",
                "value": round(pipelined_hz, 2),
                "unit": "Hz",
                "vs_baseline": round(pipelined_hz / BASELINE_HZ, 3),
                "method": "pipelined (20 dispatches, device_get sync, one transfer subtracted)",
                "blocked_hz": round(blocked_hz, 2),
                "blocked_method": "device_get per step (includes per-step host round trip)",
            }
        )
    )


if __name__ == "__main__":
    main()
