"""Where does the solve's time go? Kernel rollouts vs planner glue.

Times three nested programs on the real chip (device_get-synchronized,
one measured transfer subtracted — see bench.py for why
block_until_ready cannot be trusted through the remote-TPU tunnel):

  1. full control_step        — env advance + shift + Ndiffuse anneal levels
  2. rollout_us_vmap alone    — the batched kernel rollouts (the FLOPs)
  3. reverse_once alone       — one anneal level (rollout + sampling/
                                spline/softmax/xbar glue)

Interpretation caveats (why naive subtraction can go NEGATIVE): the
standalone rollout/reverse_once programs must materialize ALL their
outputs to HBM (nothing downstream to dead-code-eliminate into), so they
are an UPPER bound on the same work inside control_step, where XLA keeps
only the reward/x_pos consumers live and overlaps glue with kernel grid
blocks. Current build (v5e, trot@2048): control_step with TWO anneal
levels runs 2.78 ms while ONE standalone fully-materialized rollout is
2.21 ms — i.e. kernel rollouts dominate and the planner glue + env
advance are hidden under them. Backs the roofline discussion in README.md.

Usage: python tools/glue_profile.py [example_name]   (default trot)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N_TIMED = 20


def timed(fn, *args):
    """Median-of-3 pipelined seconds per call, transfer-subtracted.

    The transfer probe must be a FRESH, never-fetched output: jax.Array
    caches its host copy (_npy_value), so re-fetching an already-fetched
    array times ~0 and the real per-round device_get (~10-30 ms on the
    tunnel) would stay inside the timed window, inflating every per-call
    figure by ~xfer/N_TIMED. Dispatch one extra call, let the device
    drain (block_until_ready under-blocks through the tunnel, hence the
    sleep), then time the pure readback of that new result.
    """
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + settle
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    meds = []
    for _ in range(3):
        out = fn(*args)
        probe = jax.tree.leaves(out)[0]
        jax.block_until_ready(probe)
        time.sleep(0.05)
        t0 = time.perf_counter()
        np.asarray(probe)
        xfer = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(N_TIMED):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        meds.append((time.perf_counter() - t0 - xfer) / N_TIMED)
    return float(np.median(meds))


def main():
    import dataclasses

    import yaml

    import dial_mpc_tpu.envs as dial_envs
    from dial_mpc_tpu.core.dial_config import DialConfig
    from dial_mpc_tpu.core.dial_core import MBDPI
    from dial_mpc_tpu.utils.io_utils import (
        get_example_path,
        load_dataclass_from_dict,
    )

    example = sys.argv[1] if len(sys.argv) > 1 else "unitree_go2_trot"
    with open(get_example_path(example + ".yaml")) as f:
        cfg_dict = yaml.safe_load(f)
    dial_cfg = load_dataclass_from_dict(DialConfig, cfg_dict)
    env_cfg = load_dataclass_from_dict(
        dial_envs.get_config(dial_cfg.env_name), cfg_dict,
        convert_list_to_array=True,
    )

    env = dial_envs.get_environment(dial_cfg.env_name, env_cfg)
    mbdpi = MBDPI(dial_cfg, env)
    nd = dial_cfg.Ndiffuse

    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    Y = jnp.zeros((dial_cfg.Hnode + 1, mbdpi.nu), dtype=jnp.float32)
    state, Y, rng, _ = mbdpi.control_step(state, Y, rng, nd)
    np.asarray(Y)

    t_full = timed(lambda: mbdpi.control_step(state, Y, rng, nd))

    us = mbdpi.node2u(
        jnp.zeros((dial_cfg.Nsample + 1, dial_cfg.Hnode + 1, mbdpi.nu))
    )
    t_roll = timed(lambda: mbdpi.rollout_us_vmap(state, us))

    factor = mbdpi.diffuse_factors(nd)[0]
    t_rev = timed(lambda: mbdpi.reverse_once_jit(state, rng, Y, factor))

    print(f"config: {example}  Nsample={dial_cfg.Nsample}  Ndiffuse={nd}")
    print(f"full control_step : {t_full * 1e3:7.2f} ms  ({1.0 / t_full:6.1f} Hz)")
    print(f"rollout_us_vmap   : {t_roll * 1e3:7.2f} ms  (x{nd} levels)")
    print(f"reverse_once      : {t_rev * 1e3:7.2f} ms")
    print(f"glue per level    : {(t_rev - t_roll) * 1e3:7.2f} ms "
          "(sampling + spline GEMMs + softmax + xbar)")
    print(f"advance + shift   : {(t_full - nd * t_rev) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
