"""Multi-host initialization helpers.

On a TPU pod slice, call :func:`init_distributed` once per host before
building the planner; the sample mesh then spans every chip in the slice
(ICI within hosts, DCN across) and `ShardedMBDPI` shards `Nsample` over
all of them. Single-process usage needs no initialization.

The planner's reductions are pure psum/pmax collectives, so multi-host
execution needs no further code changes — XLA routes them over ICI within
a slice. The actuation host (sim/real) remains a single-host process
attached via the shm bus to coordinator host 0.
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize with env-var fallbacks (no-op if single)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_sample_mesh():
    """1-D mesh over every addressable device in the job."""
    from dial_mpc_tpu.parallel.sharded import make_sample_mesh

    return make_sample_mesh(jax.devices())
