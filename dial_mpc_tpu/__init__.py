"""dial_mpc_tpu: a TPU-native sampling-based MPC framework.

Re-implements the capabilities of DIAL-MPC (arXiv 2409.15610) as an
idiomatic JAX/XLA/Pallas/pjit stack:

- ``dial_mpc_tpu.physics``: batched rigid-body dynamics engine with MuJoCo
  semantics (the reference leaned on brax+MJX; here the engine is built
  in-house, TPU-first: static shapes, dense small-matrix linear algebra
  batched over the sample axis, zero host round-trips inside a solve).
- ``dial_mpc_tpu.core``: the DIAL-MPC annealed MPPI planner compiled as a
  single XLA program per control step.
- ``dial_mpc_tpu.envs``: task environments (Go2, H1, Allegro).
- ``dial_mpc_tpu.parallel``: device-mesh sharding of the sample axis.
- ``dial_mpc_tpu.deploy``: async planner/sim/real runtime over shared memory.
"""

__version__ = "0.1.0"
