"""TPU-native rigid-body physics engine with MuJoCo semantics.

The reference framework (LeCAR-Lab/dial-mpc) obtained physics from
third-party brax + mujoco-mjx (see /root/reference SURVEY §L1). This package
is a from-scratch JAX implementation of the same pipeline, designed for
batched rollout on TPU:

- all shapes static (fixed contact/constraint counts derived at model
  load time), so one compiled program serves every rollout;
- dense nv x nv linear algebra (nv <= ~30 for the supported robots),
  batched over thousands of samples — XLA maps the batched matmuls and
  Cholesky factorizations onto the MXU;
- pipeline stages mirror MuJoCo's mj_forward so each intermediate field
  can be verified against CPU MuJoCo as a numerical oracle.
"""

from dial_mpc_tpu.physics.model import Model, Data, put_model, make_data
from dial_mpc_tpu.physics.forward import forward, step

__all__ = ["Model", "Data", "put_model", "make_data", "forward", "step"]
