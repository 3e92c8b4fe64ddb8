"""Pallas kernels vs XLA reference paths (CPU interpret mode, tiny batch).

These are the only tests that turn the kernels on under the CPU test
config; everything else runs the XLA reference implementations.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from dial_mpc_tpu.physics import model as mlib
from dial_mpc_tpu.physics import solver
from dial_mpc_tpu.physics.forward import step as fstep


@pytest.fixture(autouse=True)
def _free_compiled_programs():
    """Release compiled programs between tests (see test_engine_kernel.py:
    accumulated interpret-mode kernels have aborted the XLA:CPU runner)."""
    yield
    jax.clear_caches()
    solver._CORE_CACHE.clear()



@pytest.fixture
def go2_batch():
    mj = mujoco.MjModel.from_xml_path(
        "dial_mpc_tpu/models/unitree_go2/mjx_scene_force.xml"
    )
    m = mlib.put_model(mj)
    d0 = mlib.make_data(m)
    rng = np.random.default_rng(0)
    B = 4
    qpos = np.tile(mj.key_qpos[0], (B, 1))
    qpos[:, 2] -= 0.01
    qpos += rng.normal(0, 0.02, qpos.shape)
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    dB = dataclasses.replace(
        dB,
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(rng.normal(0, 0.3, (B, mj.nv)), jnp.float32),
        ctrl=jnp.asarray(rng.normal(0, 5, (B, mj.nu)), jnp.float32),
    )
    return m, dB


def test_pallas_solver_matches_xla(go2_batch, monkeypatch):
    m, dB = go2_batch
    solver._CORE_CACHE.clear()
    monkeypatch.setenv("DIAL_MPC_PALLAS", "1")
    out_p = jax.jit(jax.vmap(functools.partial(fstep, m)))(dB)
    solver._CORE_CACHE.clear()
    monkeypatch.setenv("DIAL_MPC_PALLAS", "0")
    out_x = jax.jit(lambda d: jax.vmap(functools.partial(fstep, m))(d))(dB)
    np.testing.assert_allclose(out_p.qpos, out_x.qpos, atol=1e-6)
    np.testing.assert_allclose(out_p.qvel, out_x.qvel, atol=1e-4)
