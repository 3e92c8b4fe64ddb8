"""Oracle tests: smooth (contact-free) dynamics vs CPU MuJoCo.

Every intermediate field of the pipeline (kinematics -> com -> CRB -> RNE)
is compared against mujoco.mj_forward at float64 precision on randomized
configurations of each shipped robot model.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from conftest import load_mj
from dial_mpc_tpu.physics import model as mlib
from dial_mpc_tpu.physics import kinematics as klib
from dial_mpc_tpu.physics import smooth as slib

SCENES = [
    "unitree_go2/mjx_scene_force.xml",
    "unitree_go2/mjx_scene_force_crate.xml",
    "unitree_h1/mjx_scene_h1_walk.xml",
    "unitree_h1/mjx_scene_h1_push_crate.xml",
    "unitree_h1/mjx_scene_h1_loco.xml",
    "wonik_allegro/scene_left.xml",
]


def _random_state(mj, seed):
    rng = np.random.default_rng(seed)
    qpos = mj.qpos0.copy() + rng.normal(0, 0.1, mj.nq)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:  # free: renormalize quaternion
            a = mj.jnt_qposadr[j] + 3
            qpos[a : a + 4] /= np.linalg.norm(qpos[a : a + 4])
    qvel = rng.normal(0, 0.5, mj.nv)
    return qpos, qvel


@jax.jit
def _smooth_pipeline(m, d):
    d = klib.kinematics(m, d)
    d = klib.com_pos(m, d)
    d = klib.com_vel(m, d)
    d = slib.crb(m, d)
    d = slib.rne(m, d)
    return d


@pytest.mark.parametrize("scene", SCENES)
@pytest.mark.parametrize("seed", [0, 1])
def test_smooth_dynamics_matches_mujoco(scene, seed):
    mj = load_mj(scene)
    md = mujoco.MjData(mj)
    qpos, qvel = _random_state(mj, seed)
    md.qpos[:] = qpos
    md.qvel[:] = qvel
    mujoco.mj_forward(mj, md)

    m = mlib.put_model(mj, dtype=jnp.float64)
    d = mlib.make_data(m, dtype=jnp.float64)
    d = klib.replace(d, qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    d = _smooth_pipeline(m, d)

    np.testing.assert_allclose(d.xpos, md.xpos, atol=1e-9)
    # quaternion sign is arbitrary
    np.testing.assert_allclose(np.abs(d.xquat), np.abs(md.xquat), atol=1e-8)
    np.testing.assert_allclose(d.xipos, md.xipos, atol=1e-9)
    np.testing.assert_allclose(d.ximat, md.ximat.reshape(-1, 3, 3), atol=1e-8)
    np.testing.assert_allclose(d.geom_xpos, md.geom_xpos, atol=1e-9)
    if mj.nsite:
        np.testing.assert_allclose(d.site_xpos, md.site_xpos, atol=1e-9)
        np.testing.assert_allclose(
            d.site_xmat, md.site_xmat.reshape(-1, 3, 3), atol=1e-8
        )
    np.testing.assert_allclose(d.xanchor, md.xanchor, atol=1e-9)
    np.testing.assert_allclose(d.xaxis, md.xaxis, atol=1e-9)
    np.testing.assert_allclose(d.subtree_com, md.subtree_com, atol=1e-9)
    np.testing.assert_allclose(d.cdof, md.cdof, atol=1e-7)
    np.testing.assert_allclose(d.cvel, md.cvel, atol=1e-7)
    np.testing.assert_allclose(d.cdof_dot, md.cdof_dot, atol=1e-7)

    qm = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, md, qm) if _fullm_takes_data() else mujoco.mj_fullM(
        mj, qm, md.qM
    )
    np.testing.assert_allclose(d.qM, qm, atol=1e-8)
    np.testing.assert_allclose(d.qfrc_bias, md.qfrc_bias, atol=1e-7)


def _fullm_takes_data():
    import inspect

    doc = mujoco.mj_fullM.__doc__ or ""
    return "MjData" in doc
