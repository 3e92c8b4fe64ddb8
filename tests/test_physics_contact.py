"""Oracle tests: full contact dynamics and integration vs CPU MuJoCo.

CPU MuJoCo runs the same Newton soft-constraint solver (warmstart disabled
so both sides start from qacc_smooth); at the models' own solver settings
the two implementations should agree to float64 round-off on the scenes
whose collision manifolds we reproduce exactly (plane-sphere, plane-capsule).
"""

import dataclasses

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from conftest import load_mj
from dial_mpc_tpu.physics import model as mlib
from dial_mpc_tpu.physics.forward import forward, step
from dial_mpc_tpu.physics.kinematics import replace

# scenes whose active contact manifolds match CPU MuJoCo's colliders exactly
EXACT_SCENES = [
    "unitree_go2/mjx_scene_force.xml",
    "unitree_h1/mjx_scene_h1_walk.xml",
    "unitree_h1/mjx_scene_h1_loco.xml",
]


def _oracle_pair(scene):
    mj = load_mj(scene)
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART.value
    m = mlib.put_model(mj, dtype=jnp.float64)
    return mj, m


def _contact_state(mj, seed, depth=0.01):
    """Keyframe pose pushed into the ground + random joint/velocity noise."""
    rng = np.random.default_rng(seed)
    qpos = mj.key_qpos[0].copy()
    qpos[2] -= depth
    qpos[7:] += rng.normal(0, 0.05, mj.nq - 7)
    qvel = rng.normal(0, 0.2, mj.nv)
    ctrl = rng.normal(0, 3.0, mj.nu)
    return qpos, qvel, ctrl


@pytest.mark.parametrize("scene", EXACT_SCENES)
@pytest.mark.parametrize("seed", [0, 1])
def test_contact_forward_matches_mujoco(scene, seed):
    mj, m = _oracle_pair(scene)
    md = mujoco.MjData(mj)
    qpos, qvel, ctrl = _contact_state(mj, seed)
    md.qpos[:], md.qvel[:], md.ctrl[:] = qpos, qvel, ctrl
    mujoco.mj_forward(mj, md)
    assert md.ncon > 0, "oracle state should be in contact"

    d = mlib.make_data(m, dtype=jnp.float64)
    d = replace(
        d,
        qpos=jnp.asarray(qpos),
        qvel=jnp.asarray(qvel),
        ctrl=jnp.asarray(ctrl),
    )
    d = jax.jit(lambda d: forward(m, d))(d)

    active = int((d.contact.dist < d.contact.includemargin).sum())
    assert active == md.ncon
    np.testing.assert_allclose(d.qacc_smooth, md.qacc_smooth, atol=1e-8)
    np.testing.assert_allclose(d.qfrc_constraint, md.qfrc_constraint, atol=1e-7)
    np.testing.assert_allclose(d.qacc, md.qacc, atol=1e-7)


@pytest.mark.parametrize("scene", EXACT_SCENES)
def test_step_trajectory_matches_mujoco(scene):
    """50 Euler steps under sinusoidal ctrl track mj_step at f64 precision."""
    mj, m = _oracle_pair(scene)
    md = mujoco.MjData(mj)
    md.qpos[:] = mj.key_qpos[0]
    nsteps = 50

    d = mlib.make_data(m, dtype=jnp.float64)
    d = replace(d, qpos=jnp.asarray(md.qpos))
    step_fn = jax.jit(lambda d: step(m, d))

    t = np.arange(nsteps) * mj.opt.timestep
    ctrls = 2.0 * np.sin(2 * np.pi * 1.5 * t)[:, None] * np.ones(mj.nu)

    for i in range(nsteps):
        md.ctrl[:] = ctrls[i]
        mujoco.mj_step(mj, md)
        d = replace(d, ctrl=jnp.asarray(ctrls[i]))
        d = step_fn(d)

    # at the models' truncated solver settings (iterations=2) the line-search
    # details differ between implementations, so trajectories drift at the
    # sub-millimeter level over 50 steps; the strict parity check is the
    # per-state forward test above.
    np.testing.assert_allclose(d.qpos, md.qpos, atol=2e-3)
    np.testing.assert_allclose(d.qvel, md.qvel, atol=6e-2)


@pytest.mark.parametrize(
    "scene",
    [
        "unitree_go2/mjx_scene_force_crate.xml",
        "unitree_h1/mjx_scene_h1_push_crate.xml",
    ],
)
def test_crate_scene_box_rests_on_floor(scene):
    """Approximate box manifolds: the crate must rest stably (not sink/launch).

    MuJoCo CPU uses exact box colliders so trajectories are not bitwise
    comparable; this checks the physically meaningful invariant instead.
    """
    mj, m = _oracle_pair(scene)
    d = mlib.make_data(m, dtype=jnp.float64)
    d = replace(d, qpos=jnp.asarray(mj.key_qpos[0], dtype=jnp.float64))
    step_fn = jax.jit(lambda d: step(m, d))
    free_qadr = [mj.jnt_qposadr[j] for j in range(mj.njnt) if mj.jnt_type[j] == 0]
    z0 = [float(d.qpos[a + 2]) for a in free_qadr]
    for _ in range(100):
        d = step_fn(d)
    assert bool(jnp.all(jnp.isfinite(d.qpos))), scene
    # with zero ctrl the robot sags, but nothing may launch upward or blow up
    for a, z_init in zip(free_qadr, z0):
        z = float(d.qpos[a + 2])
        assert -0.2 < z - z_init < 0.05, (scene, a, z_init, z)
    assert float(jnp.abs(d.qvel).max()) < 10.0
