"""Elliptic-cone constraint oracle tests vs CPU MuJoCo.

The calibration scene (sphere on plane) exercises all three solver zones
(top/separated, bottom/sticking, middle/sliding) for condim 3 and 6 at
impratio 1 and 10; qacc and constraint forces must match mj_forward.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from dial_mpc_tpu.physics import model as mlib
from dial_mpc_tpu.physics.forward import forward
from dial_mpc_tpu.physics.kinematics import replace


def _scene(condim, impratio):
    xml = f"""<mujoco>
    <option cone="elliptic" impratio="{impratio}"/>
    <worldbody>
    <geom type='plane' size='5 5 .1' friction='0.8 0.02 0.003'/>
    <body pos='0 0 0.095'><freejoint/>
      <geom type='sphere' size='0.1' condim='{condim}' friction='0.8 0.02 0.003'/>
    </body>
    </worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART.value
    # match our static solver cap so both sides run the same schedule
    mj.opt.iterations = 8
    mj.opt.ls_iterations = 8
    return mj


CASES = [
    # (seed, qvel_scale, spin) — sliding+spinning, sticking, sliding, rolling
    (0, 0.5, 3.0),
    (1, 0.001, 0.0),
    (3, 0.5, 0.0),
    (4, 1.0, -2.0),
]


@pytest.mark.parametrize("condim", [3, 6])
@pytest.mark.parametrize("impratio", [1.0, 10.0])
def test_elliptic_matches_mujoco(condim, impratio):
    mj = _scene(condim, impratio)
    m = mlib.put_model(mj, dtype=jnp.float64)
    fwd = jax.jit(lambda dd: forward(m, dd))
    for seed, scale, spin in CASES:
        md = mujoco.MjData(mj)
        rng = np.random.default_rng(seed)
        md.qvel[:] = rng.normal(0, scale, 6)
        md.qvel[3:] += spin
        mujoco.mj_forward(mj, md)
        dd = mlib.make_data(m, dtype=jnp.float64)
        dd = replace(dd, qpos=jnp.asarray(md.qpos), qvel=jnp.asarray(md.qvel))
        dd = fwd(dd)
        np.testing.assert_allclose(
            dd.qacc, md.qacc, atol=5e-3, err_msg=f"case {(seed, scale, spin)}"
        )
        np.testing.assert_allclose(dd.qfrc_constraint, md.qfrc_constraint, atol=2e-3)


def test_allegro_smooth_dynamics():
    """Allegro scene (eulerdamp + position servos): contact-free qacc parity."""
    mj = mujoco.MjModel.from_xml_path(
        "dial_mpc_tpu/models/wonik_allegro/scene_left.xml"
    )
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART.value
    m = mlib.put_model(mj, dtype=jnp.float64)
    fwd = jax.jit(lambda dd: forward(m, dd))
    md = mujoco.MjData(mj)
    rng = np.random.default_rng(0)
    md.qpos[:] = mj.key_qpos[0] + rng.normal(0, 0.01, mj.nq)
    a = 3  # free joint quaternion lives at qpos[3:7]
    md.qpos[a : a + 4] /= np.linalg.norm(md.qpos[a : a + 4])
    md.qvel[:] = rng.normal(0, 0.1, mj.nv)
    mujoco.mj_forward(mj, md)
    dd = mlib.make_data(m, dtype=jnp.float64)
    dd = replace(dd, qpos=jnp.asarray(md.qpos), qvel=jnp.asarray(md.qvel))
    dd = fwd(dd)
    scale = max(np.abs(md.qacc).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(dd.qacc) / scale, md.qacc / scale, atol=1e-7
    )
