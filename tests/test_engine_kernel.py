"""Engine mega-kernel vs XLA reference step — parity on every scene.

The lane-major Pallas step kernel (physics/engine_pallas.py) is the
component behind the headline solve rate; these tests pin it to the XLA
reference pipeline (physics/forward.py) on all six shipped scenes, from
contact-rich states, in CPU interpret mode at float64. A Mosaic-side or
lane-algebra regression shows up here as a numeric mismatch; a zone/branch
error in the elliptic cone path shows up in the Allegro long-rollout test.

(Reference parity target: the reference has no such kernel — its physics
is brax/MJX imports; this suite plays the role MJX's own unit tests play
for the reference stack.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import load_mj
from dial_mpc_tpu.physics import model as mlib
from dial_mpc_tpu.physics import engine_pallas
from dial_mpc_tpu.physics.forward import step as xla_step
from dial_mpc_tpu.physics.kinematics import replace as drep

SCENES = [
    "unitree_go2/mjx_scene_force.xml",  # go2 walk + seq_jump
    "unitree_go2/mjx_scene_force_crate.xml",  # go2 crate
    "unitree_h1/mjx_scene_h1_walk.xml",
    "unitree_h1/mjx_scene_h1_push_crate.xml",
    "unitree_h1/mjx_scene_h1_loco.xml",
    "wonik_allegro/scene_left.xml",  # elliptic cone, position actuators
]

B = 8
BLOCK = 8  # tiny lane block: interpret mode has no 128-lane minimum
SETTLE = 5  # XLA steps rolled first so contacts are active


@pytest.fixture(autouse=True)
def _free_compiled_programs():
    """Release each test's compiled programs before the next one.

    The interpret-mode mega-kernel programs are enormous (tens of
    thousands of traced ops per scene at f64); letting six scenes' worth
    accumulate in one process has pushed the suite past 95 GB RSS and
    aborted the XLA:CPU runner. Recompiles hit the persistent cache.
    """
    yield
    jax.clear_caches()
    engine_pallas._CORE_CACHE.clear()



def _random_ctrl(mj, rng, shape):
    """Random controls respecting ctrlrange for position actuators."""
    lo = mj.actuator_ctrlrange[:, 0].copy()
    hi = mj.actuator_ctrlrange[:, 1].copy()
    unlimited = mj.actuator_ctrllimited == 0
    lo[unlimited], hi[unlimited] = -8.0, 8.0
    return rng.uniform(lo, hi, shape + (mj.nu,))


def _contact_rich_batch(scene, seed=0):
    """(m, dB): batch of B states settled into contact by the XLA path."""
    mj = load_mj(scene)
    # reduced Newton schedule: the kernel unrolls the solver per iteration,
    # and interpret-mode compile cost scales with it (Allegro's 8x8 schedule
    # traces for >25 min). The zone/branch formulas under test are identical
    # at any iteration count, and BOTH paths run the same reduced schedule.
    mj.opt.iterations = min(mj.opt.iterations, 2)
    mj.opt.ls_iterations = min(mj.opt.ls_iterations, 4)
    m = mlib.put_model(mj)
    rng = np.random.default_rng(seed)
    q0 = mj.key_qpos[0] if mj.nkey else mj.qpos0
    qpos = np.tile(np.asarray(q0, np.float64), (B, 1))
    qpos += rng.normal(0, 0.01, qpos.shape)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:  # free joint: renormalize quaternion
            a = mj.jnt_qposadr[j] + 3
            qpos[:, a : a + 4] /= np.linalg.norm(
                qpos[:, a : a + 4], axis=1, keepdims=True
            )
    d0 = mlib.make_data(m, dtype=jnp.float64)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    dB = dataclasses.replace(
        dB,
        qpos=jnp.asarray(qpos),
        qvel=jnp.asarray(rng.normal(0, 0.2, (B, mj.nv))),
    )
    # one compiled XLA step serves settling AND the reference comparison
    step_b = jax.jit(jax.vmap(lambda d, c: xla_step(m, drep(d, ctrl=c))))
    for _ in range(SETTLE):
        dB = step_b(dB, jnp.asarray(_random_ctrl(mj, rng, (B,))))
    assert bool(jnp.isfinite(dB.qpos).all()), "settle rollout diverged"
    return mj, m, dB, step_b


@pytest.mark.parametrize("scene", SCENES)
def test_engine_kernel_matches_xla(scene):
    mj, m, dB, step_b = _contact_rich_batch(scene)
    rng = np.random.default_rng(1)
    ctrl = jnp.asarray(_random_ctrl(mj, rng, (B,)))

    core = engine_pallas.step_core_for(m, block=BLOCK)
    outs_k = jax.jit(jax.vmap(core))(dB.qpos, dB.qvel, ctrl)

    d_x = step_b(dB, ctrl)

    np.testing.assert_allclose(
        np.asarray(outs_k[0]), np.asarray(d_x.qpos), atol=1e-9, rtol=1e-9,
        err_msg=f"{scene}: qpos mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(outs_k[1]), np.asarray(d_x.qvel), atol=1e-7, rtol=1e-7,
        err_msg=f"{scene}: qvel mismatch",
    )
    # derived products the reward stacks consume
    nbody1 = m.nbody - 1
    np.testing.assert_allclose(
        np.asarray(outs_k[4]).reshape(B, nbody1, 3),
        np.asarray(d_x.x_pos),
        atol=1e-9, rtol=1e-9, err_msg=f"{scene}: x_pos mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(outs_k[6]).reshape(B, nbody1, 3),
        np.asarray(d_x.xd_vel),
        atol=1e-7, rtol=1e-7, err_msg=f"{scene}: xd_vel mismatch",
    )
    if m.nsite:
        np.testing.assert_allclose(
            np.asarray(outs_k[2]).reshape(B, m.nsite, 3),
            np.asarray(d_x.site_xpos),
            atol=1e-9, rtol=1e-9, err_msg=f"{scene}: site_xpos mismatch",
        )
    if m.ncon:
        np.testing.assert_allclose(
            np.asarray(outs_k[8])[:, : m.ncon],
            np.asarray(d_x.contact.dist),
            atol=1e-9, rtol=1e-9, err_msg=f"{scene}: contact dist mismatch",
        )


@pytest.mark.parametrize("scene", SCENES)
def test_engine_kernel_lanes2d_matches_xla(scene, monkeypatch):
    """2-D (S, W) vreg-layout kernel vs XLA reference, all scenes.

    S=2, W=3 keeps interpret-mode cost tiny while exercising the layout
    reshape/padding boundary: ceil(B/W) = 3 >= S = 2 (so the batch-size
    cap keeps both sublanes), and gran = S*W = 6 does not divide B = 8,
    so the batch is padded (by repeating the last sample) to 12 and
    un-padded on the way out. The in-kernel algebra is shared with the
    1-D layout, so this pins the dispatch/reshape path specifically (the
    1-D path is pinned above).
    """
    monkeypatch.setenv("DIAL_MPC_LANES2D", "2")
    monkeypatch.setenv("DIAL_MPC_LANE_W", "3")
    mj, m, dB, step_b = _contact_rich_batch(scene)
    rng = np.random.default_rng(1)
    ctrl = jnp.asarray(_random_ctrl(mj, rng, (B,)))

    core = engine_pallas.step_core_for(m, block=BLOCK)
    outs_k = jax.jit(jax.vmap(core))(dB.qpos, dB.qvel, ctrl)

    d_x = step_b(dB, ctrl)

    np.testing.assert_allclose(
        np.asarray(outs_k[0]), np.asarray(d_x.qpos), atol=1e-9, rtol=1e-9,
        err_msg=f"{scene}: lanes2d qpos mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(outs_k[1]), np.asarray(d_x.qvel), atol=1e-7, rtol=1e-7,
        err_msg=f"{scene}: lanes2d qvel mismatch",
    )
    nbody1 = m.nbody - 1
    np.testing.assert_allclose(
        np.asarray(outs_k[4]).reshape(B, nbody1, 3),
        np.asarray(d_x.x_pos),
        atol=1e-9, rtol=1e-9, err_msg=f"{scene}: lanes2d x_pos mismatch",
    )
    if m.ncon:
        np.testing.assert_allclose(
            np.asarray(outs_k[8])[:, : m.ncon],
            np.asarray(d_x.contact.dist),
            atol=1e-9, rtol=1e-9, err_msg=f"{scene}: lanes2d contact dist mismatch",
        )


def test_lane_w_validation(monkeypatch):
    """DIAL_MPC_LANE_W=0 must raise, not ZeroDivisionError deep in dispatch."""
    monkeypatch.setenv("DIAL_MPC_LANE_W", "0")
    with pytest.raises(ValueError, match="LANE_W"):
        engine_pallas._lane_w()
    monkeypatch.setenv("DIAL_MPC_LANES2D", "-1")
    with pytest.raises(ValueError, match="LANES2D"):
        engine_pallas._lanes2d()


def test_elliptic_long_rollout_parity():
    """Allegro (elliptic cone): 200-step kernel rollout stays finite and
    tracks the XLA path. Guards the cone zone logic over long horizons."""
    scene = "wonik_allegro/scene_left.xml"
    mj, m, dB, step_b = _contact_rich_batch(scene, seed=2)
    rng = np.random.default_rng(3)
    n_steps = 200
    # smooth position-target stream around the keyframe grip
    ctrls = np.asarray(_random_ctrl(mj, rng, (n_steps,)))
    home = np.asarray(mj.key_ctrl[0] if mj.nkey else np.zeros(mj.nu))
    ctrls = 0.9 * home + 0.1 * ctrls

    core = engine_pallas.step_core_for(m, block=BLOCK)
    core_b = jax.jit(jax.vmap(core))

    qp_k, qv_k = dB.qpos, dB.qvel
    d_x = dB
    for i in range(n_steps):
        c = jnp.broadcast_to(jnp.asarray(ctrls[i]), (B, mj.nu))
        outs = core_b(qp_k, qv_k, c)
        qp_k, qv_k = outs[0], outs[1]
        d_x = step_b(d_x, c)
        assert bool(jnp.isfinite(qp_k).all()), f"kernel qpos non-finite at step {i}"
        assert bool(jnp.isfinite(qv_k).all()), f"kernel qvel non-finite at step {i}"
    # trajectories track (f64: divergence here means a branch/zone mismatch,
    # not accumulated roundoff)
    np.testing.assert_allclose(
        np.asarray(qp_k), np.asarray(d_x.qpos), atol=1e-6, rtol=1e-6
    )


@pytest.mark.parametrize("lanes2d", ["0", "2"])
def test_fused_multistep_matches_sequential(lanes2d, monkeypatch):
    """n_steps-fused kernel (in-kernel fori_loop, VMEM carry) must match
    n_steps sequential single-step kernel calls on every output — the
    fused path is what pipeline_step runs on TPU (n_frames substeps per
    env step), in BOTH lane layouts (2-D is the TPU default). Tolerance
    (not bitwise): compiling the step body inside a fori_loop permits
    different reassociation (measured ~2e-9 at f64)."""
    if lanes2d != "0":
        monkeypatch.setenv("DIAL_MPC_LANES2D", lanes2d)
        monkeypatch.setenv("DIAL_MPC_LANE_W", "3")
    scene = "unitree_go2/mjx_scene_force.xml"
    mj, m, dB, step_b = _contact_rich_batch(scene, seed=4)
    rng = np.random.default_rng(5)
    ctrl = jnp.asarray(_random_ctrl(mj, rng, (B,)))
    n_steps = 2

    core1 = engine_pallas.step_core_for(m, block=BLOCK)
    coreN = engine_pallas.step_core_for(m, block=BLOCK, n_steps=n_steps)
    f1 = jax.jit(jax.vmap(core1))
    fN = jax.jit(jax.vmap(coreN))

    qp, qv = dB.qpos, dB.qvel
    for _ in range(n_steps):
        o = f1(qp, qv, ctrl)
        qp, qv = o[0], o[1]
    oN = fN(dB.qpos, dB.qvel, ctrl)
    for i, (seq, fused) in enumerate(zip(o, oN)):
        np.testing.assert_allclose(
            np.asarray(seq), np.asarray(fused), atol=1e-7, rtol=1e-7,
            err_msg=f"fused output {i} != sequential",
        )


@pytest.mark.parametrize("lanes2d", ["0", "2"])
def test_unbatched_core_matches_xla(lanes2d, monkeypatch):
    """The UNBATCHED core call — the planner's single env advance inside
    control_step — dispatches to the kernel as a batch of one (one grid
    block) rather than the scalar XLA step whose serialized small ops
    measured 2.16 ms on TPU. Pin that path, in both lane layouts, against
    the XLA reference step: batch-of-one padding/unpack must not corrupt
    the single sample."""
    if lanes2d != "0":
        monkeypatch.setenv("DIAL_MPC_LANES2D", lanes2d)
        monkeypatch.setenv("DIAL_MPC_LANE_W", "3")
    scene = "unitree_go2/mjx_scene_force.xml"
    mj, m, dB, step_b = _contact_rich_batch(scene, seed=6)
    rng = np.random.default_rng(7)
    ctrl = jnp.asarray(_random_ctrl(mj, rng, (B,)))

    core = engine_pallas.step_core_for(m, block=BLOCK)
    outs_1 = jax.jit(core)(dB.qpos[0], dB.qvel[0], ctrl[0])

    d_x = step_b(dB, ctrl)
    np.testing.assert_allclose(
        np.asarray(outs_1[0]), np.asarray(d_x.qpos[0]), atol=1e-9, rtol=1e-9,
        err_msg="unbatched qpos mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(outs_1[1]), np.asarray(d_x.qvel[0]), atol=1e-7, rtol=1e-7,
        err_msg="unbatched qvel mismatch",
    )
    nbody1 = m.nbody - 1
    np.testing.assert_allclose(
        np.asarray(outs_1[4]).reshape(nbody1, 3),
        np.asarray(d_x.x_pos[0]),
        atol=1e-9, rtol=1e-9, err_msg="unbatched x_pos mismatch",
    )
