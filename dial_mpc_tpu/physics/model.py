"""Model/Data pytrees and the MJCF loader bridge.

``put_model`` consumes a compiled ``mujoco.MjModel`` (CPU MuJoCo is used as
an offline *compiler* only — it parses MJCF and produces constants; it never
runs in the hot path) and emits a :class:`Model` pytree of device arrays
plus static Python metadata. Everything downstream is pure JAX.

TPU-first design decisions (vs. the reference's brax/MJX substrate,
reference: dial_mpc/envs/base_env.py:31-35 `make_system` + brax mjcf.load):

- The candidate collision pair list is computed once here, giving a fixed
  contact count ``ncon`` and fixed constraint row count ``nefc`` — every
  shape in the simulator is static, so one XLA program covers all rollouts.
- Per-pair contact parameters (friction, solref, solimp, condim) are
  combined at load time with MuJoCo's mixing rules, so the runtime
  narrowphase only computes geometry.
- Dense dof-ancestor masks replace MuJoCo's sparse CSR mass-matrix layout:
  nv <= ~30 for the supported robots, and dense [nv, nv] batched matmuls
  are what the MXU wants.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

import mujoco

# geom types we collide (mjtGeom values)
PLANE, SPHERE, CAPSULE, CYLINDER, BOX = 0, 2, 3, 5, 6

# (type_lo, type_hi) -> max contact points emitted per pair
PAIR_MAXCON = {
    (PLANE, SPHERE): 1,
    (PLANE, CAPSULE): 2,
    (PLANE, BOX): 4,
    (SPHERE, SPHERE): 1,
    (SPHERE, CAPSULE): 1,
    (SPHERE, BOX): 1,
    (CAPSULE, CAPSULE): 1,
    (CAPSULE, BOX): 2,
    (BOX, BOX): 8,
}

# disable flags we honor
DSBL_EULERDAMP = mujoco.mjtDisableBit.mjDSBL_EULERDAMP.value
DSBL_CONTACT = mujoco.mjtDisableBit.mjDSBL_CONTACT.value
DSBL_LIMIT = mujoco.mjtDisableBit.mjDSBL_LIMIT.value
DSBL_GRAVITY = mujoco.mjtDisableBit.mjDSBL_GRAVITY.value


def _static_field(**kwargs):
    return dataclasses.field(metadata={"static": True}, **kwargs)


def _register(cls):
    fields = dataclasses.fields(cls)
    data = [f.name for f in fields if not f.metadata.get("static")]
    meta = [f.name for f in fields if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


@_register
@dataclasses.dataclass(frozen=True)
class Option:
    """Simulation options (mjOption subset used by the supported models)."""

    timestep: jax.Array
    gravity: jax.Array
    impratio: jax.Array
    # static
    iterations: int = _static_field(default=1)
    ls_iterations: int = _static_field(default=4)
    integrator: int = _static_field(default=0)  # 0 = Euler
    cone: int = _static_field(default=0)  # 0 = pyramidal, 1 = elliptic
    disableflags: int = _static_field(default=0)
    tolerance: float = _static_field(default=1e-8)
    ls_tolerance: float = _static_field(default=0.01)


@_register
@dataclasses.dataclass(frozen=True)
class Contact:
    """Fixed-size contact table (one row per candidate contact slot).

    ``dist`` is +large for slots whose geometry pair is separated; the
    constraint stage masks on ``dist < includemargin``. Layout is
    deterministic: slots are grouped per candidate pair, pairs sorted by
    (geom1, geom2); this replaces MJX's dynamic contact ordering that the
    reference envs indexed into (e.g. unitree_go2_env.py:750).
    """

    dist: jax.Array  # (ncon,)
    pos: jax.Array  # (ncon, 3)
    frame: jax.Array  # (ncon, 3, 3) rows: normal, tangent1, tangent2
    # static per-slot params (baked in Model but mirrored here for env use)
    geom: jax.Array  # (ncon, 2) geom ids
    includemargin: jax.Array  # (ncon,)
    friction: jax.Array  # (ncon, 5)
    solref: jax.Array  # (ncon, 2)
    solimp: jax.Array  # (ncon, 5)
    dim: jax.Array  # (ncon,) condim


@_register
@dataclasses.dataclass(frozen=True)
class Model:
    # ---- static sizes / topology ----
    nq: int = _static_field()
    nv: int = _static_field()
    nu: int = _static_field()
    nbody: int = _static_field()
    njnt: int = _static_field()
    ngeom: int = _static_field()
    nsite: int = _static_field()
    ncon: int = _static_field()  # fixed contact slot count
    # per-joint static metadata (tuples => hashable)
    jnt_type: tuple = _static_field()  # mjtJoint values
    jnt_qposadr: tuple = _static_field()
    jnt_dofadr: tuple = _static_field()
    jnt_bodyid: tuple = _static_field()
    jnt_limited: tuple = _static_field()
    body_parentid: tuple = _static_field()
    body_rootid: tuple = _static_field()
    body_jntadr: tuple = _static_field()
    body_jntnum: tuple = _static_field()
    body_dofadr: tuple = _static_field()
    body_dofnum: tuple = _static_field()
    dof_bodyid: tuple = _static_field()
    dof_jntid: tuple = _static_field()
    # actuators
    actuator_trnid: tuple = _static_field()
    actuator_biastype: tuple = _static_field()
    # collision pair table: tuple of (g1, g2, typ1, typ2, condim, conadr, conmax)
    pair_table: tuple = _static_field()
    # static host-side copies needed for trace-time row construction
    dof_frictionloss_static: tuple = _static_field(default=())
    geom_bodyid_static: tuple = _static_field(default=())
    opt: Option = None

    # ---- device arrays ----
    qpos0: jax.Array = None
    body_pos: jax.Array = None
    body_quat: jax.Array = None
    body_ipos: jax.Array = None
    body_iquat: jax.Array = None
    body_mass: jax.Array = None
    body_inertia: jax.Array = None
    body_invweight0: jax.Array = None
    body_subtreemass: jax.Array = None
    jnt_pos: jax.Array = None
    jnt_axis: jax.Array = None
    jnt_range: jax.Array = None
    jnt_solref: jax.Array = None
    jnt_solimp: jax.Array = None
    jnt_margin: jax.Array = None
    dof_armature: jax.Array = None
    dof_damping: jax.Array = None
    dof_invweight0: jax.Array = None
    dof_frictionloss: jax.Array = None
    dof_solref: jax.Array = None
    dof_solimp: jax.Array = None
    geom_pos: jax.Array = None
    geom_quat: jax.Array = None
    geom_size: jax.Array = None
    geom_bodyid: jax.Array = None
    site_pos: jax.Array = None
    site_quat: jax.Array = None
    site_bodyid: jax.Array = None
    actuator_gear: jax.Array = None  # (nu,) joint-transmission gear (scalar part)
    actuator_gainprm: jax.Array = None
    actuator_biasprm: jax.Array = None
    actuator_ctrlrange: jax.Array = None
    actuator_ctrllimited: jax.Array = None
    actuator_forcerange: jax.Array = None
    actuator_forcelimited: jax.Array = None
    actuator_dofadr: jax.Array = None  # dof index driven by each actuator
    # contact slot static params (ncon rows)
    con_geom: jax.Array = None
    con_includemargin: jax.Array = None
    con_friction: jax.Array = None
    con_solref: jax.Array = None
    con_solimp: jax.Array = None
    con_dim: jax.Array = None
    # dense dof ancestry: anc_mask[i, j] = 1 if dof j == i or j is an
    # ancestor of i in the kinematic tree (used to mask dense CRB products)
    dof_ancestor_mask: jax.Array = None
    # body_chain_mask[b, i] = 1 if dof i is in the kinematic chain from the
    # world to body b (used to mask dense point Jacobians)
    body_chain_mask: jax.Array = None

    @property
    def mj_model(self):
        """The originating mujoco.MjModel (host-side, not traced)."""
        return _MJ_CACHE.get(id_of(self))


# put_model caches the host mj_model out-of-band so Model stays a pure pytree
_MJ_CACHE: dict = {}


def id_of(m: Model) -> tuple:
    return (m.nq, m.nv, m.nbody, m.ngeom, m.pair_table)


@_register
@dataclasses.dataclass(frozen=True)
class Data:
    """Dynamic simulation state (one sample; vmap for batches)."""

    qpos: jax.Array
    qvel: jax.Array
    ctrl: jax.Array
    time: jax.Array
    # forward-kinematics products
    xpos: jax.Array = None  # (nbody, 3)
    xquat: jax.Array = None  # (nbody, 4)
    xmat: jax.Array = None  # (nbody, 3, 3)
    xipos: jax.Array = None  # (nbody, 3)
    ximat: jax.Array = None  # (nbody, 3, 3)
    xanchor: jax.Array = None  # (njnt, 3)
    xaxis: jax.Array = None  # (njnt, 3)
    geom_xpos: jax.Array = None
    geom_xmat: jax.Array = None
    site_xpos: jax.Array = None
    site_xmat: jax.Array = None
    subtree_com: jax.Array = None  # (nbody, 3)
    cinert: jax.Array = None  # (nbody, 6, 6)
    cdof: jax.Array = None  # (nv, 6)
    cvel: jax.Array = None  # (nbody, 6)
    cdof_dot: jax.Array = None  # (nv, 6)
    # dynamics products
    qM: jax.Array = None  # (nv, nv) dense
    qLD: jax.Array = None  # (nv, nv) Cholesky factor of qM (lower)
    qfrc_bias: jax.Array = None
    qfrc_passive: jax.Array = None
    qfrc_actuator: jax.Array = None
    actuator_force: jax.Array = None
    qfrc_smooth: jax.Array = None
    qacc_smooth: jax.Array = None
    qfrc_constraint: jax.Array = None
    qacc: jax.Array = None
    contact: Contact = None
    efc: Any = None  # constraint.Efc rows
    # brax-compatible maximal-coordinate views (world bodies excluded),
    # matching what the reference envs consume (x.pos, x.rot, xd.vel, xd.ang)
    # reference: brax mjx pipeline + dial_mpc/envs/*.py
    x_pos: jax.Array = None  # (nbody-1, 3)
    x_rot: jax.Array = None  # (nbody-1, 4)
    xd_vel: jax.Array = None  # (nbody-1, 3)
    xd_ang: jax.Array = None  # (nbody-1, 3)

    # --- compatibility aliases (reference envs read these names) ---
    @property
    def q(self):
        return self.qpos

    @property
    def qd(self):
        return self.qvel

    @property
    def x(self):
        return _View(pos=self.x_pos, rot=self.x_rot)

    @property
    def xd(self):
        return _View(vel=self.xd_vel, ang=self.xd_ang)


class _View:
    """Attribute bag for brax-style x/xd access."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _combine_contact_params(m: mujoco.MjModel, g1: int, g2: int):
    """MuJoCo's per-pair contact parameter combination (priority/solmix/max)."""
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    if p1 > p2:
        condim = int(m.geom_condim[g1])
        friction = np.array(m.geom_friction[g1])
        solref, solimp = m.geom_solref[g1].copy(), m.geom_solimp[g1].copy()
    elif p2 > p1:
        condim = int(m.geom_condim[g2])
        friction = np.array(m.geom_friction[g2])
        solref, solimp = m.geom_solref[g2].copy(), m.geom_solimp[g2].copy()
    else:
        condim = int(max(m.geom_condim[g1], m.geom_condim[g2]))
        friction = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
        s1, s2 = m.geom_solmix[g1], m.geom_solmix[g2]
        w1 = s1 / max(s1 + s2, 1e-15)
        if s1 < 1e-15 and s2 < 1e-15:
            w1 = 0.5
        elif s1 < 1e-15:
            w1 = 0.0
        elif s2 < 1e-15:
            w1 = 1.0
        # standard solref mixes; direct (negative) takes elementwise min
        if m.geom_solref[g1][0] > 0 and m.geom_solref[g2][0] > 0:
            solref = w1 * m.geom_solref[g1] + (1 - w1) * m.geom_solref[g2]
        else:
            solref = np.minimum(m.geom_solref[g1], m.geom_solref[g2])
        solimp = w1 * m.geom_solimp[g1] + (1 - w1) * m.geom_solimp[g2]
    margin = max(m.geom_margin[g1], m.geom_margin[g2])
    gap = max(m.geom_gap[g1], m.geom_gap[g2])
    # friction vector layout: (tangent1, tangent2, torsion, roll1, roll2)
    fri = np.array([friction[0], friction[0], friction[1], friction[2], friction[2]])
    return condim, fri, np.asarray(solref), np.asarray(solimp), margin - gap


def _candidate_pairs(m: mujoco.MjModel):
    """Static candidate geom pairs, MuJoCo contype/conaffinity + tree filters."""
    pairs = []
    for g1 in range(m.ngeom):
        for g2 in range(g1 + 1, m.ngeom):
            if not (
                (m.geom_contype[g1] & m.geom_conaffinity[g2])
                or (m.geom_contype[g2] & m.geom_conaffinity[g1])
            ):
                continue
            b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
            w1, w2 = m.body_weldid[b1], m.body_weldid[b2]
            if w1 == w2:
                continue
            p1 = m.body_weldid[m.body_parentid[w1]]
            p2 = m.body_weldid[m.body_parentid[w2]]
            if (p1 == w2 and w2 != 0) or (p2 == w1 and w1 != 0):
                continue
            t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
            # order so type_lo <= type_hi (collider functions assume this)
            if t1 <= t2:
                pairs.append((g1, g2, t1, t2))
            else:
                pairs.append((g2, g1, t2, t1))
    # deterministic order: by (geom1, geom2) of the canonical orientation
    pairs.sort(key=lambda p: (p[0], p[1]))
    return pairs


def put_model(m: mujoco.MjModel, dtype=jnp.float32) -> Model:
    """Build the device Model from a compiled mujoco.MjModel."""
    pairs = _candidate_pairs(m)
    pair_table = []
    con_geom, con_inclm, con_fri, con_solref, con_solimp, con_dim = [], [], [], [], [], []
    conadr = 0
    for g1, g2, t1, t2 in pairs:
        key = (t1, t2)
        if key not in PAIR_MAXCON:
            raise NotImplementedError(f"no collider for geom type pair {key}")
        conmax = PAIR_MAXCON[key]
        condim, fri, solref, solimp, inclm = _combine_contact_params(m, g1, g2)
        pair_table.append((g1, g2, t1, t2, condim, conadr, conmax))
        for _ in range(conmax):
            con_geom.append((g1, g2))
            con_inclm.append(inclm)
            con_fri.append(fri)
            con_solref.append(solref)
            con_solimp.append(solimp)
            con_dim.append(condim)
        conadr += conmax
    ncon = conadr

    # dense dof ancestor mask from dof_parentid chains
    anc = np.zeros((m.nv, m.nv), dtype=np.float64)
    for i in range(m.nv):
        j = i
        while j >= 0:
            anc[i, j] = 1.0
            j = m.dof_parentid[j]

    # body -> dof chain mask
    chain = np.zeros((m.nbody, m.nv), dtype=np.float64)
    for b in range(m.nbody):
        bb = b
        while bb > 0:
            da, dn = m.body_dofadr[bb], m.body_dofnum[bb]
            chain[b, da : da + dn] = 1.0
            bb = m.body_parentid[bb]

    # actuator -> dof (joint transmission only in the supported models)
    act_dofadr = np.array(
        [m.jnt_dofadr[m.actuator_trnid[u, 0]] for u in range(m.nu)], dtype=np.int32
    )

    f = lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
    fi = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.int32)

    # Newton with exact-ish line search converges in a handful of
    # iterations; models shipping CPU-solver settings (e.g. Allegro's
    # iterations=100) would explode compile time of the unrolled pipeline,
    # so cap the static schedule. DIAL_MPC_MAX_SOLVER_ITERS overrides the
    # cap (stability studies on contact-rich scenes).
    import os as _os

    _cap = int(_os.environ.get("DIAL_MPC_MAX_SOLVER_ITERS", "8"))
    opt = Option(
        timestep=f(m.opt.timestep),
        gravity=f(m.opt.gravity),
        impratio=f(m.opt.impratio),
        iterations=min(int(m.opt.iterations), _cap),
        ls_iterations=min(int(m.opt.ls_iterations), _cap),
        integrator=int(m.opt.integrator),
        cone=int(m.opt.cone),
        disableflags=int(m.opt.disableflags),
        tolerance=float(m.opt.tolerance),
        ls_tolerance=float(m.opt.ls_tolerance),
    )

    inertia_full = np.zeros((m.nbody, 3))
    inertia_full[:] = m.body_inertia

    model = Model(
        nq=m.nq,
        nv=m.nv,
        nu=m.nu,
        nbody=m.nbody,
        njnt=m.njnt,
        ngeom=m.ngeom,
        nsite=m.nsite,
        ncon=ncon,
        jnt_type=tuple(int(x) for x in m.jnt_type),
        jnt_qposadr=tuple(int(x) for x in m.jnt_qposadr),
        jnt_dofadr=tuple(int(x) for x in m.jnt_dofadr),
        jnt_bodyid=tuple(int(x) for x in m.jnt_bodyid),
        jnt_limited=tuple(bool(x) for x in m.jnt_limited),
        body_parentid=tuple(int(x) for x in m.body_parentid),
        body_rootid=tuple(int(x) for x in m.body_rootid),
        body_jntadr=tuple(int(x) for x in m.body_jntadr),
        body_jntnum=tuple(int(x) for x in m.body_jntnum),
        body_dofadr=tuple(int(x) for x in m.body_dofadr),
        body_dofnum=tuple(int(x) for x in m.body_dofnum),
        dof_bodyid=tuple(int(x) for x in m.dof_bodyid),
        dof_jntid=tuple(int(x) for x in m.dof_jntid),
        actuator_trnid=tuple(int(x) for x in m.actuator_trnid[:, 0]),
        actuator_biastype=tuple(int(x) for x in m.actuator_biastype),
        pair_table=tuple(pair_table),
        dof_frictionloss_static=tuple(float(x) for x in m.dof_frictionloss),
        geom_bodyid_static=tuple(int(x) for x in m.geom_bodyid),
        opt=opt,
        qpos0=f(m.qpos0),
        body_pos=f(m.body_pos),
        body_quat=f(m.body_quat),
        body_ipos=f(m.body_ipos),
        body_iquat=f(m.body_iquat),
        body_mass=f(m.body_mass),
        body_inertia=f(inertia_full),
        body_invweight0=f(m.body_invweight0),
        body_subtreemass=f(m.body_subtreemass),
        jnt_pos=f(m.jnt_pos),
        jnt_axis=f(m.jnt_axis),
        jnt_range=f(m.jnt_range),
        jnt_solref=f(m.jnt_solref),
        jnt_solimp=f(m.jnt_solimp),
        jnt_margin=f(m.jnt_margin),
        dof_armature=f(m.dof_armature),
        dof_damping=f(m.dof_damping),
        dof_invweight0=f(m.dof_invweight0),
        dof_frictionloss=f(m.dof_frictionloss),
        dof_solref=f(m.dof_solref),
        dof_solimp=f(m.dof_solimp),
        geom_pos=f(m.geom_pos),
        geom_quat=f(m.geom_quat),
        geom_size=f(m.geom_size),
        geom_bodyid=fi(m.geom_bodyid),
        site_pos=f(m.site_pos),
        site_quat=f(m.site_quat),
        site_bodyid=fi(m.site_bodyid),
        actuator_gear=f(m.actuator_gear[:, 0]),
        actuator_gainprm=f(m.actuator_gainprm),
        actuator_biasprm=f(m.actuator_biasprm),
        actuator_ctrlrange=f(m.actuator_ctrlrange),
        actuator_ctrllimited=f(m.actuator_ctrllimited.astype(np.float64)),
        actuator_forcerange=f(m.actuator_forcerange),
        actuator_forcelimited=f(m.actuator_forcelimited.astype(np.float64)),
        actuator_dofadr=fi(act_dofadr),
        con_geom=fi(np.array(con_geom).reshape(ncon, 2) if ncon else np.zeros((0, 2))),
        con_includemargin=f(np.array(con_inclm) if ncon else np.zeros(0)),
        con_friction=f(np.array(con_fri).reshape(ncon, 5) if ncon else np.zeros((0, 5))),
        con_solref=f(np.array(con_solref).reshape(ncon, 2) if ncon else np.zeros((0, 2))),
        con_solimp=f(np.array(con_solimp).reshape(ncon, 5) if ncon else np.zeros((0, 5))),
        con_dim=fi(np.array(con_dim) if ncon else np.zeros(0)),
        dof_ancestor_mask=f(anc),
        body_chain_mask=f(chain),
    )
    _MJ_CACHE[id_of(model)] = m
    return model


def make_data(m: Model, dtype=jnp.float32) -> Data:
    """Fresh Data at qpos0 / zero velocity (derived fields unset)."""
    return Data(
        qpos=jnp.asarray(m.qpos0, dtype=dtype),
        qvel=jnp.zeros(m.nv, dtype=dtype),
        ctrl=jnp.zeros(m.nu, dtype=dtype),
        time=jnp.zeros((), dtype=dtype),
    )
