"""Tile-layout physics step: the megakernel's compute body.

TPU-first formulation of one semi-implicit Euler step for the "scalar-joint"
model class (hinge/slide joints, joint-transmission actuators, plane-sphere/
plane-capsule contacts, scalar joint limits). Every physical scalar is an
array with TRAILING batch dims `bshape` (one (8,128) f32 tile per scalar on
TPU = 1024 candidates at 100% VPU lane utilization); model constants are
baked in as numpy at build time, so the whole step traces to straight-line
vector code with zero gathers and zero dynamic shapes — the layout Pallas/
Mosaic wants (see pallas guide: tiling constraints).

Semantics mirror physics/{kinematics,dynamics,solver,step}.py (which are
oracle-tested against MuJoCo); equivalence is pinned by
tests/test_megarollout.py. Replaces the reference's mj_step calls inside
Trajectory::Rollout (mjpc/trajectory.cc:141-180) on the planner hot path.

The same code runs under plain XLA (bshape=() gives per-sample scalar code)
— used for CPU oracle tests — and inside a Pallas kernel (ops/megarollout).
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.types import (ActDyn, GainBias, GeomType,
                                          JointType, Model, TrnType)

_ITERATIONS = 12  # must match physics/solver.py (warm-started APGD)
_POWER_ITERS = 8  # must match physics/solver.py (λmax power iteration)
_MINIMP, _MAXIMP = 1e-4, 0.9999
_DEFAULT_SOLIMP = (0.9, 0.95, 0.001, 0.5, 2.0)


class UnsupportedModel(Exception):
  """Model is outside the megakernel's supported class."""


def amat_is_dense(nrow: int) -> bool:
  """Whether the (nrow, nrow) Delassus tile stack is materialized (~4 MB
  of (8,128) f32 tiles) or the constraint solve runs matrix-free."""
  return nrow * nrow * 4096 <= 4 * 1024 * 1024


def jacobian_tiles(tm: "TileModel") -> int:
  """Static tile count of step_tb's support-sparse J blocks (layout
  mirror, no tracing) — the VMEM driver for megarollout._pick_block."""
  def con_sup(cp):
    return {k for k in range(tm.nv)
            if bool(tm.dof_body_mask[k, cp.body1])
            != bool(tm.dof_body_mask[k, cp.body2])}

  rows = []
  for cp in tm.con_points:
    if cp.condim >= 3:
      rows += [con_sup(cp)] * 3
  for cp in tm.con_points:
    if cp.condim == 1:
      rows.append(con_sup(cp))
  for cp in tm.con_points:
    if cp.condim >= 4:
      rows.append(con_sup(cp))
  for _ in range(2):
    for cp in tm.con_points:
      if cp.condim >= 6:
        rows.append(con_sup(cp))
  for li in range(len(tm.lim_jnt)):
    rows += [{tm.lim_vadr[li]}] * 2
  for t in tm.ten_lim:
    rows += [{v for _, v, _ in tm.ten_wraps[t]}] * 2
  for er in tm.eq_rows:
    if er.kind == 2:
      s = {tm.jnt_dofadr[er.ob1]}
      if er.ob2 >= 0:
        s.add(tm.jnt_dofadr[er.ob2])
      rows.append(s)
    else:
      either = {k for k in range(tm.nv)
                if tm.dof_body_mask[k, er.ob1]
                or tm.dof_body_mask[k, er.ob2]}
      rows += [either] * 3
      if er.kind == 1:
        xor = {k for k in range(tm.nv)
               if bool(tm.dof_body_mask[k, er.ob1])
               != bool(tm.dof_body_mask[k, er.ob2])}
        rows += [xor] * 3
  total = 0
  for r0 in range(0, len(rows), 8):
    blk = rows[r0:r0 + 8]
    sup = set().union(*blk) or {0}
    total += len(blk) * len(sup)
  return total


# ---------------------------------------------------------------------------
# build-time extraction: all model constants as concrete numpy
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ConPoint:
  """One static candidate contact point (collision.py pair expansion)."""
  kind: str  # 'plane_sphere' | 'plane_capend' | 'sphere_sphere'
  #            | 'sphere_cap' | 'cap_cap' | 'plane_boxcorner'
  #            | 'sphere_box' | 'cap_box' | 'boxbox_corner'
  g1: int
  g2: int
  body1: int
  body2: int
  sign: float  # ±1 capsule-end selector (plane_capend / cap_box)
  r1: float
  r2: float
  half1: float
  half2: float
  frame: Optional[np.ndarray]  # (3,3) constant frame for plane contacts
  ppos: Optional[np.ndarray]  # (3,) plane point
  mu: float
  solref: np.ndarray
  solimp: np.ndarray
  margin: float
  size1: Optional[np.ndarray] = None  # (3,) full box size of g1
  size2: Optional[np.ndarray] = None  # (3,) full box size of g2
  corner: Optional[np.ndarray] = None  # (3,) ±1 corner selector (box kinds)
  owner: int = 0  # boxbox_corner: 1 = corner of box1, 2 = corner of box2
  condim: int = 3  # 1 = normal row only; 4/6 add torsional/rolling rows
  mu_tor: float = 0.0  # torsional friction coefficient (condim ≥ 4)
  mu_roll: float = 0.0  # rolling friction coefficient (condim = 6)


@dataclasses.dataclass
class EqRow:
  """One equality constraint (bilateral soft rows, solver._equality_rows)."""
  kind: int  # types.EqType value
  ob1: int  # body id (connect/weld) or joint id (joint coupling)
  ob2: int
  data: np.ndarray  # (11,) MuJoCo eq_data layout
  solref: np.ndarray  # (2,)
  solimp: np.ndarray  # (5,)
  # per-row regularizer scale (MuJoCo mj_diagApprox from invweight0;
  # mirrors solver.py — live A_rr vanishes on degenerate rows)
  diagapprox: np.ndarray = None  # (nrows,)

  @property
  def nrows(self) -> int:
    return {0: 3, 1: 6, 2: 1}[int(self.kind)]


@dataclasses.dataclass
class TileModel:
  """Concrete (numpy) model constants for the supported class."""
  nq: int
  nv: int
  nu: int
  nbody: int
  njnt: int
  timestep: float
  gravity: np.ndarray  # (3,)
  body_parentid: tuple
  body_pos: np.ndarray
  body_quat: np.ndarray
  body_ipos: np.ndarray
  body_iquat: np.ndarray
  body_mass: np.ndarray
  body_inertia: np.ndarray
  jnt_type: tuple
  jnt_qposadr: tuple
  jnt_dofadr: tuple
  jnt_bodyid: tuple
  jnt_pos: np.ndarray
  jnt_axis: np.ndarray
  body_jntadr: tuple
  body_jntnum: tuple
  qpos0: np.ndarray
  dof_damping: np.ndarray
  dof_armature: np.ndarray
  dof_body_mask: np.ndarray  # (nv, nbody) bool
  dof_ancestor_mask: np.ndarray  # (nv, nv)
  cdofdot_vel_mask: np.ndarray  # (nv, nv): dofs whose vel rotates cdof[k]
  dof_body: tuple  # (nv,) body id of every dof
  body_mocapid: tuple  # (nbody,) -1 or mocap index (pose = kernel operand)
  nmocap: int
  nuserdata: int
  # actuators (scalar joint transmission)
  act_vadr: np.ndarray  # (nu,) dof index
  act_qadr: np.ndarray  # (nu,)
  act_gear: np.ndarray  # (nu,)
  act_gainprm: np.ndarray  # (nu, 3)
  act_biasprm: np.ndarray  # (nu, 3)
  act_gain_fixed: np.ndarray  # (nu,) bool
  act_bias_fixed: np.ndarray  # (nu,) bool
  ctrl_limited: np.ndarray  # (nu,) bool
  ctrl_lo: np.ndarray
  ctrl_hi: np.ndarray
  force_limited: np.ndarray
  force_lo: np.ndarray
  force_hi: np.ndarray
  # contacts: static candidate contact points (ConPoint descriptors)
  con_points: tuple
  geom_bodyid: tuple
  geom_pos: np.ndarray
  geom_quat: np.ndarray
  # limits
  lim_jnt: tuple  # joint ids (two rows each: lo, hi)
  lim_qadr: tuple
  lim_vadr: tuple
  lim_lo: tuple
  lim_hi: tuple
  lim_margin: tuple
  lim_solref: np.ndarray  # (nlim_jnt, 2)
  # geoms/sites needed by residuals
  ngeom: int
  nsite: int
  site_bodyid: tuple
  site_pos: np.ndarray
  site_quat: np.ndarray
  # fixed tendons: per tendon ((qadr, vadr, coef), ...)
  ten_wraps: tuple = ()
  ten_stiffness: Optional[np.ndarray] = None  # (ntendon,)
  ten_damping: Optional[np.ndarray] = None  # (ntendon,)
  ten_lengthspring: Optional[np.ndarray] = None  # (ntendon, 2)
  ten_lim: tuple = ()  # limited tendon ids (two rows each: lo, hi)
  ten_lim_range: Optional[np.ndarray] = None  # (nlimten, 2)
  ten_lim_margin: tuple = ()
  ten_lim_solref: Optional[np.ndarray] = None  # (nlimten, 2)
  # actuator transmission: tendon id per actuator, -1 = scalar joint
  act_tendon: tuple = ()
  # equality constraints (bilateral rows, solver.py order)
  eq_rows: tuple = ()
  # scalar-joint springs + smoothed Coulomb friction loss
  jnt_stiffness: Optional[np.ndarray] = None  # (njnt,)
  qpos_spring: Optional[np.ndarray] = None  # (nq,)
  dof_frictionloss: Optional[np.ndarray] = None  # (nv,)

  @property
  def ncon(self) -> int:
    return len(self.con_points)

  @property
  def ncon_rows(self) -> int:
    """Translational contact rows: 1 per condim-1 point, 3 otherwise."""
    return sum(1 if cp.condim == 1 else 3 for cp in self.con_points)

  @property
  def tor_pts(self) -> tuple:
    return tuple(i for i, cp in enumerate(self.con_points)
                 if cp.condim >= 4)

  @property
  def roll_pts(self) -> tuple:
    return tuple(i for i, cp in enumerate(self.con_points)
                 if cp.condim >= 6)

  @property
  def nang(self) -> int:
    return len(self.tor_pts) + 2 * len(self.roll_pts)

  @property
  def nlim(self) -> int:
    return 2 * len(self.lim_jnt) + 2 * len(self.ten_lim)

  @property
  def neq_rows(self) -> int:
    return sum(e.nrows for e in self.eq_rows)

  @property
  def nrow(self) -> int:
    """Constraint-row count; layout MUST mirror solver.py: [contact rows,
    torsional, rolling, joint limits, tendon limits, equality]."""
    return self.ncon_rows + self.nang + self.nlim + self.neq_rows


def extract(m: Model) -> TileModel:
  """Concretize a Model into a TileModel; raises UnsupportedModel."""

  def npy(x):
    return np.asarray(x)

  for jt in m.jnt_type:
    if jt not in (JointType.HINGE, JointType.SLIDE, JointType.BALL,
                  JointType.FREE):
      raise UnsupportedModel(f"joint type {jt}")
  if m.na != 0:
    raise UnsupportedModel("stateful actuators")
  # mocap bodies: allowed as rollout-constant poses (kernel operands) —
  # markers/goals only; they may not collide or carry joints
  mocap_bodies = {b for b in range(m.nbody) if m.body_mocapid[b] >= 0}
  for b in mocap_bodies:
    if m.body_jntnum[b]:
      raise UnsupportedModel("jointed mocap body")
  for g1, g2 in m.collision_pairs:
    if (m.geom_bodyid[g1] in mocap_bodies or
        m.geom_bodyid[g2] in mocap_bodies):
      raise UnsupportedModel("colliding mocap geom")
  if m.opt.has_fluid:
    raise UnsupportedModel("fluid forces")
  if m.has_spring:
    # scalar-joint springs are mirrored; quaternion-joint springs are not
    for j in range(m.njnt):
      if (float(np.asarray(m.jnt_stiffness)[j]) != 0.0 and
          m.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE)):
        raise UnsupportedModel("spring on quaternion joint")

  # actuators: scalar-joint and fixed-tendon transmissions (quaternion-
  # joint gears and site transmissions stay on the general path)
  act_tendon = [-1] * m.nu
  for u in range(m.nu):
    if m.actuator_trntype[u] not in (TrnType.JOINT, TrnType.TENDON):
      raise UnsupportedModel("site transmission")
    if m.actuator_dyntype[u] != ActDyn.NONE:
      raise UnsupportedModel("actuator dynamics")
    if m.actuator_trntype[u] == TrnType.TENDON:
      act_tendon[u] = int(m.actuator_trnid[u])
    elif m.jnt_type[m.actuator_trnid[u]] not in (JointType.HINGE,
                                                 JointType.SLIDE):
      raise UnsupportedModel("actuator on quaternion joint")

  # fixed tendons: scalar-joint wraps only (spatial tendons are guarded
  # at load, physics/io.py); constant Jacobian rows
  # (dynamics.tendon_jacobian_np semantics)
  ten_wraps = []
  for wraps in m.tendon_joints:
    lst = []
    for jid, coef in wraps:
      if m.jnt_type[jid] not in (JointType.HINGE, JointType.SLIDE):
        raise UnsupportedModel("tendon wrapping a quaternion joint")
      lst.append((int(m.jnt_qposadr[jid]), int(m.jnt_dofadr[jid]),
                  float(coef)))
    ten_wraps.append(tuple(lst))
  ten_lim = [t for t in range(m.ntendon) if m.tendon_limited[t]]

  # equality constraints (bilateral rows, solver._equality_rows order)
  from mujoco_mpc_tpu.physics.types import EqType
  eq_rows = []
  eq_da_off = 0
  for e in range(m.neq):
    if not m.eq_active0[e]:
      continue
    et = m.eq_type[e]
    if et == EqType.JOINT:
      for jid in (m.eq_obj1id[e], m.eq_obj2id[e]):
        if jid >= 0 and m.jnt_type[jid] not in (JointType.HINGE,
                                                JointType.SLIDE):
          raise UnsupportedModel("joint equality on quaternion joint")
    nr = {int(EqType.CONNECT): 3, int(EqType.WELD): 6,
          int(EqType.JOINT): 1}[int(et)]
    da = np.asarray(m.eq_diagapprox[eq_da_off:eq_da_off + nr], np.float32) \
        if len(m.eq_diagapprox) else np.zeros((nr,), np.float32)
    eq_da_off += nr
    eq_rows.append(EqRow(
        kind=int(et), ob1=int(m.eq_obj1id[e]), ob2=int(m.eq_obj2id[e]),
        data=npy(m.eq_data)[e].astype(np.float32),
        solref=npy(m.eq_solref)[e].astype(np.float32),
        solimp=npy(m.eq_solimp)[e].astype(np.float32),
        diagapprox=da))

  # contacts: static pointwise expansion of the supported pairs
  con_points = []
  geom_xpos0, geom_xmat0 = _static_geom_frames(m)
  for g1, g2 in m.collision_pairs:
    t1, t2 = GeomType(m.geom_type[g1]), GeomType(m.geom_type[g2])
    b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
    gs = npy(m.geom_size)
    common = dict(
        g1=g1, g2=g2, body1=b1, body2=b2,
        r1=float(gs[g1, 0]), r2=float(gs[g2, 0]),
        half1=float(gs[g1, 1]), half2=float(gs[g2, 1]),
        mu=float(max(npy(m.geom_friction)[g1, 0],
                     npy(m.geom_friction)[g2, 0])),
        solref=0.5 * (npy(m.geom_solref)[g1] + npy(m.geom_solref)[g2]),
        solimp=0.5 * (npy(m.geom_solimp)[g1] + npy(m.geom_solimp)[g2]),
        margin=float(max(npy(m.geom_margin)[g1], npy(m.geom_margin)[g2])),
        condim=int(max(m.geom_condim[g1], m.geom_condim[g2])),
        mu_tor=float(max(npy(m.geom_friction)[g1, 1],
                         npy(m.geom_friction)[g2, 1])),
        mu_roll=float(max(npy(m.geom_friction)[g1, 2],
                          npy(m.geom_friction)[g2, 2])),
    )
    if t1 == GeomType.PLANE:
      if b1 != 0:
        raise UnsupportedModel("plane on moving body")
      n = geom_xmat0[g1][:, 2]
      t1v = (np.array([1.0, 0, 0]) if abs(n[0]) < 0.5
             else np.array([0, 1.0, 0]))
      t1v = np.cross(n, t1v)
      t1v = t1v / np.linalg.norm(t1v)
      # float32: float64 numpy scalars would silently promote the whole
      # tile computation under jax x64 (oracle-test config)
      frame = np.stack([n, t1v, np.cross(n, t1v)]).astype(np.float32)
      if t2 == GeomType.SPHERE:
        con_points.append(ConPoint(kind="plane_sphere", sign=0.0,
                                   frame=frame, ppos=geom_xpos0[g1],
                                   **common))
      elif t2 in (GeomType.CAPSULE, GeomType.CYLINDER):
        for sgn in (-1.0, 1.0):
          con_points.append(ConPoint(kind="plane_capend", sign=sgn,
                                     frame=frame, ppos=geom_xpos0[g1],
                                     **common))
      elif t2 == GeomType.BOX:
        # collision._plane_box: all 8 corners as candidate points
        for sx in (-1.0, 1.0):
          for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
              con_points.append(ConPoint(
                  kind="plane_boxcorner", sign=0.0, frame=frame,
                  ppos=geom_xpos0[g1], size2=gs[g2].astype(np.float32),
                  corner=np.asarray([sx, sy, sz], np.float32), **common))
      else:
        raise UnsupportedModel(f"pair {t1}/{t2}")
    elif (t1, t2) == (GeomType.SPHERE, GeomType.SPHERE):
      con_points.append(ConPoint(kind="sphere_sphere", sign=0.0,
                                 frame=None, ppos=None, **common))
    elif (t1, t2) == (GeomType.SPHERE, GeomType.CAPSULE):
      con_points.append(ConPoint(kind="sphere_cap", sign=0.0,
                                 frame=None, ppos=None, **common))
    elif (t1, t2) == (GeomType.CAPSULE, GeomType.CAPSULE):
      con_points.append(ConPoint(kind="cap_cap", sign=0.0,
                                 frame=None, ppos=None, **common))
    elif (t1, t2) == (GeomType.SPHERE, GeomType.BOX):
      con_points.append(ConPoint(kind="sphere_box", sign=0.0,
                                 frame=None, ppos=None,
                                 size2=gs[g2].astype(np.float32), **common))
    elif (t1, t2) == (GeomType.CAPSULE, GeomType.BOX):
      # collision._capsule_box: sphere-box query at each capsule end
      for sgn in (-1.0, 1.0):
        con_points.append(ConPoint(kind="cap_box", sign=sgn,
                                   frame=None, ppos=None,
                                   size2=gs[g2].astype(np.float32),
                                   **common))
    elif (t1, t2) == (GeomType.BOX, GeomType.BOX):
      # collision._box_box: face-SAT shared normal + 16 corner points
      for owner in (2, 1):  # box2 corners first (collision.py order)
        for sx in (-1.0, 1.0):
          for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
              con_points.append(ConPoint(
                  kind="boxbox_corner", sign=0.0, frame=None, ppos=None,
                  size1=gs[g1].astype(np.float32),
                  size2=gs[g2].astype(np.float32),
                  corner=np.asarray([sx, sy, sz], np.float32),
                  owner=owner, **common))
    else:
      raise UnsupportedModel(f"pair {t1}/{t2}")

  lim = [j for j in range(m.njnt) if m.jnt_limited[j]]
  for j in lim:
    if m.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
      raise UnsupportedModel("limit on quaternion joint")
  jr = npy(m.jnt_range)

  dof_body = [0] * m.nv
  for j in range(m.njnt):
    ndof = {JointType.FREE: 6, JointType.BALL: 3}.get(m.jnt_type[j], 1)
    for i in range(ndof):
      dof_body[m.jnt_dofadr[j] + i] = m.jnt_bodyid[j]

  return TileModel(
      nq=m.nq, nv=m.nv, nu=m.nu, nbody=m.nbody, njnt=m.njnt,
      timestep=float(m.opt.timestep),
      gravity=npy(m.opt.gravity),
      body_parentid=tuple(m.body_parentid),
      body_pos=npy(m.body_pos), body_quat=npy(m.body_quat),
      body_ipos=npy(m.body_ipos), body_iquat=npy(m.body_iquat),
      body_mass=npy(m.body_mass), body_inertia=npy(m.body_inertia),
      jnt_type=tuple(m.jnt_type), jnt_qposadr=tuple(m.jnt_qposadr),
      jnt_dofadr=tuple(m.jnt_dofadr), jnt_bodyid=tuple(m.jnt_bodyid),
      jnt_pos=npy(m.jnt_pos), jnt_axis=npy(m.jnt_axis),
      body_jntadr=tuple(m.body_jntadr), body_jntnum=tuple(m.body_jntnum),
      qpos0=npy(m.qpos0),
      dof_damping=npy(m.dof_damping), dof_armature=npy(m.dof_armature),
      dof_body_mask=npy(m.dof_body_mask),
      dof_ancestor_mask=npy(m.dof_ancestor_mask),
      cdofdot_vel_mask=npy(m.cdofdot_vel_mask),
      dof_body=tuple(dof_body),
      body_mocapid=tuple(int(x) for x in m.body_mocapid),
      nmocap=int(m.nmocap),
      nuserdata=int(getattr(m, "nuserdata", 0) or 16),
      act_vadr=np.asarray([0 if act_tendon[u] >= 0
                           else m.jnt_dofadr[m.actuator_trnid[u]]
                           for u in range(m.nu)], np.int32),
      act_qadr=np.asarray([0 if act_tendon[u] >= 0
                           else m.jnt_qposadr[m.actuator_trnid[u]]
                           for u in range(m.nu)], np.int32),
      act_gear=npy(m.actuator_gear)[:, 0] if m.nu else np.zeros(0),
      act_gainprm=npy(m.actuator_gainprm),
      act_biasprm=npy(m.actuator_biasprm),
      act_gain_fixed=np.asarray(
          [t == GainBias.FIXED for t in m.actuator_gaintype]),
      act_bias_fixed=np.asarray(
          [t == GainBias.FIXED for t in m.actuator_biastype]),
      ctrl_limited=npy(m.actuator_ctrllimited),
      ctrl_lo=npy(m.actuator_ctrlrange)[:, 0] if m.nu else np.zeros(0),
      ctrl_hi=npy(m.actuator_ctrlrange)[:, 1] if m.nu else np.zeros(0),
      force_limited=npy(m.actuator_forcelimited),
      force_lo=npy(m.actuator_forcerange)[:, 0] if m.nu else np.zeros(0),
      force_hi=npy(m.actuator_forcerange)[:, 1] if m.nu else np.zeros(0),
      con_points=tuple(con_points),
      geom_bodyid=tuple(m.geom_bodyid),
      geom_pos=npy(m.geom_pos), geom_quat=npy(m.geom_quat),
      lim_jnt=tuple(lim),
      lim_qadr=tuple(m.jnt_qposadr[j] for j in lim),
      lim_vadr=tuple(m.jnt_dofadr[j] for j in lim),
      lim_lo=tuple(float(jr[j, 0]) for j in lim),
      lim_hi=tuple(float(jr[j, 1]) for j in lim),
      lim_margin=tuple(float(npy(m.jnt_margin)[j]) for j in lim),
      lim_solref=(np.stack([npy(m.jnt_solref)[j] for j in lim])
                  if lim else np.zeros((0, 2))),
      ngeom=m.ngeom, nsite=m.nsite,
      site_bodyid=tuple(m.site_bodyid),
      site_pos=npy(m.site_pos), site_quat=npy(m.site_quat),
      ten_wraps=tuple(ten_wraps),
      ten_stiffness=(npy(m.tendon_stiffness) if m.ntendon
                     else np.zeros(0)),
      ten_damping=npy(m.tendon_damping) if m.ntendon else np.zeros(0),
      ten_lengthspring=(npy(m.tendon_lengthspring) if m.ntendon
                        else np.zeros((0, 2))),
      ten_lim=tuple(ten_lim),
      ten_lim_range=(np.stack([npy(m.tendon_range)[t] for t in ten_lim])
                     if ten_lim else np.zeros((0, 2))),
      ten_lim_margin=tuple(float(npy(m.tendon_margin)[t])
                           for t in ten_lim),
      ten_lim_solref=(np.stack([npy(m.tendon_solref_lim)[t]
                                for t in ten_lim])
                      if ten_lim else np.zeros((0, 2))),
      act_tendon=tuple(act_tendon),
      eq_rows=tuple(eq_rows),
      jnt_stiffness=npy(m.jnt_stiffness),
      qpos_spring=npy(m.qpos_spring),
      dof_frictionloss=npy(m.dof_frictionloss),
  )


def _static_geom_frames(m: Model):
  """World pose of geoms on the world body (numpy, build time)."""
  xpos = {g: np.asarray(m.geom_pos)[g] for g in range(m.ngeom)}
  xmat = {}
  for g in range(m.ngeom):
    q = np.asarray(m.geom_quat)[g]
    w, x, y, z = q
    xmat[g] = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
  return xpos, xmat


# ---------------------------------------------------------------------------
# tile math: component-leading, batch-trailing
# ---------------------------------------------------------------------------


def _quat_mul(q1, q2):
  """(4,*b) x (4,*b) -> (4,*b). Either arg may be a (4,) numpy constant."""
  w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
  w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
  return jnp.stack([
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
  ])


def _quat_rot(q, v):
  """Rotate v by quaternion q (4,*b). v may be a (3,) numpy constant or a
  (3,*b) tile stack — components are combined scalar-wise so constants fold
  into the kernel as literals (Pallas rejects captured array constants)."""
  w = q[0]
  u = q[1:]
  uv = _cross(u, v)
  uuv = _cross(u, uv)
  return jnp.stack([v[k] + 2.0 * (w * uv[k] + uuv[k]) for k in range(3)])


def _cross(a, b):
  return jnp.stack([
      a[1] * b[2] - a[2] * b[1],
      a[2] * b[0] - a[0] * b[2],
      a[0] * b[1] - a[1] * b[0],
  ])


def _dot3(a, b):
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _quat_to_mat(q):
  """(4,*b) -> (3,3,*b)."""
  w, x, y, z = q[0], q[1], q[2], q[3]
  return jnp.stack([
      jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)]),
      jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)]),
      jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]),
  ])


def _quat_conj(q):
  return jnp.stack([q[0], -q[1], -q[2], -q[3]])


def _quat_sub_tb(qa, qb):
  """Orientation error of qa relative to qb in tile layout, (3, *b).

  Sin-weighted surrogate 2·sign(w)·vec(qb⁻¹⊗qa) = axis·2·sin(θ/2) —
  atan2 (the exact log map, math.quat_sub / solver._equality_rows) has
  no Mosaic TPU lowering. Equal to the rotation vector to O(θ³); weld
  equality keeps orientation errors small, where the two agree."""
  dq = _quat_mul(_quat_conj(qb), qa)
  s = jnp.where(dq[0] < 0, -2.0, 2.0)  # shortest path
  return jnp.stack([dq[1] * s, dq[2] * s, dq[3] * s])


def _quat_normalize(q):
  inv = 1.0 / jnp.sqrt(jnp.maximum(
      q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3], 1e-24))
  return jnp.stack([q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv])


def _quat_integrate(q, w0, w1, w2, dt: float):
  """math.quat_integrate in tile layout: exact exponential map of the
  body-frame angular velocity, NaN-free at ω = 0, renormalized."""
  sq = w0 * w0 + w1 * w1 + w2 * w2
  small = sq < 1e-24
  theta = jnp.sqrt(jnp.where(small, 1.0, sq))
  inv = 1.0 / theta
  half = 0.5 * theta * dt
  s = jnp.sin(half) * inv
  dq = jnp.stack([jnp.where(small, jnp.cos(half) * 0.0 + 1.0,
                            jnp.cos(half)),
                  jnp.where(small, w0 * 0.0, w0 * s),
                  jnp.where(small, w0 * 0.0, w1 * s),
                  jnp.where(small, w0 * 0.0, w2 * s)])
  return _quat_normalize(_quat_mul(q, dq))


def _axis_angle_quat(axis_const: np.ndarray, angle):
  """(3,) const axis + (*b) angle -> (4,*b) quaternion."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.stack([jnp.cos(half), axis_const[0] * s, axis_const[1] * s,
                    axis_const[2] * s])


def _chol_factor_tb(a, n, eps=1e-12):
  """Cholesky of (n,n,*b) SPD, unrolled with static masks (cf ops/linalg)."""
  l = [[None] * n for _ in range(n)]
  for j in range(n):
    s = a[j, j]
    for k in range(j):
      s = s - l[j][k] * l[j][k]
    ljj = jnp.sqrt(jnp.maximum(s, eps))
    inv = 1.0 / ljj
    l[j][j] = ljj
    for i in range(j + 1, n):
      r = a[i, j]
      for k in range(j):
        r = r - l[i][k] * l[j][k]
      l[i][j] = r * inv
  return l


def _chol_solve_tb(l, b, n):
  """Solve L Lᵀ x = b with b a python list of n tiles; returns list."""
  y = [None] * n
  for i in range(n):
    acc = b[i]
    for k in range(i):
      acc = acc - l[i][k] * y[k]
    y[i] = acc / l[i][i]
  x = [None] * n
  for i in reversed(range(n)):
    acc = y[i]
    for k in range(i + 1, n):
      acc = acc - l[k][i] * x[k]
    x[i] = acc / l[i][i]
  return x


def _impedance(pos, solimp: np.ndarray):
  """MuJoCo impedance sigmoid with constant solimp (mirrors solver.py)."""
  d0, d1, width, mid, power = (float(solimp[0]), float(solimp[1]),
                               float(solimp[2]), float(solimp[3]),
                               float(solimp[4]))
  mid = min(max(mid, 1e-4), 1 - 1e-4)
  power = max(power, 1.0)
  x = jnp.clip(jnp.abs(pos) / max(width, 1e-12), 0.0, 1.0)
  y_lo = jnp.power(x / mid, power) * mid
  y_hi = 1.0 - jnp.power((1 - x) / (1 - mid), power) * (1 - mid)
  y = jnp.where(x < mid, y_lo, y_hi)
  return jnp.clip(d0 + y * (d1 - d0), _MINIMP, _MAXIMP)


def _kb(solref: np.ndarray, dmax: float) -> Tuple[float, float]:
  """Constant stiffness/damping from constant solref (solver.py:_kb)."""
  tc, dr = max(float(solref[0]), 1e-8), max(float(solref[1]), 1e-8)
  if solref[0] <= 0 and solref[1] <= 0:
    return -float(solref[0]) / dmax ** 2, -float(solref[1]) / dmax
  return 1.0 / (dmax * dmax * tc * tc * dr * dr), 2.0 / (dmax * tc)


class _TileContactView:
  """Lazy contact view for residuals (dist/frame per candidate point).

  Built only when a residual actually reads it (tracing triggers the
  property) — contact-rich models whose residuals don't touch contacts
  (humanoid: ~190 points) pay nothing. Leading-axis layout mirrors the
  general path's Data.contact: dist (ncon, *b), frame (ncon, 3, 3, *b).
  """

  def __init__(self, tm, con_geo, zero):
    self._tm, self._geo, self._zero = tm, con_geo, zero
    self._dist = self._frame = None

  @property
  def dist(self):
    if self._dist is None:
      if not self._geo:
        self._dist = jnp.stack([self._zero + 1e10])[:0]
      else:
        self._dist = jnp.stack([g[0] for g in self._geo])
    return self._dist

  @property
  def frame(self):
    if self._frame is None:
      zero = self._zero
      rows = []
      for g in (self._geo or ()):
        fr_rows = []
        for r in range(3):
          fr = g[1][r]
          if isinstance(fr, np.ndarray):  # plane contact: constant frame
            fr_rows.append(jnp.stack([zero + float(fr[i])
                                      for i in range(3)]))
          else:
            fr_rows.append(jnp.stack([fr[0], fr[1], fr[2]]))
        rows.append(jnp.stack(fr_rows))
      self._frame = (jnp.stack(rows) if rows
                     else jnp.stack([jnp.zeros((3, 3)) + zero])[:0])
    return self._frame


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------


def step_tb(tm: TileModel, qpos, qvel, ctrl, mocap_pos=None,
            mocap_quat=None, userdata=None, efc_lambda=None):
  """One physics step in tile layout.

  Args:
    qpos: (nq, *b); qvel: (nv, *b); ctrl: (nu, *b).
    mocap_pos/mocap_quat: rollout-constant mocap poses, shaped
      (nmocap, 3/4) + (1,)*len(b) so slices broadcast against tiles.
    userdata: (nuserdata,) + (1,)*len(b) — task FSM state (read-only
      inside rollouts; transitions run in the agent loop).
    efc_lambda: (nrow, *b) APGD warm start (previous step's dual forces;
      None/zeros = cold, diag-preconditioned init) — must mirror
      solver.py's warm-start semantics exactly for path equivalence.
      Tile row layout (differs from solver.py's order, which is fine:
      APGD is row-order invariant and the warm-start vector never crosses
      paths): [condim≥3 points (n,t1,t2 each), condim-1 normals,
      torsional, rolling (axis-major), joint limits, tendon limits,
      equality rows].
  Returns:
    (qpos2, qvel2, view) with view a SimpleNamespace carrying the derived
    quantities task residuals read (xpos, xmat, xquat, site_xpos,
    geom_xpos, cvel, xipos, ximat, subtree_com, actuator_force,
    mocap_pos, userdata, qpos, qvel, ctrl — component-leading,
    batch-trailing) plus view.efc_lambda (the converged duals to carry).
  """
  nv, nbody = tm.nv, tm.nbody
  h = tm.timestep
  b = qpos.shape[1:]
  dtype = qpos.dtype
  # Pallas rejects captured ARRAY constants: every tile must be derived
  # from kernel inputs, every model constant must enter as a scalar literal
  zero = qpos[0] * 0.0
  one_c = lambda v: np.asarray(v, dtype=np.float32)

  # ---- forward kinematics (kinematics.py semantics, scalar joints)
  xpos = [jnp.stack([zero, zero, zero])]
  xquat = [jnp.stack([zero + 1.0, zero, zero, zero])]
  xanchor = [None] * tm.njnt
  xaxis = [None] * tm.njnt
  for bd in range(1, nbody):
    p = tm.body_parentid[bd]
    quat = _quat_mul(xquat[p], one_c(tm.body_quat[bd]))
    pos = xpos[p] + _quat_rot(xquat[p], one_c(tm.body_pos[bd]))
    mid = tm.body_mocapid[bd]
    if mid >= 0:  # kinematics.py: mocap pose overrides (rollout-constant)
      pos = jnp.stack([zero + mocap_pos[mid, i] for i in range(3)])
      quat = jnp.stack([zero + mocap_quat[mid, i] for i in range(4)])
    jadr, jnum = tm.body_jntadr[bd], tm.body_jntnum[bd]
    for j in range(jadr, jadr + jnum):
      qadr = tm.jnt_qposadr[j]
      ax = one_c(tm.jnt_axis[j])
      jp = one_c(tm.jnt_pos[j])
      if tm.jnt_type[j] == JointType.FREE:
        pos = jnp.stack([qpos[qadr], qpos[qadr + 1], qpos[qadr + 2]])
        quat = _quat_normalize(
            jnp.stack([qpos[qadr + 3], qpos[qadr + 4],
                       qpos[qadr + 5], qpos[qadr + 6]]))
        xanchor[j] = pos
        xaxis[j] = _quat_rot(quat, ax)
        continue
      anchor = pos + _quat_rot(quat, jp)
      if tm.jnt_type[j] == JointType.BALL:
        qloc = _quat_normalize(
            jnp.stack([qpos[qadr], qpos[qadr + 1],
                       qpos[qadr + 2], qpos[qadr + 3]]))
        quat = _quat_mul(quat, qloc)
        pos = anchor - _quat_rot(quat, jp)
      elif tm.jnt_type[j] == JointType.SLIDE:
        pos = pos + _quat_rot(quat, ax) * (
            qpos[qadr] - float(tm.qpos0[qadr]))
      else:  # HINGE
        angle = qpos[qadr] - float(tm.qpos0[qadr])
        quat = _quat_mul(quat, _axis_angle_quat(ax, angle))
        pos = anchor - _quat_rot(quat, jp)
      xanchor[j] = anchor
      xaxis[j] = _quat_rot(quat, ax)
    xpos.append(pos)
    xquat.append(quat)

  xmat = [_quat_to_mat(q) for q in xquat]  # (3,3,*b) each
  xipos = [xpos[bd] + _quat_rot(xquat[bd], one_c(tm.body_ipos[bd]))
           for bd in range(nbody)]
  ximat = [_quat_to_mat(_quat_mul(xquat[bd], one_c(tm.body_iquat[bd])))
           for bd in range(nbody)]

  # ---- cdof (world-origin motion subspace) per dof: (6 tiles)
  #      dynamics.com_pos semantics: slide/hinge use xaxis; ball/free
  #      rotations use body-frame axes (xmat columns); free translations
  #      are the constant world axes
  zero3 = jnp.stack([zero, zero, zero])
  cdof = [None] * nv  # entries: (ang(3,*b), lin(3,*b))
  for j in range(tm.njnt):
    k0 = tm.jnt_dofadr[j]
    jt = tm.jnt_type[j]
    bd = tm.jnt_bodyid[j]
    if jt == JointType.SLIDE:
      cdof[k0] = (zero3, xaxis[j])
    elif jt == JointType.HINGE:
      cdof[k0] = (xaxis[j], _cross(xanchor[j], xaxis[j]))
    else:  # BALL / FREE
      if jt == JointType.FREE:
        for i in range(3):
          cdof[k0 + i] = (zero3, jnp.stack(
              [zero + 1.0 if c == i else zero for c in range(3)]))
        rot0, anchor = k0 + 3, xpos[bd]
      else:
        rot0, anchor = k0, xanchor[j]
      R = xmat[bd]
      for i in range(3):
        ang = jnp.stack([R[0, i], R[1, i], R[2, i]])
        cdof[rot0 + i] = (ang, _cross(anchor, ang))

  # ---- body spatial velocities + cdof_dot (dynamics.com_vel semantics:
  #      the same static masks as the mask-matmul formulation — exact
  #      sparse unroll here, where each entry is a whole candidate tile)
  contrib = [(cdof[k][0] * qvel[k], cdof[k][1] * qvel[k]) for k in range(nv)]

  def _msum(ks, comp):
    if not ks:
      return zero3
    acc = contrib[ks[0]][comp]
    for k in ks[1:]:
      acc = acc + contrib[k][comp]
    return acc

  cvel = []
  for bd in range(nbody):
    ks = [k for k in range(nv) if tm.dof_body_mask[k, bd]]
    cvel.append((_msum(ks, 0), _msum(ks, 1)))
  cdof_dot = []
  for k in range(nv):
    ks = [i for i in range(nv) if tm.cdofdot_vel_mask[k, i]]
    va, vl = _msum(ks, 0), _msum(ks, 1)
    ca, cl = cdof[k]
    cdof_dot.append((_cross(va, ca), _cross(va, cl) + _cross(vl, ca)))

  dof_of_body = [[] for _ in range(nbody)]
  for k in range(nv):
    dof_of_body[tm.dof_body[k]].append(k)

  # ---- spatial inertia about world origin per body (6x6 blocks):
  #      [[Iw + m C Cᵀ, m C], [m Cᵀ, m 1]],  C = skew(com)
  ibody = []  # (Itop (3,3,*b), com (3,*b), mass float)
  for bd in range(nbody):
    R = ximat[bd]
    Idiag = one_c(tm.body_inertia[bd])
    # Iw = R diag(I) Rᵀ
    Iw = jnp.stack([
        jnp.stack([sum(R[i, k] * Idiag[k] * R[jj, k] for k in range(3))
                   for jj in range(3)]) for i in range(3)])
    ibody.append((Iw, xipos[bd], float(tm.body_mass[bd])))

  def inert_mul(Iw, com, mass, va, vl):
    # spatial inertia times motion: I_o = [[Iw + m CCᵀ, mC], [mCᵀ, m]]
    # with C = skew(c): CCᵀ = -C C, so (m CCᵀ) va = -m c×(c×va)
    ang = (jnp.stack([sum(Iw[i, k] * va[k] for k in range(3))
                      for i in range(3)])
           - mass * _cross(com, _cross(com, va)) + mass * _cross(com, vl))
    # Cᵀ va = -c×va
    lin = -mass * _cross(com, va) + mass * vl
    return ang, lin

  # ---- CRB: composite inertias (reverse accumulation in python)
  comp_mc = [ibody[bd][2] * ibody[bd][1] for bd in range(nbody)]
  comp_m = [ibody[bd][2] for bd in range(nbody)]
  # CCᵀ terms must compose per-body BEFORE summation: accumulate the full
  # 3x3 top-left block per body instead.
  def topleft(Iw, com, mass):
    # Iw + m CCᵀ = Iw - m [c]×[c]×
    cx, cy, cz = com[0], com[1], com[2]
    cc = jnp.stack([
        jnp.stack([cy * cy + cz * cz, -cx * cy, -cx * cz]),
        jnp.stack([-cx * cy, cx * cx + cz * cz, -cy * cz]),
        jnp.stack([-cx * cz, -cy * cz, cx * cx + cy * cy]),
    ])
    return Iw + mass * cc

  comp_TL = [topleft(*ibody[bd]) for bd in range(nbody)]
  for bd in range(nbody - 1, 0, -1):
    p = tm.body_parentid[bd]
    if p > 0:
      comp_TL[p] = comp_TL[p] + comp_TL[bd]
      comp_mc[p] = comp_mc[p] + comp_mc[bd]
      comp_m[p] = comp_m[p] + comp_m[bd]

  def comp_mul(bd, va, vl):
    """Composite spatial inertia of subtree(bd) times motion [va; vl]."""
    TL, mc, mm = comp_TL[bd], comp_mc[bd], comp_m[bd]
    ang = (jnp.stack([sum(TL[i, k] * va[k] for k in range(3))
                      for i in range(3)]) + _cross(mc, vl))
    lin = -_cross(mc, va) + mm * vl
    return ang, lin

  dof_body = tm.dof_body

  # qM[i, j] = cdof_i · (IC_j cdof_j) for i ancestor-or-self of j
  f_dof = [comp_mul(dof_body[j], cdof[j][0], cdof[j][1]) for j in range(nv)]
  anc = tm.dof_ancestor_mask
  qM = {}  # upper-triangular entries (i <= j) on the ancestor sparsity
  for j in range(nv):
    fa, fl = f_dof[j]
    for i in range(j + 1):
      if anc[i, j]:
        qM[(i, j)] = _dot3(cdof[i][0], fa) + _dot3(cdof[i][1], fl)

  # ---- RNE bias (q̈=0, base accel = −g)
  g = tm.gravity
  cacc = [(zero3, jnp.stack([zero - float(g[0]), zero - float(g[1]),
                             zero - float(g[2])]))]
  for bd in range(1, nbody):
    aa, al = cacc[tm.body_parentid[bd]]
    for k in dof_of_body[bd]:
      da, dl = cdof_dot[k]
      aa = aa + da * qvel[k]
      al = al + dl * qvel[k]
    cacc.append((aa, al))
  cfrc = []
  for bd in range(nbody):
    Iw, com, mass = ibody[bd]
    va, vl = cvel[bd]
    fa_v, fl_v = inert_mul(Iw, com, mass, va, vl)
    fa_a, fl_a = inert_mul(Iw, com, mass, *cacc[bd])
    # force cross: v ×* f = [ω×f_ang + v_lin×f_lin ; ω×f_lin]
    fa = fa_a + _cross(va, fa_v) + _cross(vl, fl_v)
    fl = fl_a + _cross(va, fl_v)
    cfrc.append((fa, fl))
  # backward accumulation
  cfa = [f[0] for f in cfrc]
  cfl = [f[1] for f in cfrc]
  for bd in range(nbody - 1, 0, -1):
    p = tm.body_parentid[bd]
    cfa[p] = cfa[p] + cfa[bd]
    cfl[p] = cfl[p] + cfl[bd]
  qfrc_bias = [
      _dot3(cdof[k][0], cfa[dof_body[k]]) + _dot3(cdof[k][1], cfl[dof_body[k]])
      for k in range(nv)]

  # ---- passive + actuation
  qfrc_passive = [-float(tm.dof_damping[k]) * qvel[k] for k in range(nv)]
  # smoothed Coulomb friction loss (dynamics.passive tanh regularization)
  for k in range(nv):
    fl = float(tm.dof_frictionloss[k]) if tm.dof_frictionloss is not None \
        else 0.0
    if fl != 0.0:
      qfrc_passive[k] = qfrc_passive[k] - fl * jnp.tanh(qvel[k] / 0.01)
  # scalar-joint springs about qpos_spring (dynamics.passive semantics)
  if tm.jnt_stiffness is not None:
    for j in range(tm.njnt):
      ks = float(tm.jnt_stiffness[j])
      if ks == 0.0 or tm.jnt_type[j] not in (JointType.HINGE,
                                             JointType.SLIDE):
        continue
      qadr, vadr = tm.jnt_qposadr[j], tm.jnt_dofadr[j]
      qfrc_passive[vadr] = qfrc_passive[vadr] - ks * (
          qpos[qadr] - float(tm.qpos_spring[qadr]))

  # fixed-tendon spring (deadband) + damper, projected through the
  # constant tendon Jacobian (dynamics.passive mj_passive semantics)
  ten_len_memo = {}

  def tendon_len_vel(t):
    if t not in ten_len_memo:
      ln = vl = None
      for qadr, vadr, coef in tm.ten_wraps[t]:
        lt, vt = coef * qpos[qadr], coef * qvel[vadr]
        ln = lt if ln is None else ln + lt
        vl = vt if vl is None else vl + vt
      ten_len_memo[t] = (ln, vl)
    return ten_len_memo[t]

  for t, wraps in enumerate(tm.ten_wraps):
    k_t = float(tm.ten_stiffness[t])
    c_t = float(tm.ten_damping[t])
    if k_t == 0.0 and c_t == 0.0:
      continue
    ln, vl = tendon_len_vel(t)
    lo = float(tm.ten_lengthspring[t, 0])
    hi = float(tm.ten_lengthspring[t, 1])
    stretch = jnp.where(ln > hi, ln - hi,
                        jnp.where(ln < lo, ln - lo, 0.0))
    f_t = -k_t * stretch - c_t * vl
    for qadr, vadr, coef in wraps:
      qfrc_passive[vadr] = qfrc_passive[vadr] + coef * f_t

  qfrc_act = [zero for _ in range(nv)]
  act_forces = []  # (nu) tiles for view.actuator_force
  for u in range(tm.nu):
    c = ctrl[u]
    if tm.ctrl_limited[u]:
      c = jnp.clip(c, float(tm.ctrl_lo[u]), float(tm.ctrl_hi[u]))
    gear = float(tm.act_gear[u])
    tid = tm.act_tendon[u] if tm.act_tendon else -1
    if tid >= 0:  # fixed-tendon transmission (dynamics.actuation TENDON)
      ln, vl = tendon_len_vel(tid)
      length = gear * ln
      velocity = gear * vl
    else:
      length = gear * qpos[int(tm.act_qadr[u])]
      velocity = gear * qvel[int(tm.act_vadr[u])]
    gp = tm.act_gainprm[u]
    if tm.act_gain_fixed[u]:
      gain = float(gp[0])
    else:
      gain = float(gp[0]) + float(gp[1]) * length + float(gp[2]) * velocity
    bp = tm.act_biasprm[u]
    if tm.act_bias_fixed[u]:
      bias = 0.0
    else:
      bias = float(bp[0]) + float(bp[1]) * length + float(bp[2]) * velocity
    force = gain * c + bias
    if tm.force_limited[u]:
      force = jnp.clip(force, float(tm.force_lo[u]), float(tm.force_hi[u]))
    act_forces.append(force)
    if tid >= 0:  # moment = gear · tendon coefficients (constant row)
      for qadr, vadr, coef in tm.ten_wraps[tid]:
        qfrc_act[vadr] = qfrc_act[vadr] + gear * coef * force
    else:
      k = int(tm.act_vadr[u])
      qfrc_act[k] = qfrc_act[k] + gear * force

  # ---- implicit-damping inertia factor
  mimp = {}
  for (i, j), v in qM.items():
    mimp[(i, j)] = v
  for k in range(nv):
    mimp[(k, k)] = (mimp[(k, k)] + float(tm.dof_armature[k]) +
                    h * float(tm.dof_damping[k]))
  # armature belongs in qM proper too (used only via mimp here)
  a_full = jnp.stack([
      jnp.stack([mimp.get((min(i, jj), max(i, jj)),
                          zero) for jj in range(nv)])
      for i in range(nv)])
  L = _chol_factor_tb(a_full, nv)

  qfrc_smooth = [qfrc_passive[k] + qfrc_act[k] - qfrc_bias[k]
                 for k in range(nv)]
  qacc_smooth = _chol_solve_tb(L, qfrc_smooth, nv)

  # ---- contacts + limits → constraint solve (solver.py semantics)
  ncon, nlim, nrow = tm.ncon, tm.nlim, tm.nrow
  qfrc_constraint = [zero for _ in range(nv)]
  if nrow:
    rows_J = []  # per row: list of nv tiles (or 0.0 consts)
    rows_pos = []
    rows_aref = []
    rows_active = []
    rows_diagref = []  # (imp,) per row for regularization
    rows_k, rows_b, rows_imp = [], [], []

    _gf_memo = {}

    def geom_frame(g):
      if g not in _gf_memo:
        bg = tm.geom_bodyid[g]
        gpos = xpos[bg] + _quat_rot(xquat[bg], one_c(tm.geom_pos[g]))
        gquat = _quat_mul(xquat[bg], one_c(tm.geom_quat[g]))
        _gf_memo[g] = (gpos, gquat)
      return _gf_memo[g]

    _gm_memo = {}

    def geom_mat(g):
      if g not in _gm_memo:
        _gm_memo[g] = _quat_to_mat(geom_frame(g)[1])
      return _gm_memo[g]

    def mat_vec(M, v):
      return jnp.stack([sum(M[i, k] * v[k] for k in range(3))
                        for i in range(3)])

    def mat_tvec(M, v):
      return jnp.stack([sum(M[k, i] * v[k] for k in range(3))
                        for i in range(3)])

    def geom_axis(gquat):
      gmat = _quat_to_mat(gquat)
      return jnp.stack([gmat[0, 2], gmat[1, 2], gmat[2, 2]])

    def frame_from_normal(n):
      """Tile version of collision._frame_from_normal: (3 row tiles)."""
      use_x = jnp.abs(n[0]) < 0.5
      ref = jnp.stack([jnp.where(use_x, zero + 1.0, zero),
                       jnp.where(use_x, zero, zero + 1.0),
                       zero])
      t1 = _cross(n, ref)
      t1 = t1 / jnp.sqrt(jnp.maximum(_dot3(t1, t1), 1e-24))
      return n, t1, _cross(n, t1)

    def sphere_box_point(center, radius, bp, bm, bsize):
      """Tile version of collision._sphere_box_point (argmin → wheres)."""
      rel = center - bp
      local = mat_tvec(bm, rel)
      s = [float(bsize[i]) for i in range(3)]
      absl = [jnp.abs(local[i]) for i in range(3)]
      clamped = [jnp.clip(local[i], -s[i], s[i]) for i in range(3)]
      inside = (absl[0] < s[0]) & (absl[1] < s[1]) & (absl[2] < s[2])
      fd = [s[i] - absl[i] for i in range(3)]
      # one-hot argmin with first-min tie-break (matches jnp.argmin)
      is_k = [(fd[0] <= fd[1]) & (fd[0] <= fd[2])]
      is_k.append(jnp.logical_not(is_k[0]) & (fd[1] <= fd[2]))
      is_k.append(jnp.logical_not(is_k[0] | is_k[1]))
      sgn = [jnp.sign(local[i]) for i in range(3)]
      surf = jnp.stack([
          jnp.where(inside,
                    jnp.where(is_k[i], sgn[i] * s[i], local[i]),
                    clamped[i]) for i in range(3)])
      world = bp + mat_vec(bm, surf)
      delta = center - world
      dn = jnp.sqrt(jnp.maximum(_dot3(delta, delta), 0.0))
      inv = 1.0 / jnp.maximum(dn, 1e-12)
      n_out = jnp.stack([-delta[i] * inv for i in range(3)])
      push = jnp.stack([jnp.where(is_k[i], -sgn[i], zero)
                        for i in range(3)])
      n_in = mat_vec(bm, push)
      n = jnp.stack([jnp.where(inside, n_in[i], n_out[i])
                     for i in range(3)])
      dist = jnp.where(inside, -dn - radius, dn - radius)
      pos = world - 0.5 * dist * n
      return dist, pos, n

    _sat_memo = {}

    def boxbox_sat(g1, g2, s1, s2):
      """Shared face-SAT data for a box-box pair (collision._box_box)."""
      key = (g1, g2)
      if key in _sat_memo:
        return _sat_memo[key]
      p1, _ = geom_frame(g1)
      p2, _ = geom_frame(g2)
      m1, m2 = geom_mat(g1), geom_mat(g2)
      t = p2 - p1
      axes, r_sum, proj = [], [], []
      for M in (m1, m2):
        for a in range(3):
          ax = jnp.stack([M[0, a], M[1, a], M[2, a]])
          r1 = sum(jnp.abs(_dot3(ax, jnp.stack([m1[0, i], m1[1, i],
                                                m1[2, i]]))) * float(s1[i])
                   for i in range(3))
          r2 = sum(jnp.abs(_dot3(ax, jnp.stack([m2[0, i], m2[1, i],
                                                m2[2, i]]))) * float(s2[i])
                   for i in range(3))
          axes.append(ax)
          r_sum.append(r1 + r2)
          proj.append(_dot3(ax, t))
      # first-max argmax over the 6 separations (matches jnp.argmax)
      best_sep = jnp.abs(proj[0]) - r_sum[0]
      best_ax, best_proj = axes[0], proj[0]
      for a in range(1, 6):
        sep = jnp.abs(proj[a]) - r_sum[a]
        take = sep > best_sep
        best_sep = jnp.maximum(best_sep, sep)
        best_ax = jnp.stack([jnp.where(take, axes[a][i], best_ax[i])
                             for i in range(3)])
        best_proj = jnp.where(take, proj[a], best_proj)
      n = best_ax * jnp.sign(best_proj)
      sup1 = sum(jnp.abs(_dot3(n, jnp.stack([m1[0, i], m1[1, i],
                                             m1[2, i]]))) * float(s1[i])
                 for i in range(3))
      sup2 = sum(jnp.abs(_dot3(n, jnp.stack([m2[0, i], m2[1, i],
                                             m2[2, i]]))) * float(s2[i])
                 for i in range(3))
      out = (p1, m1, p2, m2, n, sup1, sup2, frame_from_normal(n))
      _sat_memo[key] = out
      return out

    # per-point contact geometry first; rows are emitted afterwards in the
    # tile layout order (see step_tb docstring)
    con_geo = [None] * ncon
    for ci in range(ncon):
      cp = tm.con_points[ci]
      if cp.kind in ("plane_sphere", "plane_capend"):
        gpos, gquat = geom_frame(cp.g2)
        if cp.kind == "plane_sphere":
          end = gpos
        else:
          end = gpos + cp.sign * cp.half2 * geom_axis(gquat)
        n_c = cp.frame[0]
        r = cp.r2
        dist = (float(n_c[0]) * (end[0] - float(cp.ppos[0])) +
                float(n_c[1]) * (end[1] - float(cp.ppos[1])) +
                float(n_c[2]) * (end[2] - float(cp.ppos[2]))) - r
        scale = r + 0.5 * dist
        cpos = jnp.stack([end[k] - float(n_c[k]) * scale for k in range(3)])
        frame = tuple(cp.frame[row] for row in range(3))  # numpy rows
      elif cp.kind == "plane_boxcorner":
        # collision._plane_box: one candidate per box corner
        gpos, _ = geom_frame(cp.g2)
        off = (cp.size2 * cp.corner).astype(np.float32)
        corner = gpos + mat_vec(geom_mat(cp.g2), jnp.stack(
            [zero + float(off[i]) for i in range(3)]))
        n_c = cp.frame[0]
        dist = (float(n_c[0]) * (corner[0] - float(cp.ppos[0])) +
                float(n_c[1]) * (corner[1] - float(cp.ppos[1])) +
                float(n_c[2]) * (corner[2] - float(cp.ppos[2])))
        cpos = jnp.stack([corner[k] - float(n_c[k]) * 0.5 * dist
                          for k in range(3)])
        frame = tuple(cp.frame[row] for row in range(3))
      elif cp.kind in ("sphere_box", "cap_box"):
        p1, q1 = geom_frame(cp.g1)
        if cp.kind == "cap_box":
          p1 = p1 + cp.sign * cp.half1 * geom_axis(q1)
        p2, _ = geom_frame(cp.g2)
        dist, cpos, n = sphere_box_point(
            p1, cp.r1, p2, geom_mat(cp.g2), cp.size2)
        frame = frame_from_normal(n)
      elif cp.kind == "boxbox_corner":
        p1, m1, p2, m2, n, sup1, sup2, frame = boxbox_sat(
            cp.g1, cp.g2, cp.size1, cp.size2)
        if cp.owner == 2:  # corner of box2 against box1's slab
          pc, mc, sc = p2, m2, cp.size2
          po, mo, so = p1, m1, cp.size1
          sup_o, sgn = sup1, 1.0
        else:  # corner of box1 against box2's slab
          pc, mc, sc = p1, m1, cp.size1
          po, mo, so = p2, m2, cp.size2
          sup_o, sgn = sup2, -1.0
        off = (sc * cp.corner).astype(np.float32)
        c = pc + mat_vec(mc, jnp.stack(
            [zero + float(off[i]) for i in range(3)]))
        rel = c - po
        dist = sgn * _dot3(rel, n) - sup_o
        # lateral-overhang guard (collision._box_box corner_points)
        local = mat_tvec(mo, rel)
        n_loc = mat_tvec(mo, n)
        big = 4.0 * (float(np.max(cp.size1)) + float(np.max(cp.size2)))
        slack = 0.05 * float(np.min(so))
        overhang = jnp.maximum(
            jnp.maximum(
                jnp.abs(local[0]) - float(so[0]) - big * jnp.abs(n_loc[0]),
                jnp.abs(local[1]) - float(so[1]) - big * jnp.abs(n_loc[1])),
            jnp.abs(local[2]) - float(so[2]) - big * jnp.abs(n_loc[2]),
        ) - slack
        dist = jnp.maximum(dist, overhang)
        cpos = jnp.stack([c[i] - 0.5 * dist * sgn * n[i]
                          for i in range(3)])
      else:
        p1, q1 = geom_frame(cp.g1)
        p2, q2 = geom_frame(cp.g2)
        if cp.kind == "sphere_sphere":
          c1, c2 = p1, p2
        elif cp.kind == "sphere_cap":
          u2 = geom_axis(q2)
          t = jnp.clip(_dot3(p1 - p2, u2), -cp.half2, cp.half2)
          c1, c2 = p1, p2 + t * u2
        else:  # cap_cap (collision._capsule_capsule, smooth clamped)
          u1, u2 = geom_axis(q1), geom_axis(q2)
          rvec = p2 - p1
          uu = _dot3(u1, u2)
          ru1, ru2 = _dot3(rvec, u1), _dot3(rvec, u2)
          det = jnp.maximum(1.0 - uu * uu, 1e-9)
          t1c = jnp.clip((ru1 - uu * ru2) / det, -cp.half1, cp.half1)
          t2c = jnp.clip(_dot3(p1 + t1c * u1 - p2, u2), -cp.half2, cp.half2)
          t1c = jnp.clip(_dot3(p2 + t2c * u2 - p1, u1), -cp.half1, cp.half1)
          c1 = p1 + t1c * u1
          c2 = p2 + t2c * u2
        delta = c2 - c1
        dn = jnp.sqrt(jnp.maximum(_dot3(delta, delta), 1e-24))
        n = delta / dn
        dist = dn - (cp.r1 + cp.r2)
        cpos = c1 + n * (cp.r1 + 0.5 * dist)
        frame = frame_from_normal(n)
      dist = dist - cp.margin
      con_geo[ci] = (dist, frame, cpos)

    # ---- row emission, tile layout order: [condim≥3 points (n,t1,t2),
    #      condim-1 normals, torsional, rolling, joint limits, tendon
    #      limits, equality]. Order is internal to the tile path (APGD is
    #      row-order invariant); all-condim-3 models keep the historical
    #      point-major layout bit-for-bit.
    fric_cis = [ci for ci, cp in enumerate(tm.con_points)
                if cp.condim >= 3]
    one_cis = [ci for ci, cp in enumerate(tm.con_points) if cp.condim == 1]
    tor_cis = [ci for ci, cp in enumerate(tm.con_points) if cp.condim >= 4]
    roll_cis = [ci for ci, cp in enumerate(tm.con_points)
                if cp.condim >= 6]

    def _point_sgn(cp):
      path1 = tm.dof_body_mask[:, cp.body1]
      path2 = tm.dof_body_mask[:, cp.body2]
      # relative-velocity jacobian sign per dof (solver._contact_jacobian)
      return [float(path2[k]) - float(path1[k]) for k in range(nv)]

    def _emit_contact_row(cp, fr, dist, cpos, sgn_k, is_normal):
      Jrow = []
      for k in range(nv):
        if sgn_k[k] != 0.0:
          ca, cl = cdof[k]
          jp = cl + _cross(ca, cpos)
          Jrow.append(sgn_k[k] * _dot3(fr, jp))
        else:
          Jrow.append(None)
      rows_J.append(Jrow)
      rows_pos.append(jnp.minimum(dist, 0.0) if is_normal else zero)
      rows_active.append(dist < 0)
      rows_imp.append(_impedance(dist, cp.solimp))
      kk, bb = _kb(cp.solref, float(cp.solimp[1]))
      rows_k.append(kk)
      rows_b.append(bb)

    for ci in fric_cis:
      cp = tm.con_points[ci]
      dist, frame, cpos = con_geo[ci]
      sgn_k = _point_sgn(cp)
      for row in range(3):
        _emit_contact_row(cp, frame[row], dist, cpos, sgn_k, row == 0)
    for ci in one_cis:
      cp = tm.con_points[ci]
      dist, frame, cpos = con_geo[ci]
      _emit_contact_row(cp, frame[0], dist, cpos, _point_sgn(cp), True)

    def _emit_angular_row(ci, axis):
      """Relative angular-velocity row about contact-frame `axis`
      (solver._angular_rows: torsional = normal, rolling = tangents).
      Zero positional error, impedance shared with the point's normal row,
      same solref, active with the point (MuJoCo condim 4/6 semantics)."""
      cp = tm.con_points[ci]
      dist, frame, _ = con_geo[ci]
      fr = frame[axis]
      sgn_k = _point_sgn(cp)
      Jrow = []
      for k in range(nv):
        if sgn_k[k] != 0.0:
          Jrow.append(sgn_k[k] * _dot3(fr, cdof[k][0]))
        else:
          Jrow.append(None)
      rows_J.append(Jrow)
      rows_pos.append(zero)  # no positional error on friction rows
      rows_active.append(dist < 0)
      # shared impedance with the point's normal row (MuJoCo semantics)
      rows_imp.append(_impedance(dist, cp.solimp))
      kk, bb = _kb(cp.solref, float(cp.solimp[1]))
      rows_k.append(kk)
      rows_b.append(bb)

    for ci in tor_cis:
      _emit_angular_row(ci, 0)
    for axis in (1, 2):
      for ci in roll_cis:
        _emit_angular_row(ci, axis)

    for li, j in enumerate(tm.lim_jnt):
      q = qpos[tm.lim_qadr[li]]
      imp_si = np.asarray(_DEFAULT_SOLIMP)
      kk, bb = _kb(tm.lim_solref[li], float(imp_si[1]))
      for side in range(2):
        if side == 0:
          posv = q - tm.lim_lo[li] - tm.lim_margin[li]
          sgn = 1.0
        else:
          posv = tm.lim_hi[li] - q - tm.lim_margin[li]
          sgn = -1.0
        Jrow = [None] * nv
        Jrow[tm.lim_vadr[li]] = zero + sgn
        rows_J.append(Jrow)
        rows_pos.append(jnp.minimum(posv, 0.0))
        rows_active.append(posv < 0)
        rows_imp.append(_impedance(posv, imp_si))
        rows_k.append(kk)
        rows_b.append(bb)

    # tendon limit rows (solver._tendon_limit_rows: two-sided, constant
    # Jacobian = the fixed tendon's joint coefficients, default solimp)
    for li, t in enumerate(tm.ten_lim):
      wraps = tm.ten_wraps[t]
      ln = None
      for qadr, vadr, coef in wraps:
        term = coef * qpos[qadr]
        ln = term if ln is None else ln + term
      imp_si = np.asarray(_DEFAULT_SOLIMP)
      kk, bb = _kb(tm.ten_lim_solref[li], float(imp_si[1]))
      lo = float(tm.ten_lim_range[li, 0])
      hi = float(tm.ten_lim_range[li, 1])
      mg = tm.ten_lim_margin[li]
      for side in range(2):
        if side == 0:
          posv = ln - lo - mg
          sgn = 1.0
        else:
          posv = hi - ln - mg
          sgn = -1.0
        Jrow = [None] * nv
        for qadr, vadr, coef in wraps:
          add = zero + sgn * coef
          Jrow[vadr] = add if Jrow[vadr] is None else Jrow[vadr] + add
        rows_J.append(Jrow)
        rows_pos.append(jnp.minimum(posv, 0.0))
        rows_active.append(posv < 0)
        rows_imp.append(_impedance(posv, imp_si))
        rows_k.append(kk)
        rows_b.append(bb)

    # equality rows (solver._equality_rows: bilateral — signed positional
    # error, no cone projection, always active, excluded from warm start)
    always = zero < 1.0
    for er in tm.eq_rows:
      kk, bb = _kb(er.solref, float(er.solimp[1]))
      if er.kind == 2:  # JOINT: qpos1 − qpos0_1 = poly(qpos2 − qpos0_2)
        j1, j2 = er.ob1, er.ob2
        qa1, va1 = tm.jnt_qposadr[j1], tm.jnt_dofadr[j1]
        q1 = qpos[qa1] - float(tm.qpos0[qa1])
        Jrow = [None] * nv
        Jrow[va1] = zero + 1.0
        dat = er.data
        if j2 >= 0:
          qa2, va2 = tm.jnt_qposadr[j2], tm.jnt_dofadr[j2]
          dq = qpos[qa2] - float(tm.qpos0[qa2])
          poly = (float(dat[0]) + float(dat[1]) * dq
                  + float(dat[2]) * dq ** 2 + float(dat[3]) * dq ** 3
                  + float(dat[4]) * dq ** 4)
          dpoly = (float(dat[1]) + 2 * float(dat[2]) * dq
                   + 3 * float(dat[3]) * dq ** 2
                   + 4 * float(dat[4]) * dq ** 3)
          add = -dpoly
          Jrow[va2] = add if Jrow[va2] is None else Jrow[va2] + add
          posv = q1 - poly
        else:
          posv = q1 - float(dat[0])
        rows_J.append(Jrow)
        rows_pos.append(posv)
        rows_active.append(always)
        rows_imp.append(_impedance(posv, er.solimp))
        rows_k.append(kk)
        rows_b.append(bb)
        continue
      # CONNECT / WELD share the translational anchor-coincidence rows
      b1, b2 = er.ob1, er.ob2
      if er.kind == 0:  # CONNECT: anchor1 = data[0:3], anchor2 = data[3:6]
        a1, a2 = er.data[0:3], er.data[3:6]
      else:  # WELD: anchor2 = data[0:3], anchor1 = data[3:6]
        a1, a2 = er.data[3:6], er.data[0:3]
      p1 = xpos[b1] + _quat_rot(xquat[b1], a1.astype(np.float32))
      p2 = xpos[b2] + _quat_rot(xquat[b2], a2.astype(np.float32))
      m1 = tm.dof_body_mask[:, b1]
      m2 = tm.dof_body_mask[:, b2]
      # point-translation jacobians, memoized per dof
      jc1 = {k: cdof[k][1] + _cross(cdof[k][0], p1)
             for k in range(nv) if m1[k]}
      jc2 = {k: cdof[k][1] + _cross(cdof[k][0], p2)
             for k in range(nv) if m2[k]}
      for i in range(3):
        Jrow = [None] * nv
        for k in range(nv):
          val = None
          if m1[k]:
            val = jc1[k][i]
          if m2[k]:
            val = -jc2[k][i] if val is None else val - jc2[k][i]
          Jrow[k] = val
        posv = p1[i] - p2[i]
        rows_J.append(Jrow)
        rows_pos.append(posv)
        rows_active.append(always)
        rows_imp.append(_impedance(posv, er.solimp))
        rows_k.append(kk)
        rows_b.append(bb)
      if er.kind == 1:  # WELD orientation rows (torquescale-weighted)
        tq = max(float(er.data[10]), 1e-8)
        q1r = _quat_mul(xquat[b1], er.data[6:10].astype(np.float32))
        rot_err = _quat_sub_tb(q1r, xquat[b2])
        for i in range(3):
          Jrow = [None] * nv
          for k in range(nv):
            sgn = (1.0 if m1[k] else 0.0) - (1.0 if m2[k] else 0.0)
            if sgn != 0.0:
              Jrow[k] = tq * sgn * cdof[k][0][i]
          posv = tq * rot_err[i]
          rows_J.append(Jrow)
          rows_pos.append(posv)
          rows_active.append(always)
          rows_imp.append(_impedance(posv, er.solimp))
          rows_k.append(kk)
          rows_b.append(bb)

    # stacked constraint algebra in 8-ROW BLOCKS: the per-scalar style
    # used above is latency-bound on TPU (single-tile dependency chains);
    # from here on every op carries an (8, |support|) payload. Each block
    # stores ONLY the dof columns some row in it touches (static sparsity
    # from the kinematic tree): contact rows span the two bodies' paths,
    # limit rows one dof — for tall models (dm_control humanoid, nv=27,
    # nrow~200) this cuts the Jacobian VMEM and the matvec flops ~2-4x,
    # which is what lets such models fit the megakernel at all.
    Jb = []  # (tile (≤8, |sup|, *b), support dof tuple)
    for r0 in range(0, nrow, 8):
      rows = list(range(r0, min(r0 + 8, nrow)))
      sup = tuple(sorted({k for r_i in rows for k in range(nv)
                          if rows_J[r_i][k] is not None}))
      if not sup:
        sup = (0,)
      B = jnp.stack([
          jnp.stack([rows_J[r_i][k] if rows_J[r_i][k] is not None else zero
                     for k in sup])
          for r_i in rows])
      Jb.append((B, sup))

    def jmat_vec(vk_stack):
      """J v for a (nv, *b) stacked vector → (nrow, *b)."""
      outs = []
      for B, sup in Jb:
        sub = jnp.stack([vk_stack[k] for k in sup])  # (|sup|, *b)
        outs.append(jnp.sum(B * sub[None], axis=1))
      return jnp.concatenate(outs)

    def jmat_t_vec(v):
      """Jᵀ v for a (nrow, *b) vector → (nv, *b)."""
      acc = [None] * nv
      for bi, (B, sup) in enumerate(Jb):
        seg = v[8 * bi:8 * bi + B.shape[0]]
        part = jnp.sum(B * seg[:, None], axis=0)  # (|sup|, *b)
        for si, k in enumerate(sup):
          acc[k] = part[si] if acc[k] is None else acc[k] + part[si]
      return jnp.stack([a if a is not None else zero for a in acc])

    # aref = −imp (k · pos_term + b · J q̇); per-row k/b are python floats
    vel_r = jmat_vec(qvel)  # (nrow, *b)
    kpos = jnp.stack([rows_k[r_i] * rows_pos[r_i] for r_i in range(nrow)])
    b_r = jnp.stack([rows_b[r_i] * vel_r[r_i] for r_i in range(nrow)])
    imp_s = jnp.stack(rows_imp)
    aref_s = -imp_s * (kpos + b_r)

    # Delassus algebra. Two regimes sharing one iterate sequence:
    #  - dense: materialize A = J M⁻¹ Jᵀ ((nrow, nrow) tile stack) — best
    #    when it fits VMEM (small nrow);
    #  - matrix-free: A·v = J·M⁻¹·(Jᵀv) with an unrolled Cholesky solve
    #    per product — the (nrow)² stack never exists, which is what lets
    #    contact-rich free-joint models (humanoid: nrow ~64) run at the
    #    full (8, 128) candidate tile. Threshold: ~4 MB of A-tiles.
    dense_amat = amat_is_dense(nrow)

    def solve_vk(vec_k):
      """M⁻¹ applied to a dof-indexed list of tiles."""
      return _chol_solve_tb(L, vec_k, nv)

    if dense_amat:
      # X = M⁻¹ Jᵀ via one multi-RHS masked-unrolled solve (payload=rows)
      # (full-width J stack — dense regime means nrow is small)
      Js = jnp.stack([
          jnp.stack([rows_J[r_i][k] if rows_J[r_i][k] is not None else zero
                     for k in range(nv)])
          for r_i in range(nrow)])  # (nrow, nv, *b)
      X = solve_vk([Js[:, k] for k in range(nv)])  # nv × (nrow, *b)
      amat = sum(Js[:, k][:, None] * X[k][None, :] for k in range(nv))
      raw_diag = jnp.stack([amat[r_i, r_i] for r_i in range(nrow)])
    else:
      # chunked diag: diag[r] = J_r · M⁻¹ J_rᵀ, one block at a time (the
      # full X would be as large as the Jacobian again)
      diag_parts = []
      for B, sup in Jb:
        zrow = B[:, 0] * 0.0
        cols = [zrow] * nv
        for si, k in enumerate(sup):
          cols[k] = B[:, si]
        Xc = solve_vk(cols)
        diag_parts.append(sum(B[:, si] * Xc[k]
                              for si, k in enumerate(sup)))
      raw_diag = jnp.concatenate(diag_parts)
    diag = jnp.clip(raw_diag, 1e-10, None)
    a0 = jmat_vec(jnp.stack(qacc_smooth))

    nf, n1 = len(fric_cis), len(one_cis)
    ntor, nroll = len(tor_cis), len(roll_cis)
    nang = ntor + 2 * nroll
    neq_r = tm.neq_rows
    nuni = nrow - neq_r

    # Softness R = (1−d)/d · diagApprox (mirrors solver.py): unilateral
    # rows use the live Delassus diagonal; equality rows use the
    # compile-time invweight0 diagApprox so a degenerate row's dual stays
    # bounded (MuJoCo mj_diagApprox semantics). Per-row PYTHON-float
    # constants only — Pallas rejects captured array constants.
    if neq_r:
      eq_da = np.concatenate([er.diagapprox for er in tm.eq_rows])
      reg_base = jnp.concatenate([
          diag[:nuni],
          jnp.stack([jnp.full_like(diag[0], float(eq_da[r]))
                     for r in range(neq_r)])])
    else:
      reg_base = diag
    reg = (1.0 - imp_s) / imp_s * reg_base
    # degenerate-row mask (mirrors solver.py): A_rr ≈ 0 rows — no DOF can
    # accelerate along them — are deactivated per candidate so the dual
    # never chases a near-singular direction; equality rows are exempt
    # (their R is floored by diagApprox, dual bounded)
    nondeg = raw_diag > 1e-8 * jnp.max(raw_diag, axis=0, keepdims=True)
    if neq_r:
      nondeg = jnp.concatenate(
          [nondeg[:nuni], jnp.ones_like(nondeg[nuni:])])
    active_s = jnp.stack(rows_active) & nondeg
    off_ang = 3 * nf + n1
    lim0 = off_ang + nang  # first (joint/tendon) limit row
    tor_fpos = [fric_cis.index(ci) for ci in tor_cis]
    roll_fpos = [fric_cis.index(ci) for ci in roll_cis]

    # ---- Jacobi preconditioning (mirrors solver.py): solve in g = f/s,
    # s = 1/sqrt(diag+reg) with scales tied inside tangent/rolling pairs
    # so the cone stays circular — κ(Ã) is O(1) where angular rows would
    # otherwise blow it to 1000s (1/inertia vs 1/mass diagonals).
    dr = diag + reg  # (nrow, *b)
    if nf:
      fc_dr = dr[:3 * nf].reshape((nf, 3) + b)
      mt = 0.5 * (fc_dr[:, 1] + fc_dr[:, 2])
      dr_s = jnp.concatenate([
          jnp.stack([fc_dr[:, 0], mt, mt],
                    axis=1).reshape((3 * nf,) + b), dr[3 * nf:]])
    else:
      dr_s = dr
    if nroll:
      a_ = off_ang + ntor
      mr = 0.5 * (dr_s[a_:a_ + nroll] + dr_s[a_ + nroll:a_ + 2 * nroll])
      dr_s = jnp.concatenate([dr_s[:a_], mr, mr, dr_s[a_ + 2 * nroll:]])
    s_pre = 1.0 / jnp.sqrt(jnp.clip(dr_s, 1e-12, None))
    if nf:
      fc_s = s_pre[:3 * nf].reshape((nf, 3) + b)
      s_n = fc_s[:, 0]
      s_t = fc_s[:, 1]
      mu_t = jnp.stack([float(tm.con_points[ci].mu) * s_n[i] / s_t[i]
                        for i, ci in enumerate(fric_cis)])
    if ntor:
      mu_tor = jnp.stack([
          float(tm.con_points[ci].mu_tor) * s_n[tor_fpos[i]]
          / s_pre[off_ang + i] for i, ci in enumerate(tor_cis)])
    if nroll:
      mu_roll = jnp.stack([
          float(tm.con_points[ci].mu_roll) * s_n[roll_fpos[i]]
          / s_pre[off_ang + ntor + i] for i, ci in enumerate(roll_cis)])

    def project(g):
      parts = []
      gn = None
      if nf:
        gc = g[:3 * nf].reshape((nf, 3) + b)
        gn = jnp.maximum(gc[:, 0], 0.0)
        gt1, gt2 = gc[:, 1], gc[:, 2]
        tsq = gt1 * gt1 + gt2 * gt2
        tnorm = jnp.sqrt(jnp.where(tsq < 1e-24, 1.0, tsq))
        tnorm = jnp.where(tsq < 1e-24, 0.0, tnorm)
        cap = mu_t * gn
        scale = jnp.where(tnorm > cap, cap / jnp.maximum(tnorm, 1e-12),
                          1.0)
        parts.append(jnp.stack([gn, gt1 * scale, gt2 * scale],
                               axis=1).reshape((3 * nf,) + b))
      if n1:  # condim-1 normals: nonnegative orthant
        parts.append(jnp.maximum(g[3 * nf:3 * nf + n1], 0.0))
      if ntor:
        # angular caps couple to the SAME point's normal force iterate
        # (separate interval/disc projections — a box approximation of
        # MuJoCo's coupled elliptic cone; mirrors solver.py)
        cap_t = jnp.stack([mu_tor[i] * gn[tor_fpos[i]]
                           for i in range(ntor)])
        parts.append(jnp.clip(g[off_ang:off_ang + ntor], -cap_t, cap_t))
      if nroll:
        r1 = g[off_ang + ntor:off_ang + ntor + nroll]
        r2 = g[off_ang + ntor + nroll:off_ang + nang]
        rsq = r1 * r1 + r2 * r2
        rnorm = jnp.sqrt(jnp.where(rsq < 1e-24, 1.0, rsq))
        rnorm = jnp.where(rsq < 1e-24, 0.0, rnorm)
        cap_r = jnp.stack([mu_roll[i] * gn[roll_fpos[i]]
                           for i in range(nroll)])
        rs = jnp.where(rnorm > cap_r, cap_r / jnp.maximum(rnorm, 1e-12),
                       1.0)
        parts.extend([r1 * rs, r2 * rs])
      if nuni > lim0:  # joint + tendon limit rows
        parts.append(jnp.maximum(g[lim0:nuni], 0.0))
      if neq_r:  # bilateral equality rows: no cone
        parts.append(g[nuni:])
      g = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
      return jnp.where(active_s, g, 0.0)

    # Preconditioned APGD on the regularized dual (must mirror
    # physics/solver.py: Nesterov with adaptive restart; step rule
    # matches solver.py per model — Gershgorin on the dense path, power
    # iteration matrix-free). Iterates live in g = f/s coordinates.
    dinv = 1.0 / (diag + reg)
    g_init = project((aref_s - a0) * dinv / s_pre)
    if efc_lambda is not None:
      # warm start (mirrors solver.py): previous step's PHYSICAL duals
      # rescaled into g, unless all-zero (cold); branch-free per-
      # candidate select. Bilateral AND angular rows are excluded —
      # their duals can be non-unique (duplicated corner-point angular
      # Jacobians), and warm-starting a non-unique dual integrates
      # drift (see solver.py).
      cold = jnp.sum(jnp.abs(efc_lambda), axis=0) == 0  # (*b,)
      lam_g = efc_lambda / s_pre
      parts_w = [lam_g[:off_ang]]
      if nang:
        parts_w.append(g_init[off_ang:lim0])
      parts_w.append(lam_g[lim0:nuni])
      if neq_r:
        parts_w.append(g_init[nuni:])
      warm = (jnp.concatenate([p for p in parts_w if p.shape[0]])
              if (nang or neq_r) else lam_g)
      g0 = project(jnp.where(cold[None], g_init, warm))
    else:
      g0 = g_init
    b_vec = a0 - aref_s

    if dense_amat:
      def amul(v):  # A v  (nrow, *b)
        return jnp.sum(amat * v[None], axis=1)
    else:
      def amul(v):
        # J M⁻¹ Jᵀ v via the block contractions — the (nrow, nrow)
        # Delassus stack never exists
        jtv = jmat_t_vec(v)  # (nv, *b)
        minv = jnp.stack(solve_vk([jtv[k] for k in range(nv)]))
        return jmat_vec(minv)  # (nrow, *b)

    # step denominators FLOORED AT 1 (mirrors solver.py): Ã has
    # (near-)unit diagonal so λmax ≥ ~1 with any active row; unfloored,
    # an all-inactive candidate takes a 1e8 step that NaNs reverse-mode
    # AD through the loop
    if dense_amat:
      # Gershgorin on the preconditioned operator Ã = S(A+R)S
      row_sum = s_pre * jnp.sum(jnp.abs(amat) * s_pre[None], axis=1) \
          + s_pre * s_pre * reg
      step = 1.0 / jnp.maximum(
          jnp.max(jnp.where(active_s, row_sum, 0.0), axis=0), 1.0)
    else:
      def opmul(v):  # Ã v on the active rows (solver.py opmul)
        v = jnp.where(active_s, v, 0.0)
        sv = s_pre * v
        return jnp.where(active_s, s_pre * (amul(sv) + reg * sv), 0.0)

      v_p = jnp.where(active_s, jnp.ones_like(g0), 0.0)
      for _ in range(_POWER_ITERS):  # mirrors solver._POWER_ITERS
        w_p = opmul(v_p)
        # sqrt(max(·)): d sqrt/dx = ∞ at 0 NaNs the backward pass
        v_p = w_p / jnp.sqrt(jnp.maximum(
            jnp.sum(w_p * w_p, axis=0), 1e-30))
      lam = jnp.sum(v_p * opmul(v_p), axis=0)
      step = 1.0 / jnp.maximum(1.25 * lam, 1.0)  # (*b,)

    def grad(g):
      f = s_pre * g
      return s_pre * (amul(f) + reg * f + b_vec)

    def apgd_body(_, carry):
      g, y, t = carry
      g_new = project(y - step[None] * grad(y))
      t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
      beta = (t - 1.0) / t_new
      dg = g_new - g
      reverse = jnp.sum(dg * (y - g_new), axis=0) > 0  # (*b,)
      y_new = jnp.where(reverse[None], g_new, g_new + beta * dg)
      t_new2 = jnp.where(reverse, jnp.ones_like(t), t_new)
      return g_new, y_new, t_new2

    # data-derived momentum init (see solver.py: shard_map VMA consistency)
    t0s = 1.0 + 0.0 * jnp.sum(g0, axis=0)
    g, _, _ = jax.lax.fori_loop(0, _ITERATIONS, apgd_body, (g0, g0, t0s))
    f = s_pre * g  # back to physical dual forces

    qfc = jmat_t_vec(f)  # (nv, *b)
    qfrc_constraint = [qfc[k] for k in range(nv)]
    lam_out = f  # converged PHYSICAL duals → next step's warm start
  else:
    lam_out = jnp.zeros((1,) + b, dtype=dtype) if efc_lambda is None \
        else efc_lambda

  # ---- integrate (semi-implicit Euler, implicit damping in the factor)
  qacc = _chol_solve_tb(
      L, [qfrc_smooth[k] + qfrc_constraint[k] for k in range(nv)], nv)
  qvel2 = jnp.stack([qvel[k] + h * qacc[k] for k in range(nv)])
  if tm.nq == nv and all(jt in (JointType.HINGE, JointType.SLIDE)
                         for jt in tm.jnt_type):
    qpos2 = qpos + h * qvel2  # scalar joints, dense addressing
  else:  # step.integrate_pos semantics: exact quaternion exponential
    out_q = [None] * tm.nq
    for j in range(tm.njnt):
      qadr, vadr = tm.jnt_qposadr[j], tm.jnt_dofadr[j]
      jt = tm.jnt_type[j]
      if jt == JointType.FREE:
        for i in range(3):
          out_q[qadr + i] = qpos[qadr + i] + h * qvel2[vadr + i]
        quat = _quat_integrate(
            jnp.stack([qpos[qadr + 3], qpos[qadr + 4],
                       qpos[qadr + 5], qpos[qadr + 6]]),
            qvel2[vadr + 3], qvel2[vadr + 4], qvel2[vadr + 5], h)
        for i in range(4):
          out_q[qadr + 3 + i] = quat[i]
      elif jt == JointType.BALL:
        quat = _quat_integrate(
            jnp.stack([qpos[qadr], qpos[qadr + 1],
                       qpos[qadr + 2], qpos[qadr + 3]]),
            qvel2[vadr], qvel2[vadr + 1], qvel2[vadr + 2], h)
        for i in range(4):
          out_q[qadr + i] = quat[i]
      else:
        out_q[qadr] = qpos[qadr] + h * qvel2[vadr]
    qpos2 = jnp.stack(out_q)

  # site/geom frames for residuals
  site_xpos = []
  site_xmat = []
  for s in range(tm.nsite):
    bs = tm.site_bodyid[s]
    site_xpos.append(xpos[bs] + _quat_rot(xquat[bs],
                                           one_c(tm.site_pos[s])))
    site_xmat.append(_quat_to_mat(_quat_mul(xquat[bs],
                                            one_c(tm.site_quat[s]))))
  geom_xpos = []
  for g in range(tm.ngeom):
    bg = tm.geom_bodyid[g]
    geom_xpos.append(xpos[bg] + _quat_rot(xquat[bg],
                                          one_c(tm.geom_pos[g])))

  # subtree CoM (nbody, 3, *b): comp_mc/comp_m are already the subtree
  # mass-weighted sums (CRB backward accumulation); body 0 = whole system
  root_mc = comp_mc[0]
  root_m = comp_m[0]
  for bd in range(1, nbody):
    if tm.body_parentid[bd] == 0:
      root_mc = root_mc + comp_mc[bd]
      root_m = root_m + comp_m[bd]
  sub_com = [root_mc / max(root_m, 1e-12)] + [
      comp_mc[bd] / max(comp_m[bd], 1e-12) for bd in range(1, nbody)]

  view = SimpleNamespace(
      qpos=qpos2, qvel=qvel2, ctrl=ctrl,
      qacc=jnp.stack(qacc),
      xpos=jnp.stack(xpos),  # NOTE: pre-step frames (cost one stage apart,
      xquat=jnp.stack(xquat),  # same convention as ops/rollout docstring)
      xmat=jnp.stack(xmat),
      xipos=jnp.stack(xipos),
      ximat=jnp.stack(ximat),
      cvel=jnp.stack([jnp.concatenate([va, vl], axis=0)
                      for va, vl in cvel]),  # (nbody, 6, *b), pre-step
      subtree_com=jnp.stack(sub_com),
      site_xpos=(jnp.stack(site_xpos) if site_xpos
                 else jnp.zeros((0, 3) + b, dtype=dtype)),  # unused if empty
      site_xmat=(jnp.stack(site_xmat) if site_xmat
                 else jnp.zeros((0, 3, 3) + b, dtype=dtype)),
      geom_xpos=(jnp.stack(geom_xpos) if geom_xpos
                 else jnp.zeros((0, 3) + b, dtype=dtype)),
      # contact dist/frame for grasp-shaping residuals (bimanual family):
      # LAZY — only traced into the kernel when the residual touches them
      contact=_TileContactView(tm, con_geo if nrow and ncon else None,
                               zero),
      actuator_force=(jnp.stack(act_forces) if act_forces
                      else jnp.zeros((0,) + b, dtype=dtype)),
      mocap_pos=mocap_pos,
      mocap_quat=mocap_quat,
      userdata=userdata,
      efc_lambda=lam_out,
  )
  return qpos2, qvel2, view
