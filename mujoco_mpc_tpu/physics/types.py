"""Model / Data pytrees for the TPU-native physics engine.

Design: the engine is a set of pure functions over two pytrees, mirroring the
role of MuJoCo's mjModel/mjData in the reference (which treats physics as an
external C dependency; here it is the core on-device compute). Structural /
topological quantities (sizes, tree indices, joint types, collision pairs) are
static Python metadata so XLA specializes and unrolls over them; all numeric
parameters (masses, gains, ranges, solver params) are traced arrays, which
makes the whole engine differentiable w.r.t. model parameters — used by the
direct optimizer's system-ID mode (reference: mjpc/direct/model_parameters.h).

Conventions match MuJoCo: quaternions (w,x,y,z); joint types FREE/BALL/
SLIDE/HINGE; spatial 6-vectors [angular; linear] about the world origin.
"""

from __future__ import annotations

import enum
from typing import Any, Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7


class ActDyn(enum.IntEnum):
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3


class GainBias(enum.IntEnum):
  FIXED = 0  # gain: gainprm[0]
  AFFINE = 1  # prm[0] + prm[1]*length + prm[2]*velocity
  MUSCLE = 2  # unsupported (gated at load time)


class TrnType(enum.IntEnum):
  JOINT = 0
  SITE = 1  # thrust-style transmission (e.g. quadrotor rotors)
  TENDON = 2


class EqType(enum.IntEnum):
  """Equality-constraint kinds (MuJoCo mjtEq values)."""
  CONNECT = 0  # 3-dof ball joint between bodies
  WELD = 1     # 6-dof pose lock between bodies
  JOINT = 2    # polynomial coupling of two scalar joints


class ObjType(enum.IntEnum):
  """Object kinds addressable by sensors / residual helpers."""
  BODY = 0
  XBODY = 1
  GEOM = 2
  SITE = 3
  JOINT = 4


class SensorType(enum.IntEnum):
  JOINTPOS = 0
  JOINTVEL = 1
  FRAMEPOS = 2
  FRAMEQUAT = 3
  FRAMEXAXIS = 4
  FRAMEYAXIS = 5
  FRAMEZAXIS = 6
  FRAMELINVEL = 7
  FRAMEANGVEL = 8
  SUBTREECOM = 9
  SUBTREELINVEL = 10
  ACTUATORFRC = 11
  TOUCH = 12
  ACCELEROMETER = 13
  GYRO = 14
  USER = 15  # cost-term placeholder; dims kept, values written by tasks
  SUBTREEANGMOM = 16


@struct.dataclass
class Option:
  """Simulation options (numeric → traced so they stay tunable under jit)."""
  timestep: jax.Array  # ()
  gravity: jax.Array  # (3,)
  # contact solver behavior (engine-wide defaults; per-geom solref overrides)
  impratio: jax.Array  # () ratio of friction-to-normal stiffness
  viscosity: jax.Array  # () fluid viscosity (inertia-box model)
  density: jax.Array  # () fluid density (quadratic drag)
  wind: jax.Array  # (3,)
  # static
  integrator: int = struct.field(pytree_node=False, default=0)  # 0=semi-impl
  has_fluid: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class Model:
  """Physics model pytree. One instance per MJCF file; shared by rollouts."""

  # ------- static structure (hashable metadata; specializes compilation) ----
  nq: int = struct.field(pytree_node=False)
  nv: int = struct.field(pytree_node=False)
  nu: int = struct.field(pytree_node=False)
  na: int = struct.field(pytree_node=False)
  nbody: int = struct.field(pytree_node=False)
  njnt: int = struct.field(pytree_node=False)
  ngeom: int = struct.field(pytree_node=False)
  nsite: int = struct.field(pytree_node=False)
  nmocap: int = struct.field(pytree_node=False)
  nuserdata: int = struct.field(pytree_node=False)
  nsensordata: int = struct.field(pytree_node=False)

  body_parentid: Tuple[int, ...] = struct.field(pytree_node=False)
  body_rootid: Tuple[int, ...] = struct.field(pytree_node=False)
  body_jntadr: Tuple[int, ...] = struct.field(pytree_node=False)
  body_jntnum: Tuple[int, ...] = struct.field(pytree_node=False)
  body_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
  body_dofnum: Tuple[int, ...] = struct.field(pytree_node=False)
  body_mocapid: Tuple[int, ...] = struct.field(pytree_node=False)
  body_names: Tuple[str, ...] = struct.field(pytree_node=False)

  jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_limited: Tuple[bool, ...] = struct.field(pytree_node=False)
  jnt_names: Tuple[str, ...] = struct.field(pytree_node=False)

  dof_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  dof_jntid: Tuple[int, ...] = struct.field(pytree_node=False)

  geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
  # contact dimensionality per geom (1/3/4/6); a pair's condim is the max
  # of its geoms'. Static: it decides the constraint-row layout (condim≥4
  # adds torsional, condim 6 rolling rows — physics/solver.py)
  geom_condim: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_names: Tuple[str, ...] = struct.field(pytree_node=False)
  # geom → asset id (hfield id for HFIELD geoms, -1 otherwise)
  geom_dataid: Tuple[int, ...] = struct.field(pytree_node=False)
  # heightfield asset grid resolution (hfield 0; (0, 0) when absent)
  hfield_nrow: int = struct.field(pytree_node=False)
  hfield_ncol: int = struct.field(pytree_node=False)
  # narrowphase candidate pairs: (geom1, geom2) with geom_type pair dispatch
  # decided at trace time. Precomputed on host (static broadphase).
  collision_pairs: Tuple[Tuple[int, int], ...] = struct.field(
      pytree_node=False)

  site_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  site_names: Tuple[str, ...] = struct.field(pytree_node=False)

  actuator_trntype: Tuple[int, ...] = struct.field(pytree_node=False)
  actuator_trnid: Tuple[int, ...] = struct.field(pytree_node=False)
  actuator_dyntype: Tuple[int, ...] = struct.field(pytree_node=False)
  actuator_gaintype: Tuple[int, ...] = struct.field(pytree_node=False)
  actuator_biastype: Tuple[int, ...] = struct.field(pytree_node=False)
  actuator_actadr: Tuple[int, ...] = struct.field(pytree_node=False)
  actuator_names: Tuple[str, ...] = struct.field(pytree_node=False)

  # sensors: (type, objtype, objid, adr, dim) per sensor, in address order
  sensor_spec: Tuple[Tuple[int, int, int, int, int], ...] = struct.field(
      pytree_node=False)
  sensor_names: Tuple[str, ...] = struct.field(pytree_node=False)

  # static fast-path flags (computed at load; changing the underlying
  # parameters at runtime requires reload)
  has_spring: bool = struct.field(pytree_node=False)
  has_frictionloss: bool = struct.field(pytree_node=False)

  # raw MJCF <custom><numeric> table for task/agent configuration
  # (reference: GetNumberOrDefault, mjpc/utilities.h:65)
  custom_numeric: Tuple[Tuple[str, Tuple[float, ...]], ...] = struct.field(
      pytree_node=False)
  # keyframes: name -> (qpos, qvel, ctrl) as float tuples
  keyframes: Tuple[Tuple[str, Any], ...] = struct.field(pytree_node=False)

  # ------- numeric parameters (traced arrays) -------------------------------
  opt: Option

  qpos0: jax.Array  # (nq,)
  qpos_spring: jax.Array  # (nq,)

  body_pos: jax.Array  # (nbody, 3)
  body_quat: jax.Array  # (nbody, 4)
  body_ipos: jax.Array  # (nbody, 3)
  body_iquat: jax.Array  # (nbody, 4)
  body_mass: jax.Array  # (nbody,)
  body_inertia: jax.Array  # (nbody, 3) principal inertia (inertial frame)
  body_subtreemass: jax.Array  # (nbody,)

  jnt_pos: jax.Array  # (njnt, 3)
  jnt_axis: jax.Array  # (njnt, 3)
  jnt_range: jax.Array  # (njnt, 2)
  jnt_stiffness: jax.Array  # (njnt,)
  jnt_solref: jax.Array  # (njnt, 2) limit solref
  jnt_margin: jax.Array  # (njnt,)

  dof_damping: jax.Array  # (nv,)
  dof_armature: jax.Array  # (nv,)
  dof_frictionloss: jax.Array  # (nv,)
  dof_ancestor_mask: jax.Array  # (nv, nv) bool: i is ancestor-or-self of j
  dof_body_mask: jax.Array  # (nv, nbody) bool: dof i is on path of body b
  body_ancestor_mask: jax.Array  # (nbody, nbody) bool: a ancestor-or-self of b
  # (nv, nv): which dof velocities enter the chain velocity that rotates
  # cdof[k] (cdof_dot[k] = v_k × cdof[k]); all-zero rows → cdof_dot[k] = 0
  cdofdot_vel_mask: jax.Array

  # heightfield elevation grid (nrow, ncol) scaled to meters, and size
  # (rx, ry, elevation_max, base_depth) — single-hfield support
  hfield_data: jax.Array
  hfield_size: jax.Array  # (4,)
  geom_pos: jax.Array  # (ngeom, 3)
  geom_quat: jax.Array  # (ngeom, 4)
  geom_size: jax.Array  # (ngeom, 3)
  geom_friction: jax.Array  # (ngeom, 3) slide/spin/roll (spin/roll unused)
  geom_solref: jax.Array  # (ngeom, 2) (timeconst, dampratio)
  geom_solimp: jax.Array  # (ngeom, 5)
  geom_margin: jax.Array  # (ngeom,)

  site_pos: jax.Array  # (nsite, 3)
  site_quat: jax.Array  # (nsite, 4)

  actuator_gear: jax.Array  # (nu, 6)
  actuator_ctrlrange: jax.Array  # (nu, 2)
  actuator_forcerange: jax.Array  # (nu, 2)
  actuator_ctrllimited: jax.Array  # (nu,) bool
  actuator_forcelimited: jax.Array  # (nu,) bool
  actuator_gainprm: jax.Array  # (nu, 3)
  actuator_biasprm: jax.Array  # (nu, 3)
  actuator_dynprm: jax.Array  # (nu, 3)
  actuator_actrange: jax.Array  # (nu, 2)

  # ------- fixed tendons (trailing, defaulted: absent on older models) ------
  # MuJoCo feature set the reference assumes (SURVEY §1 L0); fixed tendons
  # couple scalar joints with constant coefficients — the Jacobian is a
  # compile-time constant row. Spatial tendons are guarded in io.py.
  ntendon: int = struct.field(pytree_node=False, default=0)
  # per tendon: ((jntid, coef), ...)
  tendon_joints: Tuple[Tuple[Tuple[int, float], ...], ...] = struct.field(
      pytree_node=False, default=())
  tendon_limited: Tuple[bool, ...] = struct.field(pytree_node=False,
                                                  default=())
  tendon_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
  tendon_range: Optional[jax.Array] = None  # (ntendon, 2)
  tendon_stiffness: Optional[jax.Array] = None  # (ntendon,)
  tendon_damping: Optional[jax.Array] = None  # (ntendon,)
  tendon_lengthspring: Optional[jax.Array] = None  # (ntendon, 2)
  tendon_solref_lim: Optional[jax.Array] = None  # (ntendon, 2)
  tendon_solimp_lim: Optional[jax.Array] = None  # (ntendon, 5)
  tendon_margin: Optional[jax.Array] = None  # (ntendon,)

  # ------- convex mesh collision geometry -----------------------------------
  # Hull-vertex clouds + deduped face normals per mesh asset. Support
  # queries over a vertex cloud equal the convex-hull support exactly, so
  # the cloud IS the collision hull; large meshes are reduced at load to
  # their extreme vertices over a fixed direction set (bounded error).
  # Padding repeats the first vertex/normal (keeps max-reductions exact).
  nmesh: int = struct.field(pytree_node=False, default=0)
  mesh_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
  mesh_hullvert: Optional[jax.Array] = None  # (nmesh, VCAP, 3)
  mesh_facenorm: Optional[jax.Array] = None  # (nmesh, NCAP, 3)

  # ------- equality constraints: connect / weld / joint ---------------------
  neq: int = struct.field(pytree_node=False, default=0)
  eq_type: Tuple[int, ...] = struct.field(pytree_node=False, default=())
  eq_obj1id: Tuple[int, ...] = struct.field(pytree_node=False, default=())
  eq_obj2id: Tuple[int, ...] = struct.field(pytree_node=False, default=())
  eq_active0: Tuple[bool, ...] = struct.field(pytree_node=False, default=())
  eq_data: Optional[jax.Array] = None  # (neq, 11) MuJoCo layout
  eq_solref: Optional[jax.Array] = None  # (neq, 2)
  eq_solimp: Optional[jax.Array] = None  # (neq, 5)
  # per-equality-ROW regularizer scale in solver._equality_rows order:
  # MuJoCo's mj_diagApprox from compile-time invweight0, NOT the live
  # Delassus diagonal — the live A_rr vanishes when a row's Jacobian
  # degenerates (e.g. the in-plane connect row of a planar chain at rest),
  # which would zero the softness R=(1-d)/d·A_rr and let the dual blow up
  # (engine_core_constraint.c mj_diagApprox, mjEQ_* cases)
  eq_diagapprox: Tuple[float, ...] = struct.field(
      pytree_node=False, default=())

  # --------------------------- name lookups --------------------------------
  def _name_id(self, names: Tuple[str, ...], name: str, kind: str) -> int:
    try:
      return names.index(name)
    except ValueError:
      raise KeyError(f"no {kind} named {name!r}; have {names}") from None

  def body(self, name: str) -> int:
    return self._name_id(self.body_names, name, "body")

  def joint(self, name: str) -> int:
    return self._name_id(self.jnt_names, name, "joint")

  def geom(self, name: str) -> int:
    return self._name_id(self.geom_names, name, "geom")

  def site(self, name: str) -> int:
    return self._name_id(self.site_names, name, "site")

  def tendon(self, name: str) -> int:
    return self._name_id(self.tendon_names, name, "tendon")

  def sensor(self, name: str) -> int:
    return self._name_id(self.sensor_names, name, "sensor")

  def sensor_adr(self, name: str) -> Tuple[int, int]:
    """(address, dim) of a named sensor in sensordata."""
    i = self.sensor(name)
    spec = self.sensor_spec[i]
    return spec[3], spec[4]

  def custom(self, name: str, default=None):
    """MJCF <custom><numeric> lookup (reference GetNumberOrDefault)."""
    for key, vals in self.custom_numeric:
      if key == name:
        return vals[0] if len(vals) == 1 else vals
    return default

  def keyframe(self, name: str):
    for key, val in self.keyframes:
      if key == name:
        return val
    raise KeyError(f"no keyframe named {name!r}")


@struct.dataclass
class Contact:
  """Batch of contact points for the precomputed candidate pairs (npair,...).

  Inactive pairs have dist > 0 and produce zero force through the smooth
  force law, so the arrays are always dense/static-shaped.
  """
  dist: jax.Array  # (npair,) signed distance (negative = penetrating)
  pos: jax.Array  # (npair, 3) midpoint
  frame: jax.Array  # (npair, 3, 3) rows: normal, tangent1, tangent2
  friction: jax.Array  # (npair,) combined sliding friction
  torsion: jax.Array  # (npair,) combined torsional friction (condim ≥ 4)
  roll: jax.Array  # (npair,) combined rolling friction (condim 6)
  solref: jax.Array  # (npair, 2)
  solimp: jax.Array  # (npair, 5)
  geom1: jax.Array  # (npair,) int
  geom2: jax.Array  # (npair,) int
  force: jax.Array  # (npair, 3) solved contact force in contact frame


@struct.dataclass
class Data:
  """Per-step simulation state + derived quantities (all traced)."""
  # state
  time: jax.Array  # ()
  qpos: jax.Array  # (nq,)
  qvel: jax.Array  # (nv,)
  act: jax.Array  # (na,)
  ctrl: jax.Array  # (nu,)
  qfrc_applied: jax.Array  # (nv,)
  xfrc_applied: jax.Array  # (nbody, 6) [torque; force] world, at body CoM
  mocap_pos: jax.Array  # (nmocap, 3)
  mocap_quat: jax.Array  # (nmocap, 4)
  userdata: jax.Array  # (nuserdata,)

  # kinematics
  xpos: jax.Array  # (nbody, 3)
  xquat: jax.Array  # (nbody, 4)
  xmat: jax.Array  # (nbody, 3, 3)
  xipos: jax.Array  # (nbody, 3) body CoM in world
  ximat: jax.Array  # (nbody, 3, 3) inertial frame in world
  xanchor: jax.Array  # (njnt, 3)
  xaxis: jax.Array  # (njnt, 3)
  geom_xpos: jax.Array  # (ngeom, 3)
  geom_xmat: jax.Array  # (ngeom, 3, 3)
  site_xpos: jax.Array  # (nsite, 3)
  site_xmat: jax.Array  # (nsite, 3, 3)
  subtree_com: jax.Array  # (nbody, 3)

  # velocities / dynamics
  cdof: jax.Array  # (nv, 6)
  cvel: jax.Array  # (nbody, 6)
  qM: jax.Array  # (nv, nv) dense joint-space inertia
  qLD: jax.Array  # (nv, nv) Cholesky factor of qM (+ armature)
  qfrc_bias: jax.Array  # (nv,)
  qfrc_passive: jax.Array  # (nv,)
  qfrc_actuator: jax.Array  # (nv,)
  qfrc_constraint: jax.Array  # (nv,) contacts + joint limits
  actuator_force: jax.Array  # (nu,)
  act_dot: jax.Array  # (na,)
  qacc: jax.Array  # (nv,)

  contact: Contact
  sensordata: jax.Array  # (nsensordata,)

  # warm-start state for the APGD constraint solve (solver.py): converged
  # dual forces carried across steps — temporal coherence roughly halves
  # the iterations needed at equal accuracy (the analog of MuJoCo's
  # qacc_warmstart). Zeros = cold start (make_data); row layout =
  # [3·ncon contact rows, limit rows, equality rows].
  efc_lambda: Optional[jax.Array] = None  # (nrow,)
