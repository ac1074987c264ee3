"""Sensor evaluation (position/velocity stage).

Mirrors the reference's reliance on MuJoCo sensors for residuals and
estimator measurements (SURVEY §2.4: cost terms are `<user>` sensors; EKF/UKF
consume sensordata). USER sensors are placeholders whose slots are written by
task residual functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math
from mujoco_mpc_tpu.physics.types import Data, Model, ObjType, SensorType


def _frame(m: Model, d: Data, objtype: int, objid: int):
  """(pos, rot, bodyid) of a sensor attachment object."""
  if objtype == ObjType.SITE:
    return d.site_xpos[objid], d.site_xmat[objid], m.site_bodyid[objid]
  if objtype == ObjType.GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid], m.geom_bodyid[objid]
  if objtype == ObjType.XBODY:
    return d.xpos[objid], d.xmat[objid], objid
  return d.xpos[objid], d.xmat[objid], objid  # BODY


def _point_vel(d: Data, body: int, point: jax.Array) -> jax.Array:
  """World linear velocity of a body-fixed point (world-origin cvel).

  Batch-trailing polymorphic: accepts (6,) cvel rows or (6, *b) tiles
  (megakernel residuals run this on the tilestep view)."""
  v = d.cvel[body]
  return v[3:] + cross0(v[:3], point)


def cross0(a, b):
  """Cross product over leading axis 0 — polymorphic for (3,) vectors and
  (3, *b) tile stacks, with no transpose (Mosaic-friendly)."""
  return jnp.stack([a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0]])


def dot0(a, b):
  """Dot product over leading axis 0 (layout-polymorphic, see cross0)."""
  return sum(a[i] * b[i] for i in range(a.shape[0]))


def norm0(a, eps=1e-24):
  """Euclidean norm over leading axis 0 (layout-polymorphic)."""
  return jnp.sqrt(jnp.maximum(dot0(a, a), eps))


def mat_tvec0(mat, v):
  """Mᵀ·v with matrix axes leading: mat (3, 3, ...), v (3, ...)."""
  return jnp.stack([sum(mat[k, i] * v[k] for k in range(3))
                    for i in range(3)])


def sub_const0(x, c):
  """x − c over leading axis 0, where c is either a numpy model constant
  (folded per element — Pallas rejects captured array constants) or a
  traced model leaf (general jit path)."""
  import numpy as np
  if isinstance(c, (np.ndarray, tuple, list)):
    c = np.asarray(c)
    return jnp.stack([x[i] - float(c[i]) for i in range(x.shape[0])])
  return x - c.reshape(c.shape + (1,) * (x.ndim - 1))


def quat_mul0(u, v):
  """Quaternion product over leading axis 0 (layout-polymorphic —
  residuals must use these, not physics.math's trailing-axis ops, to run
  inside the tile megakernel; cf tasks/quadruped.py)."""
  w1, x1, y1, z1 = u[0], u[1], u[2], u[3]
  w2, x2, y2, z2 = v[0], v[1], v[2], v[3]
  return jnp.stack([
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
  ])


def quat_sub0(qa, qb):
  """Tangent-space orientation error of qa relative to qb, (3, ...).

  Sin-weighted surrogate 2·sign(w)·vec(qb⁻¹⊗qa) = axis·2·sin(θ/2): the
  exact log map (math.quat_sub) needs atan2, which has no Mosaic TPU
  lowering. Equal to the rotation vector to O(θ³), monotone in θ on
  [0, π] — a cost-shaping equivalent for tracking residuals."""
  qbc = jnp.stack([qb[0], -qb[1], -qb[2], -qb[3]])
  dq = quat_mul0(qbc, qa)
  s = jnp.where(dq[0] < 0, -2.0, 2.0)  # shortest path
  return jnp.stack([dq[1] * s, dq[2] * s, dq[3] * s])


def _pyscalar(x):
  """Python float for concrete values, tracer passthrough.

  Megakernel residuals trace with a CONCRETE model: converting model
  scalars to python floats keeps them inline literals instead of staged
  gathers that Pallas would reject as captured array constants. On the
  general path the model may be traced (system ID) — pass through."""
  return x if isinstance(x, jax.core.Tracer) else float(x)


def subtree_linvel(m: Model, d: Data, body: int) -> jax.Array:
  """Subtree CoM linear velocity = momentum / subtree mass (mjSENS_
  SUBTREELINVEL); static descendant set, unrolled at trace time."""
  mom = None
  for b in _descendants(m, body):
    term = _pyscalar(m.body_mass[b]) * _point_vel(d, b, d.xipos[b])
    mom = term if mom is None else mom + term
  return mom / jnp.maximum(_pyscalar(m.body_subtreemass[body]), 1e-12)


def subtree_angmom(m: Model, d: Data, body: int) -> jax.Array:
  """Angular momentum about the subtree CoM (mjSENS_SUBTREEANGMOM):
  h = Σ_b R_b diag(I_b) R_bᵀ ω_b + m_b (x_b − com) × v_b.

  Batch-trailing polymorphic (explicit component sums, no matmul/.T)."""
  com = d.subtree_com[body]
  val = None
  for b in _descendants(m, body):
    omega = d.cvel[b][:3]
    vcom = _point_vel(d, b, d.xipos[b])
    rot = d.ximat[b]  # (3, 3, *b)
    loc = [sum(rot[k, i] * omega[k] for k in range(3)) for i in range(3)]
    iloc = [_pyscalar(m.body_inertia[b][i]) * loc[i] for i in range(3)]
    spin = jnp.stack([sum(rot[i, j] * iloc[j] for j in range(3))
                      for i in range(3)])
    orbit = _pyscalar(m.body_mass[b]) * cross0(d.xipos[b] - com, vcom)
    term = spin + orbit
    val = term if val is None else val + term
  return val


def sensors(m: Model, d: Data) -> Data:
  """Fill d.sensordata for all supported sensor types."""
  if m.nsensordata == 0:
    return d
  out = d.sensordata
  for i, (stype, objtype, objid, adr, dim) in enumerate(m.sensor_spec):
    st = SensorType(stype)
    if st == SensorType.USER:
      continue  # written by task residuals
    if st == SensorType.JOINTPOS:
      val = d.qpos[m.jnt_qposadr[objid]][None]
    elif st == SensorType.JOINTVEL:
      val = d.qvel[m.jnt_dofadr[objid]][None]
    elif st == SensorType.FRAMEPOS:
      pos, _, _ = _frame(m, d, objtype, objid)
      val = pos
    elif st == SensorType.FRAMEQUAT:
      _, rot, _ = _frame(m, d, objtype, objid)
      val = math.mat_to_quat(rot)
    elif st in (SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS,
                SensorType.FRAMEZAXIS):
      _, rot, _ = _frame(m, d, objtype, objid)
      val = rot[:, int(st) - int(SensorType.FRAMEXAXIS)]
    elif st == SensorType.FRAMELINVEL:
      pos, _, body = _frame(m, d, objtype, objid)
      val = _point_vel(d, body, pos)
    elif st == SensorType.FRAMEANGVEL:
      _, _, body = _frame(m, d, objtype, objid)
      val = d.cvel[body][:3]
    elif st == SensorType.SUBTREECOM:
      val = d.subtree_com[objid]
    elif st == SensorType.SUBTREELINVEL:
      val = subtree_linvel(m, d, objid)
    elif st == SensorType.SUBTREEANGMOM:
      val = subtree_angmom(m, d, objid)
    elif st == SensorType.ACTUATORFRC:
      val = d.actuator_force[objid][None]
    elif st == SensorType.GYRO:
      _, rot, body = _frame(m, d, objtype, objid)
      val = rot.T @ d.cvel[body][:3]
    elif st == SensorType.TOUCH:
      # sum of normal contact force magnitude on geoms of the site's body
      body = m.site_bodyid[objid]
      gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
      on_body = jnp.logical_or(gb[d.contact.geom1] == body,
                               gb[d.contact.geom2] == body)
      val = jnp.sum(jnp.where(on_body, d.contact.force[:, 0], 0.0))[None]
    elif st == SensorType.ACCELEROMETER:
      # requires qacc (filled post-dynamics); approximate with gravity-only
      # when called at position stage. Proper support: later round.
      _, rot, body = _frame(m, d, objtype, objid)
      val = -(rot.T @ m.opt.gravity)
    else:
      continue
    out = jax.lax.dynamic_update_slice(out, val.astype(out.dtype), (adr,))
  return d.replace(sensordata=out)


def _descendants(m: Model, root: int):
  out = []
  for b in range(root, m.nbody):
    p = b
    while p > root:
      p = m.body_parentid[p]
    if p == root:
      out.append(b)
  return out
