"""Smooth multibody dynamics: motion subspaces, velocities, CRB inertia,
RNE bias forces, passive forces and actuation.

Replaces the reference's external MuJoCo calls (mj_step internals) with pure
JAX. Formulation: Featherstone spatial algebra with 6-vectors [angular;
linear] about the *fixed world origin* (MuJoCo uses moving subtree-CoM
frames; a fixed frame is simpler and identical in exact arithmetic — scene
scales here are ~1 m so conditioning is fine in f32, and oracle tests compare
against MuJoCo in f64).

Tree recursions are unrolled over the static topology; every statement is a
small vectorized op, so under vmap (candidate batch) XLA maps the batch onto
the VPU lanes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math
from mujoco_mpc_tpu.physics.types import (ActDyn, Data, GainBias, JointType,
                                          Model, TrnType)


def _cdof_selectors(m: Model):
  """Static per-dof gather indices/masks for the vectorized cdof build."""
  import numpy as np
  bid, jid, col, kind = [], [], [], []  # kind: 0 slide 1 hinge 2 ball-rot
  for j in range(m.njnt):               #       3 free-trans 4 free-rot
    b, jt = m.jnt_bodyid[j], m.jnt_type[j]
    if jt == JointType.FREE:
      for i in range(3):
        bid.append(b); jid.append(j); col.append(i); kind.append(3)
      for i in range(3):
        bid.append(b); jid.append(j); col.append(i); kind.append(4)
    elif jt == JointType.BALL:
      for i in range(3):
        bid.append(b); jid.append(j); col.append(i); kind.append(2)
    else:
      bid.append(b); jid.append(j); col.append(0)
      kind.append(0 if jt == JointType.SLIDE else 1)
  return (np.asarray(bid), np.asarray(jid), np.asarray(col),
          np.asarray(kind))


def com_pos(m: Model, d: Data) -> Data:
  """Motion subspace cdof (nv, 6) for every dof, world-origin frame.

  One vectorized gather/select pass over all dofs (the per-joint recursion
  is data-independent — only the gather pattern depends on the topology)."""
  dtype = d.qpos.dtype
  if m.nv == 0:
    return d.replace(cdof=jnp.zeros((0, 6), dtype=dtype))
  bid, jid, col, kind = _cdof_selectors(m)
  e_col = jax.nn.one_hot(col, 3, dtype=dtype)  # (nv, 3) world unit axes
  xaxis_d = d.xaxis[jid]  # (nv, 3)
  rot_axis = jnp.einsum("vij,vj->vi", d.xmat[bid], e_col)  # xmat column
  is_slide = jnp.asarray(kind == 0)[:, None]
  is_hinge = jnp.asarray(kind == 1)[:, None]
  is_trans = jnp.asarray(kind == 3)[:, None]
  is_rot = jnp.asarray((kind == 2) | (kind == 4))[:, None]
  anchor = jnp.where(jnp.asarray(kind == 4)[:, None],
                     d.xpos[bid], d.xanchor[jid])
  ang = jnp.where(is_hinge, xaxis_d, 0.0) + jnp.where(is_rot, rot_axis, 0.0)
  lin = (jnp.where(is_trans, e_col, 0.0) +
         jnp.where(is_slide, xaxis_d, 0.0) +
         jnp.where(is_hinge | is_rot, jnp.cross(anchor, ang), 0.0))
  return d.replace(cdof=jnp.concatenate([ang, lin], axis=-1))


def com_vel(m: Model, d: Data) -> Tuple[Data, jax.Array]:
  """Body spatial velocities cvel (nbody,6) and cdof_dot (nv,6).

  World-origin cdof are superposable, so the tree recursion collapses to
  mask matmuls (one (nbody,nv)@(nv,6) for cvel, one (nv,nv)@(nv,6) for the
  chain velocities that rotate each cdof) — O(1) kernels instead of
  O(nbody) unrolled ops, and the batch axis rides the MXU."""
  dtype = d.qpos.dtype
  if m.nv == 0:
    return d.replace(cvel=jnp.zeros((m.nbody, 6), dtype=dtype)), (
        jnp.zeros((0, 6), dtype=dtype))
  contrib = d.cdof * d.qvel[:, None]  # (nv, 6) per-dof velocity terms
  cvel = m.dof_body_mask.T.astype(dtype) @ contrib  # (nbody, 6)
  vk = m.cdofdot_vel_mask.astype(dtype) @ contrib  # (nv, 6) chain vel at k
  cdof_dot = math.motion_cross(vk, d.cdof)  # zero rows → zero (v×u with v=0)
  return d.replace(cvel=cvel), cdof_dot


def _body_inertias(m: Model, d: Data) -> jax.Array:
  """(nbody, 6, 6) world-origin spatial inertia per body."""
  imat = d.ximat  # inertial frame orientation
  inertia_world = jnp.einsum(
      "bij,bj,bkj->bik", imat, m.body_inertia, imat)
  return jax.vmap(math.spatial_inertia)(m.body_mass, inertia_world, d.xipos)


def crb(m: Model, d: Data, ibody=None) -> Data:
  """Composite-rigid-body joint-space inertia qM (dense) via ancestor mask."""
  if ibody is None:
    ibody = _body_inertias(m, d)
  if m.nv == 0:
    return d.replace(qM=jnp.zeros((0, 0), dtype=d.qpos.dtype))
  # composite inertia seen by dof j = Σ over the subtree of j's body —
  # exactly the bodies whose path contains dof j: one mask matmul
  dtype = d.qpos.dtype
  ic_dof = (m.dof_body_mask.astype(dtype) @
            ibody.reshape(m.nbody, 36)).reshape(m.nv, 6, 6)
  f = jnp.einsum("jab,jb->ja", ic_dof, d.cdof)  # (nv, 6)
  raw = d.cdof @ f.T  # (nv, nv): raw[i,j] = cdof_i · Ic_j cdof_j
  mask = m.dof_ancestor_mask  # i ancestor-or-self of j
  upper = jnp.where(mask, raw, 0.0)
  qm = upper + upper.T - jnp.diag(jnp.diag(upper))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(qM=qm)


def rne(m: Model, d: Data, cdof_dot: jax.Array, ibody=None) -> Data:
  """Bias force qfrc_bias = C(q,v)v + g via recursive Newton-Euler."""
  dtype = d.qpos.dtype
  if m.nv == 0:
    return d.replace(qfrc_bias=jnp.zeros((0,), dtype=dtype))
  if ibody is None:
    ibody = _body_inertias(m, d)
  grav = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])
  # forward sweep (bias accelerations, q̈ = 0, base accel = -g trick):
  # world-origin accelerations superpose → one mask matmul
  cacc = grav + m.dof_body_mask.T.astype(dtype) @ (
      cdof_dot * d.qvel[:, None])  # (nbody, 6)
  # body forces, batched
  fv = jnp.einsum("bij,bj->bi", ibody, d.cvel)
  cfrc = (jnp.einsum("bij,bj->bi", ibody, cacc) +
          math.force_cross(d.cvel, fv))  # (nbody, 6)
  # backward sweep: subtree force sums via the same mask, projected on cdof
  qfrc_bias = jnp.sum(
      d.cdof * (m.dof_body_mask.astype(dtype) @ cfrc), axis=-1)
  return d.replace(qfrc_bias=qfrc_bias)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Map per-body applied wrenches [torque; force]@CoM into qfrc (nv,)."""
  if m.nv == 0 or m.nbody <= 1:
    return jnp.zeros((m.nv,), dtype=d.qpos.dtype)
  torque = d.xfrc_applied[:, :3]
  force = d.xfrc_applied[:, 3:]
  # spatial force about world origin
  fs = jnp.concatenate([torque + jnp.cross(d.xipos, force), force], axis=-1)
  # qfrc_j = Σ_b [dof j on path of b] cdof_j · F_b
  proj = d.cdof @ fs.T  # (nv, nbody)
  return jnp.sum(jnp.where(m.dof_body_mask, proj, 0.0), axis=1)


def _fluid_forces(m: Model, d: Data) -> jax.Array:
  """Viscous + quadratic fluid drag per body (MuJoCo inertia-box model).

  Each body is modeled as its equivalent inertia box; viscosity gives
  Stokes-like linear drag on the equivalent sphere, density gives
  anisotropic quadratic drag against the box faces. This is the model the
  swimmer task's propulsion depends on (reference models set
  <option viscosity/density>).
  """
  dtype = d.qpos.dtype
  # equivalent box half-dims from principal inertia: a² = 3(Iy+Iz−Ix)/(2m)
  mass = jnp.maximum(m.body_mass, 1e-12)
  ix, iy, iz = (m.body_inertia[:, 0], m.body_inertia[:, 1],
                m.body_inertia[:, 2])
  box = jnp.sqrt(jnp.maximum(jnp.stack([
      1.5 * (iy + iz - ix), 1.5 * (iz + ix - iy), 1.5 * (ix + iy - iz),
  ], axis=-1), 1e-12) / mass[:, None])  # (nbody, 3) half-dims

  # body-local velocity at the CoM
  omega_w = d.cvel[:, :3]
  vlin_w = (d.cvel[:, 3:] + jnp.cross(omega_w, d.xipos) -
            m.opt.wind[None, :])
  rot = d.ximat  # columns: local axes in world
  omega = jnp.einsum("bij,bj->bi", rot.transpose(0, 2, 1), omega_w)
  vlin = jnp.einsum("bij,bj->bi", rot.transpose(0, 2, 1), vlin_w)

  # viscosity: equivalent-sphere Stokes drag
  diam = 2.0 * jnp.mean(box, axis=-1)
  f_visc = -3.0 * jnp.pi * m.opt.viscosity * diam[:, None] * vlin
  t_visc = -jnp.pi * (diam ** 3)[:, None] * m.opt.viscosity * omega

  # density: quadratic drag on projected faces; torque per axis
  area = 4.0 * jnp.stack([box[:, 1] * box[:, 2], box[:, 0] * box[:, 2],
                          box[:, 0] * box[:, 1]], axis=-1)
  f_dens = -0.5 * m.opt.density * area * jnp.abs(vlin) * vlin
  bj = jnp.stack([box[:, 1], box[:, 2], box[:, 0]], axis=-1)
  bk = jnp.stack([box[:, 2], box[:, 0], box[:, 1]], axis=-1)
  t_coef = bj * bk * (bj ** 4 + bk ** 4) / 64.0
  t_dens = -m.opt.density * t_coef * jnp.abs(omega) * omega

  force_w = jnp.einsum("bij,bj->bi", rot, f_visc + f_dens)
  torque_w = jnp.einsum("bij,bj->bi", rot, t_visc + t_dens)
  # spatial force about world origin; project onto dofs via the body mask
  fs = jnp.concatenate(
      [torque_w + jnp.cross(d.xipos, force_w), force_w], axis=-1)
  proj = d.cdof @ fs.T  # (nv, nbody)
  return jnp.sum(jnp.where(m.dof_body_mask, proj, 0.0), axis=1)


def tendon_jacobian_np(m: Model):
  """(ntendon, nv) constant moment rows of the fixed tendons (numpy).

  Fixed tendons couple scalar joints with constant coefficients, so
  length = J·qpos-like gather and the Jacobian is a compile-time constant
  (MuJoCo mj_tendon for mjWRAP_JOINT)."""
  import numpy as np
  jac = np.zeros((m.ntendon, m.nv), dtype=np.float32)
  for t, wraps in enumerate(m.tendon_joints):
    for jid, coef in wraps:
      jac[t, m.jnt_dofadr[jid]] += coef
  return jac


def tendon_lengths(m: Model, d: Data):
  """(length, velocity) of the fixed tendons, each (ntendon,)."""
  dtype = d.qpos.dtype
  lens, vels = [], []
  for wraps in m.tendon_joints:
    ln = jnp.zeros((), dtype=dtype)
    vl = jnp.zeros((), dtype=dtype)
    for jid, coef in wraps:
      ln = ln + coef * d.qpos[m.jnt_qposadr[jid]]
      vl = vl + coef * d.qvel[m.jnt_dofadr[jid]]
    lens.append(ln)
    vels.append(vl)
  return jnp.stack(lens), jnp.stack(vels)


def passive(m: Model, d: Data) -> Data:
  """Springs, dampers, fluid drag and smoothed joint friction loss."""
  dtype = d.qpos.dtype
  if m.nv == 0:
    return d.replace(qfrc_passive=jnp.zeros((0,), dtype=dtype))
  qfrc = -m.dof_damping * d.qvel
  if m.opt.has_fluid:
    qfrc = qfrc + _fluid_forces(m, d)
  if m.has_frictionloss:
    # smooth Coulomb-style friction loss (reference puts this in the
    # constraint solver; a tanh regularization keeps it smooth for autodiff)
    qfrc = qfrc - m.dof_frictionloss * jnp.tanh(d.qvel / 0.01)
  if m.ntendon:
    # tendon spring (deadband between lengthspring[0] and [1]) + damping
    # projected through the constant tendon Jacobian (mj_passive semantics)
    jten = jnp.asarray(tendon_jacobian_np(m), dtype=dtype)
    ln, vl = tendon_lengths(m, d)
    lo = m.tendon_lengthspring[:, 0]
    hi = m.tendon_lengthspring[:, 1]
    stretch = jnp.where(ln > hi, ln - hi, jnp.where(ln < lo, ln - lo, 0.0))
    f_ten = -m.tendon_stiffness * stretch - m.tendon_damping * vl
    qfrc = qfrc + jten.T @ f_ten
  if not m.has_spring:
    return d.replace(qfrc_passive=qfrc)
  # joint springs about qpos_spring
  spring = jnp.zeros(m.nv, dtype=dtype)
  for j in range(m.njnt):
    qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    jt = m.jnt_type[j]
    k = m.jnt_stiffness[j]
    if jt in (JointType.HINGE, JointType.SLIDE):
      spring = spring.at[vadr].add(
          -k * (d.qpos[qadr] - m.qpos_spring[qadr]))
    elif jt == JointType.BALL:
      dq = math.quat_sub(d.qpos[qadr:qadr + 4],
                         m.qpos_spring[qadr:qadr + 4])
      spring = spring.at[vadr:vadr + 3].add(-k * dq)
    elif jt == JointType.FREE:
      spring = spring.at[vadr:vadr + 3].add(
          -k * (d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]))
      dq = math.quat_sub(d.qpos[qadr + 3:qadr + 7],
                         m.qpos_spring[qadr + 3:qadr + 7])
      spring = spring.at[vadr + 3:vadr + 6].add(-k * dq)
  return d.replace(qfrc_passive=qfrc + spring)


def _site_moment(m: Model, d: Data, u: int) -> jax.Array:
  """(nv,) generalized moment for a site-transmission actuator (unit force).

  The 6-vector gear = [force(3); torque(3)] is expressed in the site frame
  (reference semantics: thrust-style actuation, e.g. quadrotor rotors).
  """
  sid = m.actuator_trnid[u]
  b = m.site_bodyid[sid]
  rot = d.site_xmat[sid]
  force = rot @ m.actuator_gear[u, :3]
  torque = rot @ m.actuator_gear[u, 3:]
  fs = jnp.concatenate(
      [torque + jnp.cross(d.site_xpos[sid], force), force])
  proj = d.cdof @ fs  # (nv,)
  return jnp.where(m.dof_body_mask[:, b], proj, 0.0)


def actuation(m: Model, d: Data) -> Data:
  """Actuator forces → qfrc_actuator; activation derivative act_dot."""
  dtype = d.qpos.dtype
  if m.nu == 0:
    return d.replace(
        qfrc_actuator=jnp.zeros_like(d.qvel),
        actuator_force=jnp.zeros((0,), dtype=dtype),
        act_dot=jnp.zeros_like(d.act))

  ctrl = jnp.where(
      m.actuator_ctrllimited,
      jnp.clip(d.ctrl, m.actuator_ctrlrange[:, 0],
               m.actuator_ctrlrange[:, 1]), d.ctrl)

  # static partition: scalar-joint transmissions take a fully vectorized
  # gather/scatter path (one op each); site / ball transmissions loop.
  scalar_u, other_u = [], []
  for u in range(m.nu):
    j = m.actuator_trnid[u]
    if (m.actuator_trntype[u] == TrnType.JOINT and
        m.jnt_type[j] in (JointType.HINGE, JointType.SLIDE)):
      scalar_u.append(u)
    else:
      other_u.append(u)

  length = jnp.zeros((m.nu,), dtype=dtype)
  velocity = jnp.zeros((m.nu,), dtype=dtype)
  if scalar_u:
    uidx = jnp.asarray(scalar_u, dtype=jnp.int32)
    qadr = jnp.asarray(
        [m.jnt_qposadr[m.actuator_trnid[u]] for u in scalar_u], jnp.int32)
    vadr = jnp.asarray(
        [m.jnt_dofadr[m.actuator_trnid[u]] for u in scalar_u], jnp.int32)
    gear = m.actuator_gear[uidx, 0]
    length = length.at[uidx].set(gear * d.qpos[qadr])
    velocity = velocity.at[uidx].set(gear * d.qvel[vadr])

  # moments for non-scalar transmissions
  other_moments = {}
  ten_len = ten_vel = None
  for u in other_u:
    if m.actuator_trntype[u] == TrnType.TENDON:
      # tendon transmission (mj_transmission mjTRN_TENDON): moment =
      # gear[0] · tendon Jacobian; length/velocity feed position servos
      if ten_len is None:
        ten_len, ten_vel = tendon_lengths(m, d)
        jten_np = tendon_jacobian_np(m)
      tid = m.actuator_trnid[u]
      g0 = m.actuator_gear[u, 0]
      other_moments[u] = g0 * jnp.asarray(jten_np[tid], dtype=dtype)
      length = length.at[u].set(g0 * ten_len[tid])
      velocity = velocity.at[u].set(g0 * ten_vel[tid])
    elif m.actuator_trntype[u] == TrnType.JOINT:  # ball/free rotary gear
      j = m.actuator_trnid[u]
      jvadr = m.jnt_dofadr[j]
      nrot = 3
      radr = jvadr + 3 if m.jnt_type[j] == JointType.FREE else jvadr
      gvec = m.actuator_gear[u, :3]
      mom = jnp.zeros(m.nv, dtype=dtype)
      mom = jax.lax.dynamic_update_slice(mom, gvec, (radr,))
      other_moments[u] = mom
      velocity = velocity.at[u].set(
          jnp.dot(gvec, d.qvel[radr:radr + nrot]))
    else:  # SITE transmission
      other_moments[u] = _site_moment(m, d, u)

  # activation dynamics (fully vectorized when no stateful actuators)
  act_dot = jnp.zeros_like(d.act)
  if all(t == ActDyn.NONE for t in m.actuator_dyntype):
    inp = ctrl
  else:
    inputs = []
    for u in range(m.nu):
      dyn = m.actuator_dyntype[u]
      if dyn == ActDyn.NONE:
        inputs.append(ctrl[u])
      else:
        aadr = m.actuator_actadr[u]
        inputs.append(d.act[aadr])
        if dyn == ActDyn.INTEGRATOR:
          act_dot = act_dot.at[aadr].set(ctrl[u])
        else:  # FILTER / FILTEREXACT
          tau = jnp.maximum(m.actuator_dynprm[u, 0], 1e-8)
          act_dot = act_dot.at[aadr].set((ctrl[u] - d.act[aadr]) / tau)
    inp = jnp.stack(inputs)

  gain = jnp.where(
      jnp.asarray([t == GainBias.FIXED for t in m.actuator_gaintype]),
      m.actuator_gainprm[:, 0],
      m.actuator_gainprm[:, 0] + m.actuator_gainprm[:, 1] * length +
      m.actuator_gainprm[:, 2] * velocity)
  bias = jnp.where(
      jnp.asarray([t == GainBias.FIXED for t in m.actuator_biastype]),
      jnp.zeros((m.nu,), dtype=dtype),
      m.actuator_biasprm[:, 0] + m.actuator_biasprm[:, 1] * length +
      m.actuator_biasprm[:, 2] * velocity)
  force = gain * inp + bias
  force = jnp.where(
      m.actuator_forcelimited,
      jnp.clip(force, m.actuator_forcerange[:, 0],
               m.actuator_forcerange[:, 1]), force)

  qfrc = jnp.zeros((m.nv,), dtype=dtype)
  if scalar_u:
    qfrc = qfrc.at[vadr].add(gear * force[uidx])
  for u in other_u:
    qfrc = qfrc + other_moments[u] * force[u]
  return d.replace(
      qfrc_actuator=qfrc, actuator_force=force, act_dot=act_dot)
