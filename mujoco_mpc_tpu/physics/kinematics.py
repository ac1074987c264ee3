"""Forward kinematics: qpos → world frames for bodies/geoms/sites.

Semantics match MuJoCo's mj_kinematics (joint displacements are relative to
the reference configuration qpos0), validated against it in
tests/test_physics_oracle.py. The body loop is unrolled over the (static)
kinematic tree — tree sizes here are tens of bodies, and unrolling lets XLA
fuse the whole pass into a handful of kernels; the batch axis (candidate
rollouts) supplies the parallel width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math
from mujoco_mpc_tpu.physics.types import Data, JointType, Model


def kinematics(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  xpos = [jnp.zeros(3, dtype=dtype)]
  xquat = [jnp.asarray([1.0, 0, 0, 0], dtype=dtype)]
  xanchor = [None] * m.njnt
  xaxis = [None] * m.njnt

  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    quat = math.quat_mul(xquat[p], m.body_quat[b])
    pos = xpos[p] + math.quat_rot(xquat[p], m.body_pos[b])

    mid = m.body_mocapid[b]
    if mid >= 0:
      pos = d.mocap_pos[mid]
      quat = d.mocap_quat[mid]

    jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
    for j in range(jadr, jadr + jnum):
      qadr = m.jnt_qposadr[j]
      jtype = m.jnt_type[j]
      if jtype == JointType.FREE:
        pos = d.qpos[qadr:qadr + 3]
        quat = d.qpos[qadr + 3:qadr + 7]
        quat = quat / jnp.linalg.norm(quat)
        xanchor[j] = pos
        xaxis[j] = math.quat_rot(quat, m.jnt_axis[j])
        continue
      anchor = pos + math.quat_rot(quat, m.jnt_pos[j])
      if jtype == JointType.BALL:
        qloc = d.qpos[qadr:qadr + 4]
        qloc = qloc / jnp.linalg.norm(qloc)
        quat = math.quat_mul(quat, qloc)
        pos = anchor - math.quat_rot(quat, m.jnt_pos[j])
      elif jtype == JointType.SLIDE:
        pos = pos + math.quat_rot(quat, m.jnt_axis[j]) * (
            d.qpos[qadr] - m.qpos0[qadr])
      elif jtype == JointType.HINGE:
        angle = d.qpos[qadr] - m.qpos0[qadr]
        quat = math.quat_mul(quat, math.axis_angle_quat(m.jnt_axis[j], angle))
        pos = anchor - math.quat_rot(quat, m.jnt_pos[j])
      xanchor[j] = anchor
      xaxis[j] = math.quat_rot(quat, m.jnt_axis[j])

    xpos.append(pos)
    xquat.append(quat)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = math.quat_to_mat(xquat)

  xanchor = (jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3), dtype=dtype))
  xaxis = (jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3), dtype=dtype))

  # inertial frames
  xipos = xpos + jax.vmap(math.quat_rot)(xquat, m.body_ipos)
  ximat = math.quat_to_mat(jax.vmap(math.quat_mul)(xquat, m.body_iquat))

  # geoms / sites
  gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
  geom_xpos = xpos[gb] + jax.vmap(math.quat_rot)(xquat[gb], m.geom_pos)
  geom_xmat = math.quat_to_mat(jax.vmap(math.quat_mul)(xquat[gb], m.geom_quat))
  sb = jnp.asarray(m.site_bodyid, dtype=jnp.int32)
  site_xpos = xpos[sb] + jax.vmap(math.quat_rot)(xquat[sb], m.site_pos)
  site_xmat = math.quat_to_mat(jax.vmap(math.quat_mul)(xquat[sb], m.site_quat))

  # subtree center of mass: subtree sums are one ancestor-mask matmul
  anc = m.body_ancestor_mask.astype(dtype)  # (nbody, nbody) a anc-or-self b
  mass_moment = anc @ (m.body_mass[:, None] * xipos)  # (nbody, 3)
  mass_total = anc @ m.body_mass
  subtree_com = mass_moment / jnp.maximum(mass_total, 1e-12)[:, None]

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis, geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat, subtree_com=subtree_com)
