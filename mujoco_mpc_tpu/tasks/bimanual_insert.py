"""Bimanual ALOHA insert + reorient (reference:
mjpc/tasks/bimanual/insert/insert.cc:1-230, bimanual/reorient/).

Insert residual mirrors insert.cc:40-186:
  Reach L/R (each hand to its own connector), Grasp L/R (per-hand contact
  normal alignment — left always grasps the female connector, right the
  male, insert.cc:63-130), Lift M/F (connector to target height, x/y
  down-weighted ×0.1, insert.cc:132-147), Insert (18-dim cross-point pose
  match between the two connector sites, insert.cc:149-184).

Reorient reuses the handover rig: the single object must match the goal
mocap orientation (and stay at its position), reference bimanual/reorient.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math as pmath
from mujoco_mpc_tpu.physics import sensors as psens
from mujoco_mpc_tpu.tasks import base, bimanual, registry

_RADIUS = 0.05
_SOLVE_TIMEOUT = 60.0


def _cross_points(pos, mat, dtype):
  """6 points at ±kRadius along the frame axes (insert.cc:151-181)."""
  offs = jnp.concatenate([_RADIUS * jnp.eye(3, dtype=dtype),
                          -_RADIUS * jnp.eye(3, dtype=dtype)])
  return (pos[None] + offs @ mat.T).ravel()  # (18,)


def insert_residual(model, data, params):
  dtype = data.qpos.dtype
  female = data.xpos[model.body("female")]
  male = data.xpos[model.body("male")]
  reach_l = bimanual._gripper_frame_vec(model, data, "left/gripper", female)
  reach_r = bimanual._gripper_frame_vec(model, data, "right/gripper", male)

  one = jnp.asarray(1.0, dtype=dtype)
  nl1, hl1 = bimanual._finger_normal(model, data, "left/fingerL_geom",
                                     "female_geom")
  nl2, hl2 = bimanual._finger_normal(model, data, "left/fingerR_geom",
                                     "female_geom")
  grasp_l = jnp.where(hl1 & hl2, 0.5 * (psens.dot0(nl1, nl2) + 1.0), one)
  nr1, hr1 = bimanual._finger_normal(model, data, "right/fingerL_geom",
                                     "male_geom")
  nr2, hr2 = bimanual._finger_normal(model, data, "right/fingerR_geom",
                                     "male_geom")
  grasp_r = jnp.where(hr1 & hr2, 0.5 * (psens.dot0(nr1, nr2) + 1.0), one)

  target = data.mocap_pos[0]
  xy_scale = jnp.asarray([1.0, 0.1, 0.1], dtype=dtype)  # z matters most
  lift_m = (male - target)[jnp.asarray([2, 0, 1])] * xy_scale
  lift_f = (female - target)[jnp.asarray([2, 0, 1])] * xy_scale

  # cross-point pose match between the mating sites
  f_site = model.site("female_site")
  m_site = model.site("male_site")
  f_cross = _cross_points(data.site_xpos[f_site], data.site_xmat[f_site],
                          dtype)
  m_cross = _cross_points(data.site_xpos[m_site], data.site_xmat[m_site],
                          dtype)
  insert = m_cross - f_cross

  return jnp.concatenate([
      reach_l, reach_r, grasp_l[None], grasp_r[None], lift_m, lift_f,
      insert, data.qvel[:16],
  ])


def insert_transition(model, data, params):
  """Success → reset connectors to start; 60 s timeout → reset arms
  (insert.cc:189-229)."""
  dtype = data.qpos.dtype
  f_site = model.site("female_site")
  m_site = model.site("male_site")
  err = jnp.linalg.norm(data.site_xpos[m_site] - data.site_xpos[f_site])
  solved = (data.time > 0) & (err < 0.01)
  key_qpos = jnp.asarray(model.keyframe("home")[0], dtype=dtype)

  qpos, qvel = data.qpos, data.qvel
  conn_q = jnp.where(solved, key_qpos[16:30], qpos[16:30])
  qpos = qpos.at[12:26].set(conn_q)
  conn_v = jnp.where(solved, jnp.zeros(12, dtype=dtype), qvel[16:28])
  qvel = qvel.at[12:24].set(conn_v)
  solve_time = jnp.where(solved, data.time, data.userdata[1])

  stuck = data.time > solve_time + _SOLVE_TIMEOUT
  qpos = jnp.where(stuck, key_qpos, qpos)
  qvel = jnp.where(stuck, jnp.zeros_like(qvel), qvel)
  solve_time = jnp.where(stuck, data.time, solve_time)
  count = data.userdata[0] + jnp.where(solved, 1.0, 0.0)

  return data.replace(
      qpos=qpos, qvel=qvel,
      userdata=data.userdata.at[0].set(count).at[1].set(solve_time))


@registry.register("Bimanual Insert")
def make_insert(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "bimanual_insert.xml", dtype)
  return base.Task(name="Bimanual Insert", model=model, spec=spec,
                   params=params, residual=insert_residual,
                   transition=insert_transition, param_names=pnames)


# --------------------------------------------------------------- reorient
def reorient_residual(model, data, params):
  """Reorient the object in place to the goal mocap quaternion
  (reference bimanual/reorient): reach terms + orientation error +
  keep-position + velocities."""
  box_body = model.body("box")
  box = data.xpos[box_body]
  box_quat = data.xquat[box_body]
  goal_quat = data.mocap_quat[0]
  goal_quat = goal_quat / psens.norm0(goal_quat)
  reach_l = bimanual._gripper_frame_vec(model, data, "left/gripper", box)
  reach_r = bimanual._gripper_frame_vec(model, data, "right/gripper", box)
  ori = psens.quat_sub0(goal_quat, box_quat)  # tile-layout safe
  keep = box - data.mocap_pos[0]
  return jnp.concatenate([
      reach_l, reach_r, ori, keep, data.qvel[:16],
  ])


def reorient_transition(model, data, params):
  """Goal-advance FSM: new goal quat when reached (golden-angle sequence,
  like the dexterous reorient tasks)."""
  box_quat = data.xquat[model.body("box")]
  goal_quat = data.mocap_quat[0]
  goal_quat = goal_quat / jnp.linalg.norm(goal_quat)
  reached = jnp.linalg.norm(pmath.quat_sub(goal_quat, box_quat)) < 0.25
  idx = data.userdata[0] + jnp.where(reached, 1.0, 0.0)
  ang = 2.39996322972865332 * idx
  raw = jnp.stack([jnp.sin(1.7 * idx), jnp.cos(2.3 * idx),
                   jnp.sin(0.9 * idx + 1.0)])
  axis = raw / jnp.maximum(jnp.linalg.norm(raw), 1e-9)
  new_goal = jnp.concatenate([jnp.cos(ang / 2)[None],
                              jnp.sin(ang / 2) * axis])
  goal2 = jnp.where(reached, new_goal.astype(goal_quat.dtype), goal_quat)
  return data.replace(
      mocap_quat=data.mocap_quat.at[0].set(goal2),
      userdata=data.userdata.at[0].set(idx))


@registry.register("Bimanual Reorient")
def make_reorient(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "bimanual_reorient.xml", dtype)
  return base.Task(name="Bimanual Reorient", model=model, spec=spec,
                   params=params, residual=reorient_residual,
                   transition=reorient_transition, param_names=pnames)
