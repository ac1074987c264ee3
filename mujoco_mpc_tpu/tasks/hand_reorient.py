"""Shadow-hand in-hand cube reorientation (reference:
mjpc/tasks/shadow_reorient/hand.cc) at the REAL hand's counts: 24 hand
joints (2 wrist + FF/MF/RF 4 + LF 5 + TH 5), 20 actuators with the four
fingers' distal J1+J2 pairs tendon-coupled (menagerie right_hand.xml).
The planner reorients the cube to a goal quaternion that advances through
a deterministic sequence as goals are reached; a dropped cube is reset
into the hand (hand.cc:90-121, TransitionLocked).

Residual layout mirrors hand.cc:36-85:
  (0) cube_position − palm_position        (3)
  (1) goal_orientation ⊖ cube_orientation  (3)
  (2) cube linear velocity                 (3)
  (3) actuator force                       (nu = 20)
  (4) hand configuration − home grasp      (24)
  (5) hand joint velocity                  (24)
(The reference's task.xml declares dims 26 for terms 4-5 because its
`qpos + 7` offset lands on the cube quaternion in its include order —
hand.cc:75-80; here the dims are the hand's actual 24 joints.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math as pmath
from mujoco_mpc_tpu.physics import sensors as psens
from mujoco_mpc_tpu.tasks import base, registry

_NHAND = 24
_GOLDEN = 2.39996322972865332  # radians


def _cube_adr(model):
  j = model.body_jntadr[model.body("cube")]
  return model.jnt_qposadr[j], model.jnt_dofadr[j]


def _home_hand(model):
  qpos, _, _ = model.keyframe("home")
  return qpos[:_NHAND]  # numpy (tile path) or traced leaf (general)


def residual(model, data, params):
  qadr, vadr = _cube_adr(model)
  cube_pos = data.qpos[qadr:qadr + 3]
  cube_quat = data.qpos[qadr + 3:qadr + 7]
  palm = data.site_xpos[model.site("grasp_site")]
  goal_quat = data.mocap_quat[0]
  goal_quat = goal_quat / psens.norm0(goal_quat)
  # leading-axis quat ops: this residual runs inside the tile megakernel
  ori_err = psens.quat_sub0(goal_quat, cube_quat)
  cube_vel = data.qvel[vadr:vadr + 3]
  home = _home_hand(model)
  return jnp.concatenate([
      cube_pos - palm,
      ori_err,
      cube_vel,
      data.actuator_force,  # hand.cc:73 uses actuator_force, not ctrl
      psens.sub_const0(data.qpos[:_NHAND], home),
      data.qvel[:_NHAND],
  ])


def transition(model, data, params):
  """Goal-advance + drop-reset FSM (jit-safe; counter in userdata[0])."""
  tol = params[0]
  qadr, vadr = _cube_adr(model)
  cube_pos = data.qpos[qadr:qadr + 3]
  cube_quat = data.qpos[qadr + 3:qadr + 7]
  goal_quat = data.mocap_quat[0]
  goal_quat = goal_quat / jnp.linalg.norm(goal_quat)

  reached = jnp.linalg.norm(
      pmath.quat_sub(goal_quat, cube_quat)) < tol
  idx = data.userdata[0] + jnp.where(reached, 1.0, 0.0)
  # deterministic goal sequence: golden-angle rotations about a wandering
  # axis (reference samples uniform random quats; a jit-safe determinstic
  # sequence covers SO(3) similarly well for MPC evaluation)
  ang = _GOLDEN * idx
  raw = jnp.stack([jnp.sin(1.7 * idx), jnp.cos(2.3 * idx),
                   jnp.sin(0.9 * idx + 1.0)])
  axis = raw / jnp.maximum(jnp.linalg.norm(raw), 1e-9)
  new_goal = jnp.concatenate([jnp.cos(ang / 2)[None],
                              jnp.sin(ang / 2) * axis])
  goal2 = jnp.where(reached, new_goal.astype(goal_quat.dtype), goal_quat)

  # drop reset: cube below the palm → back into the hand at rest
  dropped = cube_pos[2] < 0.15
  home = jnp.asarray([0.0, 0.0, 0.285, 1.0, 0.0, 0.0, 0.0],
                     dtype=data.qpos.dtype)
  qpos = data.qpos
  cube_q = jnp.where(dropped, home, qpos[qadr:qadr + 7])
  qpos = jax.lax.dynamic_update_slice(qpos, cube_q, (qadr,))
  qvel = data.qvel
  cube_v = jnp.where(dropped, jnp.zeros(6, dtype=qvel.dtype),
                     qvel[vadr:vadr + 6])
  qvel = jax.lax.dynamic_update_slice(qvel, cube_v, (vadr,))

  return data.replace(
      qpos=qpos, qvel=qvel,
      mocap_quat=data.mocap_quat.at[0].set(goal2),
      userdata=data.userdata.at[0].set(idx))



@registry.register("Shadow")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "hand_reorient.xml", dtype)
  return base.Task(name="Shadow", model=model, spec=spec, params=params,
                   residual=residual, transition=transition,
                   param_names=pnames)
