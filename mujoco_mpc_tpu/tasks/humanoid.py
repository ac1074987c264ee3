"""Humanoid stand and walk (reference: mjpc/tasks/humanoid/{stand,walk}).

Runs on the full-DOF dm_control humanoid (nq=28, nv=27, nu=21, hamstring
tendons — the same model the reference builds from dm_control at compile
time; see tasks/dm_suite.py), not a reduced stand-in.

The walk residual mirrors walk.cc:44-160 term by term: torso height,
pelvis-feet alignment, capture-point balance projected onto the inter-foot
segment, upright (torso/pelvis/both feet), posture, walk-forward speed,
move-feet, and control — all gated by the smooth `standing` factor so the
cost degrades gracefully through falls. The reference reads these
quantities via framepos/framezaxis/subtree sensors; here they come straight
from Data kinematics (physics/sensors.py helpers for the subtree terms).
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import sensors as psensors
from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  """Batch-trailing polymorphic: `data` is either a Data (per-sample) or
  the tilestep view whose fields carry trailing candidate-batch dims, so
  the same residual runs on the general path and inside the megakernel.
  Reductions/crosses are axis-0 over the leading component axis."""
  dtype = data.qpos.dtype
  height_goal, speed_goal = params[0], params[1]
  balance_time = params[2]
  torso = model.body("torso")
  pelvis = model.body("pelvis")
  waist = model.body("lower_waist")
  rfoot = model.body("right_foot")
  lfoot = model.body("left_foot")

  def norm0(x):
    return jnp.sqrt(jnp.sum(x * x, axis=0))

  # ----- torso height (walk.cc:48-50) -----
  torso_h = data.xpos[torso, 2]
  height = torso_h - height_goal

  # ----- pelvis / feet (walk.cc:52-57): rectified — fires only when the
  # pelvis sinks toward the feet -----
  foot_r = data.xpos[rfoot]
  foot_l = data.xpos[lfoot]
  pelvis_feet = 0.5 * (foot_l[2] + foot_r[2]) - data.xpos[pelvis, 2] - 0.2

  # ----- standing gate (walk.cc:92-94) -----
  standing = torso_h / jnp.sqrt(torso_h * torso_h + 0.45 * 0.45) - 0.4

  # ----- balance: capture point onto inter-foot segment (walk.cc:59-100)
  subcom = data.subtree_com[torso]
  subcomvel = psensors.subtree_linvel(model, data, torso)
  capture = subcom[:2] + balance_time * subcomvel[:2]
  axis = (foot_r - foot_l)[:2]
  length = 0.5 * norm0(axis) - 0.05
  axis = axis / jnp.maximum(norm0(axis), 1e-9)
  center = 0.5 * (foot_r + foot_l)[:2]
  t = jnp.clip(jnp.sum((capture - center) * axis, axis=0), -length, length)
  pcp = center + t * axis
  balance = standing * (capture - pcp)

  # ----- upright (walk.cc:102-122) -----
  up_torso = data.xmat[torso, 2, 2] - 1.0
  up_pelvis = 0.3 * (data.xmat[pelvis, 2, 2] - 1.0)
  zr = data.xmat[rfoot, :, 2]
  zl = data.xmat[lfoot, :, 2]
  up_rfoot = 0.1 * standing * jnp.stack([zr[0], zr[1], zr[2] - 1.0])
  up_lfoot = 0.1 * standing * jnp.stack([zl[0], zl[1], zl[2] - 1.0])
  upright = jnp.concatenate([up_torso[None], up_pelvis[None],
                             up_rfoot, up_lfoot])

  # ----- posture (walk.cc:124-126) -----
  posture = data.qpos[7:]

  # ----- walk forward (walk.cc:128-151) -----
  fwd = (data.xmat[torso, :2, 0] + data.xmat[pelvis, :2, 0] +
         data.xmat[rfoot, :2, 0] + data.xmat[lfoot, :2, 0])
  fwd = fwd / jnp.maximum(norm0(fwd), 1e-9)
  waist_vel = psensors.subtree_linvel(model, data, waist)[:2]
  torso_vel = (data.cvel[torso][3:] +
               psensors.cross0(data.cvel[torso][:3],
                               data.xipos[torso]))[:2]
  com_vel = 0.5 * (waist_vel + torso_vel)
  walk = standing * (jnp.sum(com_vel * fwd, axis=0) - speed_goal)

  # ----- move feet (walk.cc:153-163) -----
  rfoot_vel = (data.cvel[rfoot][3:] +
               psensors.cross0(data.cvel[rfoot][:3],
                               data.xipos[rfoot]))[:2]
  lfoot_vel = (data.cvel[lfoot][3:] +
               psensors.cross0(data.cvel[lfoot][:3],
                               data.xipos[lfoot]))[:2]
  move_feet = standing * (com_vel - 0.5 * rfoot_vel - 0.5 * lfoot_vel)

  # ----- control (walk.cc:165-167): raw motor torque commands -----
  control = data.ctrl

  return jnp.concatenate([
      height[None], pelvis_feet[None], balance, upright, posture,
      walk[None], move_feet, control,
  ])


def _make(name, speed, dtype):
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_humanoid, dtype)
  task = base.Task(name=name, model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
  return task.set_parameter("Speed", speed)


@registry.register("Humanoid Stand")
def make_stand(dtype=jnp.float32) -> base.Task:
  return _make("Humanoid Stand", 0.0, dtype)


@registry.register("Humanoid Walk")
def make_walk(dtype=jnp.float32) -> base.Task:
  return _make("Humanoid Walk", 1.0, dtype)
