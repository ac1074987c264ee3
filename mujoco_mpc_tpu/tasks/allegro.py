"""Allegro in-hand cube reorientation (reference:
mjpc/tasks/allegro/allegro.cc:28-76).

Residual mirrors allegro.cc:38-73: cube position vs a fixed hold point
over the palm, cube orientation vs the goal quaternion, cube linear
velocity, actuation, nominal hand pose, joint velocity. The goal-advance /
drop-reset FSM is shared with the Shadow task (hand_reorient.transition) —
the reference's Allegro task uses the same goal machinery with its own
hand model.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math as pmath  # noqa: F401 (transition)
from mujoco_mpc_tpu.physics import sensors as psens
from mujoco_mpc_tpu.tasks import base, registry
from mujoco_mpc_tpu.tasks import hand_reorient

_NHAND = 12


def _cube_adr(model):
  j = model.body_jntadr[model.body("cube")]
  return model.jnt_qposadr[j], model.jnt_dofadr[j]


def residual(model, data, params):
  qadr, vadr = _cube_adr(model)
  cube_pos = data.qpos[qadr:qadr + 3]
  cube_quat = data.qpos[qadr + 3:qadr + 7]
  palm = data.site_xpos[model.site("palm_site")]
  goal_quat = data.mocap_quat[0]
  goal_quat = goal_quat / psens.norm0(goal_quat)
  ori_err = psens.quat_sub0(goal_quat, cube_quat)  # tile-layout safe
  cube_vel = data.qvel[vadr:vadr + 3]
  home = model.keyframe("home")[0][:_NHAND]
  hold = cube_pos - palm
  hold = jnp.stack([hold[0], hold[1], hold[2] - 0.04])
  return jnp.concatenate([
      hold,
      ori_err,
      cube_vel,
      data.actuator_force,
      psens.sub_const0(data.qpos[:_NHAND], home),
      data.qvel[:_NHAND],
  ])


@registry.register("Allegro")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model("allegro.xml",
                                                         dtype)
  return base.Task(name="Allegro", model=model, spec=spec, params=params,
                   residual=residual,
                   transition=hand_reorient.transition,
                   param_names=pnames)
