"""Quadruped flat-terrain locomotion (reference: mjpc/tasks/quadruped —
the reference's gait FSM / terrain modes are a later round; this is the
Flat walk objective)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  speed_goal, height_goal = params[0], params[1]
  trunk = model.body("trunk")
  height = data.xpos[trunk, 2] - height_goal
  upright = data.xmat[trunk, :2, 2]  # z-axis tilt components
  linvel = data.cvel[trunk][3:] + jnp.cross(data.cvel[trunk][:3],
                                            data.xipos[trunk])
  speed = linvel[0] - speed_goal
  lateral = linvel[1]
  # penalize deviation from the stance pose targets, not raw position ctrl
  home_ctrl = jnp.asarray(model.keyframe("home")[2], dtype=data.ctrl.dtype)
  return jnp.concatenate([
      height[None], upright, speed[None], lateral[None],
      data.ctrl - home_ctrl,
  ])


@registry.register("Quadruped Flat")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "quadruped.xml", dtype)
  return base.Task(name="Quadruped Flat", model=model, spec=spec,
                   params=params, residual=residual, param_names=pnames)
