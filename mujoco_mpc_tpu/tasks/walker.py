"""Planar walker: walk forward at target speed staying tall and upright
(reference: mjpc/tasks/walker)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  speed_goal = params[0]
  height_goal = params[1]
  torso = model.body("torso")
  height = data.xpos[torso, 2]
  # torso z-axis in world: upright when pointing up
  upright = data.xmat[torso, 2, 2]
  # forward (x) root velocity by joint name: dm_control's walker orders the
  # root joints rootz/rootx/rooty
  vx = data.qvel[model.jnt_dofadr[model.joint("rootx")]]
  return jnp.concatenate([
      (height - height_goal)[None],
      (upright - 1.0)[None],
      (vx - speed_goal)[None],
      data.ctrl[:6],
  ])


@registry.register("Walker")
def make(dtype=jnp.float32) -> base.Task:
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_walker, dtype)
  return base.Task(name="Walker", model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
