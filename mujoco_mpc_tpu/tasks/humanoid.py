"""Humanoid stand and walk (reference: mjpc/tasks/humanoid/{stand,walk})."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  height_goal, speed_goal = params[0], params[1]
  torso = model.body("torso")
  head = model.site("head_site")

  height = data.site_xpos[head, 2] - height_goal
  # balance: whole-robot CoM over the feet midpoint
  com = data.subtree_com[torso]
  feet = 0.5 * (data.xpos[model.body("right_foot")] +
                data.xpos[model.body("left_foot")])
  balance = com[:2] - feet[:2]
  upright = data.xmat[torso, 2, 2] - 1.0
  comvel = data.cvel[torso][3:] + jnp.cross(data.cvel[torso][:3],
                                            data.xipos[torso])
  speed = comvel[0] - speed_goal
  home_ctrl = jnp.zeros_like(data.ctrl)
  return jnp.concatenate([
      height[None], balance, upright[None], speed[None],
      data.ctrl - home_ctrl,
  ])


def _make(name, speed, dtype):
  model, spec, params, pnames = registry.load_task_model(
      "humanoid.xml", dtype)
  task = base.Task(name=name, model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
  return task.set_parameter("Speed", speed)


@registry.register("Humanoid Stand")
def make_stand(dtype=jnp.float32) -> base.Task:
  return _make("Humanoid Stand", 0.0, dtype)


@registry.register("Humanoid Walk")
def make_walk(dtype=jnp.float32) -> base.Task:
  return _make("Humanoid Walk", 1.0, dtype)
