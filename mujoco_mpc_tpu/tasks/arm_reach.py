"""7-dof arm end-effector reach (manipulation family seed; reference:
mjpc/tasks/panda)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  ee = data.site_xpos[model.site("ee")]
  goal = data.mocap_pos[0]
  return jnp.concatenate([
      ee - goal,
      data.qvel,
      data.ctrl - jnp.asarray(model.keyframe("home")[2],
                              dtype=data.ctrl.dtype),
  ])


@registry.register("Arm Reach")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "arm_reach.xml", dtype)
  return base.Task(name="Arm Reach", model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
