"""Push: arm pushes a free box to a target on the table.

Manipulation-family task (reference: mjpc/tasks/manipulation panda bring /
particle push objectives): cost couples the pusher-to-box distance with the
box-to-target distance, so the planner discovers contact-rich pushing.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  ee = data.site_xpos[model.site("ee")]
  box = data.xpos[model.body("box")]
  target = data.mocap_pos[0]
  box_to_target = box[:2] - target[:2]
  pusher_to_box = ee - box
  return jnp.concatenate([
      box_to_target,
      pusher_to_box,
      data.qvel[:4],
      data.ctrl - jnp.asarray(model.keyframe("home")[2],
                              dtype=data.ctrl.dtype),
  ])


@registry.register("Push")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model("push.xml", dtype)
  return base.Task(name="Push", model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
