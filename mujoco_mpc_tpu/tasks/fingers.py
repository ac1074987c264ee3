"""Fingers: two planar fingers spin a free paddle to a target rate
(reference: mjpc/tasks/fingers)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  spin_goal = params[0]
  spin = data.qvel[model.jnt_dofadr[model.joint("spin")]]
  # fingertips should stay near the paddle axis to keep contact available
  paddle = data.xpos[model.body("spinner")]
  t1 = data.xpos[model.body("f1_tip")]
  t2 = data.xpos[model.body("f2_tip")]
  prox = jnp.stack([jnp.linalg.norm(t1[:2] - paddle[:2]) - 0.12,
                    jnp.linalg.norm(t2[:2] - paddle[:2]) - 0.12])
  return jnp.concatenate([
      (spin - spin_goal)[None],
      prox,
      data.ctrl,
  ])


@registry.register("Fingers")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model("fingers.xml", dtype)
  return base.Task(name="Fingers", model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
