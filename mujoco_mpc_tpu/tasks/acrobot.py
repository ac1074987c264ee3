"""Acrobot swing-up (reference: mjpc/tasks/acrobot)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  tip = data.site_xpos[model.site("tip")]
  target = data.site_xpos[model.site("target")]
  dist = jnp.linalg.norm(tip - target)
  return jnp.concatenate([
      dist[None],
      data.qvel[:2],
      data.ctrl[:1],
  ])


@registry.register("Acrobot")
def make(dtype=jnp.float32) -> base.Task:
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_acrobot, dtype)
  return base.Task(name="Acrobot", model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
