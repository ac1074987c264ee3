"""Cartpole swing-up (reference: mjpc/tasks/cartpole/cartpole.cc:36-50)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  """[cos(pole)−1, cart−goal, pole velocity, control]."""
  goal = params[0] if params.shape[0] else 0.0
  return jnp.stack([
      jnp.cos(data.qpos[1]) - 1.0,
      data.qpos[0] - goal,
      data.qvel[1],
      data.ctrl[0],
  ])


@registry.register("Cartpole")
def make(dtype=jnp.float32) -> base.Task:
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_cartpole, dtype)
  return base.Task(name="Cartpole", model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
