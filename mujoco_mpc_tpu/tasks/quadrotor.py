"""Quadrotor: fly to a goal point and hover (reference: mjpc/tasks/quadrotor).

Exercises site-transmission thrust actuation.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry

_HOVER_THRUST = 1.962  # total mass 0.8 kg · g / 4 rotors


def residual(model, data, params):
  core = model.body("core")
  goal = params[:3]
  pos = data.xpos[core] - goal
  upright = data.xmat[core, 2, 2] - 1.0
  linvel = data.cvel[core][3:] + jnp.cross(data.cvel[core][:3],
                                           data.xipos[core])
  angvel = data.cvel[core][:3]
  ctrl = data.ctrl - _HOVER_THRUST
  return jnp.concatenate([pos, upright[None], linvel, angvel, ctrl])


@registry.register("Quadrotor")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "quadrotor.xml", dtype)
  return base.Task(name="Quadrotor", model=model, spec=spec, params=params,
                   residual=residual, param_names=pnames)
