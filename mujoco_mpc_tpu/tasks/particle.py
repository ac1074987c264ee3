"""Planar point-mass reaching a moving goal (reference: mjpc/tasks/particle).

The goal is a mocap body; Transition moves it along a lissajous path as a
pure function of time (the reference mutates mocap on the physics thread —
here it is jit-safe and runs inside rollouts)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry


def residual(model, data, params):
  pos = data.site_xpos[model.site("tip")][:2]
  goal = data.mocap_pos[0][:2]
  return jnp.concatenate([
      pos - goal,
      data.qvel[:2],
      data.ctrl[:2],
  ])


def transition(model, data, params):
  t = data.time
  goal = 0.25 * jnp.stack([jnp.sin(0.4 * t), jnp.cos(0.8 * t)])
  mocap = data.mocap_pos.at[0, :2].set(goal.astype(data.mocap_pos.dtype))
  return data.replace(mocap_pos=mocap)


@registry.register("Particle")
def make(dtype=jnp.float32) -> base.Task:
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_particle, dtype)
  return base.Task(name="Particle", model=model, spec=spec, params=params,
                   residual=residual, transition=transition,
                   param_names=pnames)


@registry.register("ParticleFixed")
def make_fixed(dtype=jnp.float32) -> base.Task:
  """Fixed-goal variant (reference ParticleFixed): no transition FSM."""
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_particle, dtype)
  return base.Task(name="ParticleFixed", model=model, spec=spec,
                   params=params, residual=residual, param_names=pnames)
