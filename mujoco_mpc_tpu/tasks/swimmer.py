"""Swimmer: reach a target by undulating in viscous fluid
(reference: mjpc/tasks/swimmer — includes target relocation Transition)."""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry

_GOLDEN = 2.39996  # radians; deterministic target sequence


def residual(model, data, params):
  nose = data.site_xpos[model.site("nose")]
  target = data.mocap_pos[0][:2]
  delta = nose[:2] - target
  # nose velocity projected on the direction to the target: gives the
  # planner an immediate within-horizon signal (undulation takes cycles
  # to shrink the distance itself)
  head = model.body("head")
  v = data.cvel[head][3:] + jnp.cross(data.cvel[head][:3], nose)
  direction = -delta / jnp.maximum(jnp.linalg.norm(delta), 1e-6)
  toward = jnp.dot(v[:2], direction) - 0.2
  return jnp.concatenate([delta, toward[None], data.ctrl])


def transition(model, data, params):
  """Relocate the target when the nose reaches it (jit-safe FSM via
  userdata counter; reference swimmer Transition randomizes)."""
  nose = data.site_xpos[model.site("nose")][:2]
  target = data.mocap_pos[0][:2]
  reached = jnp.linalg.norm(nose - target) < 0.06
  idx = data.userdata[0] + jnp.where(reached, 1.0, 0.0)
  ang = _GOLDEN * idx
  new_target = nose + 0.5 * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
  target2 = jnp.where(reached, new_target, target)
  return data.replace(
      mocap_pos=data.mocap_pos.at[0, :2].set(
          target2.astype(data.mocap_pos.dtype)),
      userdata=data.userdata.at[0].set(idx.astype(data.userdata.dtype)))


@registry.register("Swimmer")
def make(dtype=jnp.float32) -> base.Task:
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_swimmer, dtype)
  return base.Task(name="Swimmer", model=model, spec=spec, params=params,
                   residual=residual, transition=transition,
                   param_names=pnames)
