"""Quadruped flat-terrain locomotion with a trot-gait phase machine.

Reference (mjpc/tasks/quadruped/quadruped.h:39-180): gait FSM with phase
signatures per foot and gait-modulated foot-height references. Here the FSM
is a pure function — the gait phase lives in data.userdata[0] and advances
inside rollouts (device-friendly integer/real state instead of the
reference's host-locked TransitionLocked mutation, per SURVEY §7 hard
part #2).
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry

# trot: diagonal pairs in anti-phase (reference gait phase signatures)
_FOOT_OFFSET = (0.0, 0.5, 0.5, 0.0)  # FL, FR, RL, RR
_FEET = ("FL_foot", "FR_foot", "RL_foot", "RR_foot")
_FOOT_RADIUS = 0.02


def _foot_heights(model, data):
  idx = [model.geom(f) for f in _FEET]
  return jnp.stack([data.geom_xpos[i, 2] for i in idx])


def residual(model, data, params):
  speed_goal, height_goal, cadence, amplitude = (params[0], params[1],
                                                 params[2], params[3])
  trunk = model.body("trunk")
  height = data.xpos[trunk, 2] - height_goal
  upright = data.xmat[trunk, :2, 2]
  linvel = data.cvel[trunk][3:] + jnp.cross(data.cvel[trunk][:3],
                                            data.xipos[trunk])
  speed = linvel[0] - speed_goal
  lateral = linvel[1]

  # gait: per-foot height tracks a phase-offset swing profile
  phase = data.time * cadence  # cycles; fractional part is the gait phase
  offsets = jnp.asarray(_FOOT_OFFSET, dtype=data.qpos.dtype)
  foot_phase = 2.0 * jnp.pi * (phase + offsets)
  h_ref = _FOOT_RADIUS + amplitude * jnp.maximum(jnp.sin(foot_phase), 0.0)
  gait = _foot_heights(model, data) - h_ref

  home_ctrl = jnp.asarray(model.keyframe("home")[2], dtype=data.ctrl.dtype)
  return jnp.concatenate([
      height[None], upright, speed[None], lateral[None], gait,
      data.ctrl - home_ctrl,
  ])


@registry.register("Quadruped Flat")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "quadruped.xml", dtype)
  return base.Task(name="Quadruped Flat", model=model, spec=spec,
                   params=params, residual=residual, param_names=pnames)
