"""Humanoid Interact: sit-on-chair / stand scene interaction (reference:
mjpc/tasks/humanoid/interact/interact.cc:30-196).

Residual mirrors the reference's helper stack (interact.cc:188-196):
per-body Up terms, head height toward the mode's target, knee/CoM-over-
feet terms, facing direction, CoM velocity, plus a pelvis→seat term that
replaces the reference's per-contact-pair distance machinery (its scene
keyframes pin contact pairs; here the Sit mode pulls the pelvis to the
chair's seat site directly). Modes: Sit / Stand, toggling head-height
target and the seat/feet-placement weights through Task.weight_mod.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import sensors as psensors
from mujoco_mpc_tpu.tasks import base, registry

MODE_SIT, MODE_STAND = 0, 1
MODE_NAMES = ("Sit", "Stand")
_T_KNEExy, _T_COMxy, _T_SEAT = 5, 6, 9


def _up(data, body, model):
  return jnp.abs(data.xmat[model.body(body), 2, 2] - 1.0)


def residual(model, data, params):
  dtype = data.qpos.dtype
  mode = data.userdata[base.MODE_SLOT].astype(jnp.int32)
  sit_h, stand_h = params[0], params[1]
  torso = model.body("torso")
  pelvis = model.body("pelvis")
  rfoot = model.body("right_foot")
  lfoot = model.body("left_foot")

  # ----- up terms (interact.cc:33-38); pelvis up is not penalized when
  # sitting (the reference's sit keyframes tilt it) -----
  up_torso = _up(data, "torso", model)
  up_pelvis = jnp.where(mode == MODE_SIT, 0.0, _up(data, "pelvis", model))
  up_rfoot = _up(data, "right_foot", model)
  up_lfoot = _up(data, "left_foot", model)

  # ----- head height toward the mode target (interact.cc:42-47) -----
  head = data.site_xpos[model.site("head_site")]
  target_h = jnp.where(mode == MODE_SIT, sit_h, stand_h)
  head_height = jnp.abs(head[2] - target_h)

  # ----- knees / CoM over feet (interact.cc:60-91) -----
  knees = 0.5 * (data.xpos[model.body("right_shin")][:2] +
                 data.xpos[model.body("left_shin")][:2])
  feet = 0.5 * (data.xpos[rfoot][:2] + data.xpos[lfoot][:2])
  knee_xy = jnp.linalg.norm(knees - feet)
  com = data.subtree_com[torso]
  com_xy = jnp.linalg.norm(com[:2] - feet)

  # ----- facing direction: toward the chair (interact.cc:97-110) -----
  chair = data.xpos[model.body("chair")]
  fwd = data.xmat[torso, :2, 0]
  fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
  to_chair = chair[:2] - data.xpos[torso][:2]
  to_chair = to_chair / jnp.maximum(jnp.linalg.norm(to_chair), 1e-9)
  facing = jnp.linalg.norm(fwd - to_chair)

  # ----- CoM velocity (damps drift) -----
  comvel = psensors.subtree_linvel(model, data, torso)[:2]

  # ----- pelvis → seat (Sit mode) -----
  seat = data.site_xpos[model.site("seat_site")]
  pelvis_seat = data.xpos[pelvis] - seat - jnp.asarray(
      [0.0, 0.0, 0.08], dtype=dtype)

  home_ctrl = jnp.asarray(model.keyframe("home")[2], dtype=dtype)
  control = data.ctrl - home_ctrl

  return jnp.concatenate([
      up_torso[None], up_pelvis[None], up_rfoot[None], up_lfoot[None],
      head_height[None], knee_xy[None], com_xy[None], facing[None],
      comvel, pelvis_seat, control,
  ])


def weight_mod(model, data, params):
  """Mode weight toggles: Sit pulls to the seat and releases the
  feet-placement terms; Stand does the opposite (the reference swaps
  weight sets per mode through its GUI mode machinery)."""
  mode = data.userdata[base.MODE_SLOT].astype(jnp.int32)
  sit = (mode == MODE_SIT).astype(data.qpos.dtype)
  scale = jnp.ones(11, dtype=data.qpos.dtype)
  scale = scale.at[_T_SEAT].set(sit)
  scale = scale.at[_T_KNEExy].set(1.0 - sit)
  scale = scale.at[_T_COMxy].set(1.0 - sit)
  return scale


@registry.register("Humanoid Interact")
def make(dtype=jnp.float32) -> base.Task:
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_humanoid_interact, dtype)
  return base.Task(name="Humanoid Interact", model=model, spec=spec,
                   params=params, residual=residual, weight_mod=weight_mod,
                   mode_names=MODE_NAMES, param_names=pnames)
