"""OP3 biped stand / handstand (reference: mjpc/tasks/op3/stand.cc:26-130).

Residual mirrors stand.cc: Height (head-or-hands over feet vs goal,
depending on mode), Balance (CoM over feet midpoint), CoM velocity,
ctrl-difference from the home stance, Upright (torso z ±1 by mode + both
feet z-axes), joint velocity. Modes: Stand / Handstand (the reference
flips between head-feet and hand-feet height via its mode index).
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import sensors as psensors
from mujoco_mpc_tpu.tasks import base, registry

MODE_STAND, MODE_HANDSTAND = 0, 1
MODE_NAMES = ("Stand", "Handstand")


def residual(model, data, params):
  dtype = data.qpos.dtype
  mode = data.userdata[base.MODE_SLOT].astype(jnp.int32)
  height_goal = params[0]
  torso = model.body("torso")

  feet = 0.5 * (data.xpos[model.body("right_foot")] +
                data.xpos[model.body("left_foot")])
  head = data.site_xpos[model.site("head")]
  hands = 0.5 * (data.xpos[model.body("right_hand")] +
                 data.xpos[model.body("left_hand")])

  # ----- Height: head (stand) or hands (handstand) over feet
  # (stand.cc:58-67) — handstand drives feet above hands -----
  head_feet = head[2] - feet[2] - height_goal
  hand_feet = feet[2] - hands[2] - height_goal
  height = jnp.where(mode == MODE_HANDSTAND, hand_feet, head_feet)

  # ----- Balance: CoM over support (stand.cc:70-90) -----
  com = data.subtree_com[torso]
  support = jnp.where(mode == MODE_HANDSTAND, hands[:2], feet[:2])
  balance = jnp.linalg.norm(com[:2] - support)

  comvel = psensors.subtree_linvel(model, data, torso)[:2]

  home_ctrl = jnp.asarray(model.keyframe("home")[2], dtype=dtype)
  ctrl_diff = data.ctrl - home_ctrl

  # ----- Upright: torso z up (down when handstanding) + feet flat -----
  up_sign = jnp.where(mode == MODE_HANDSTAND, -1.0, 1.0)
  torso_up = data.xmat[torso, 2, 2] - up_sign
  z_ref = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
  up_rfoot = data.xmat[model.body("right_foot"), :, 2] - up_sign * z_ref
  up_lfoot = data.xmat[model.body("left_foot"), :, 2] - up_sign * z_ref
  upright = jnp.concatenate([torso_up[None], up_rfoot, up_lfoot])

  joint_vel = data.qvel[6:]

  return jnp.concatenate([
      height[None], balance[None], comvel, ctrl_diff, upright, joint_vel,
  ])


@registry.register("OP3")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model("op3.xml", dtype)
  return base.Task(name="OP3", model=model, spec=spec, params=params,
                   residual=residual, mode_names=MODE_NAMES,
                   param_names=pnames)
