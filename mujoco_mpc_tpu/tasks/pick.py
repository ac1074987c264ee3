"""Panda "Pick": reach the cube, bring it to a 6-DoF target pose.

Reference: mjpc/tasks/panda/panda.cc:38-58 (residual — reach +
two-point bring) and panda.cc:74-99 (TransitionLocked — re-randomize box
and target when brought within 1.5 cm). The two-point bring (box1/box2
sites vs target1/target2 sites) encodes position AND axis orientation in
6 numbers. The transition is a pure jit-safe analogue: a deterministic
low-discrepancy sequence replaces absl::Uniform.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry

_PHI = 0.6180339887498949  # golden-ratio sequence for relocations


def residual(model, data, params):
  hand = data.site_xpos[model.site("eeff")]
  box = data.xpos[model.body("box")]
  reach = hand - box
  b1 = data.site_xpos[model.site("box1")]
  b2 = data.site_xpos[model.site("box2")]
  t1 = data.site_xpos[model.site("target1")]
  t2 = data.site_xpos[model.site("target2")]
  return jnp.concatenate([reach, b1 - t1, b2 - t2])


def transition(model, data, params):
  """Box + target relocation when brought (panda.cc:74-99)."""
  b1 = data.site_xpos[model.site("box1")]
  b2 = data.site_xpos[model.site("box2")]
  t1 = data.site_xpos[model.site("target1")]
  t2 = data.site_xpos[model.site("target2")]
  bring_dist = 0.5 * (jnp.linalg.norm(b1 - t1) + jnp.linalg.norm(b2 - t2))
  done = (bring_dist < 0.015) & (data.time > 0)

  count = data.userdata[0] + jnp.where(done, 1.0, 0.0)
  ang = 2.0 * jnp.pi * _PHI * count
  # new box position on the table, new target pose in the workspace
  new_box_xy = 0.35 * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
  new_tgt = jnp.stack([0.35 * jnp.cos(ang + 2.0), 0.35 * jnp.sin(ang + 2.0),
                       0.15 + 0.25 * (0.5 + 0.5 * jnp.sin(3.0 * ang))])

  qadr = model.jnt_qposadr[model.joint("box_root")]
  qpos = data.qpos
  qpos = qpos.at[qadr:qadr + 3].set(
      jnp.where(done, jnp.concatenate([new_box_xy, jnp.asarray(
          [0.05], dtype=qpos.dtype)]), qpos[qadr:qadr + 3]))
  mocap = data.mocap_pos.at[0].set(
      jnp.where(done, new_tgt.astype(data.mocap_pos.dtype),
                data.mocap_pos[0]))
  return data.replace(
      qpos=qpos, mocap_pos=mocap,
      userdata=data.userdata.at[0].set(count.astype(data.userdata.dtype)))


@registry.register("Pick")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "panda_pick.xml", dtype)
  return base.Task(name="Pick", model=model, spec=spec, params=params,
                   residual=residual, transition=transition,
                   param_names=pnames)
