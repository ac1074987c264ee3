"""Bimanual ALOHA-style handover (reference:
mjpc/tasks/bimanual/handover/handover.cc:1-185).

Two mirrored arms with parallel grippers must pick a free box and bring it
to a target that alternates sides of the table, forcing a handover.

Residual mirrors handover.cc:33-131:
  (0) Reach L: box position in the left gripper frame, y/z doubled so the
      gripper orients its approach axis at the object (handover.cc:38-46)
  (1) Reach R: same for the right gripper
  (2) Grasp: geometric mean over hands of 0.5*(n_L·n_R + 1) where n_* are
      mean contact normals finger→object — 0 when a hand pinches the box
      with opposing normals, 1 when no hand grasps (handover.cc:55-124).
      The reference scans mjData.contact; here the contact rows of each
      finger↔box pair are static slots (physics/collision.py geom_pair_slots)
      so the term is jit/vmap-safe.
  (3) Bring: box − target (handover.cc:127-130)
  (4) joint-velocity regularizer (ours; the reference damps via actuators)

Transition mirrors handover.cc:134-185 as a pure jit-safe FSM in userdata:
target relocation on success (deterministic golden-ratio sequence instead
of absl::Uniform), box reset when it falls off the table, arm reset after
30 s without a solve. userdata[0] = solve counter, userdata[1] = last
solve time.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import collision
from mujoco_mpc_tpu.physics import sensors as psens
from mujoco_mpc_tpu.tasks import base, registry

_SOLVE_TIMEOUT = 30.0
_PHI = 0.6180339887498949  # golden-ratio conjugate, for low-discrepancy seq


def _gripper_frame_vec(model, data, site_name, point):
  """point in the site frame, lateral components doubled
  (leading-axis ops: runs inside the tile megakernel too)."""
  s = model.site(site_name)
  local = psens.mat_tvec0(data.site_xmat[s], point - data.site_xpos[s])
  return jnp.stack([local[0], 2.0 * local[1], 2.0 * local[2]])


_GRASP_MARGIN = 0.02  # reference grasp-site margin/gap (handover task.xml:85)


def _finger_normal(model, data, finger_geom, obj_geom):
  """(unit mean contact normal finger→object, has_contact flag).

  Normals count within _GRASP_MARGIN of touch, not only at penetration:
  the reference's grasp sensors are sphere geoms with margin=gap=0.02, so
  its normals appear (forcelessly) during the approach — that early
  signal is what shapes the pinch before contact. Our candidate-pair
  slots always carry dist, so the margin is just a threshold."""
  start, count, sign = collision.geom_pair_slots(
      model, model.geom(finger_geom), model.geom(obj_geom))
  normals = data.contact.frame[start:start + count, 0] * sign
  active = (data.contact.dist[start:start + count] < _GRASP_MARGIN)
  avg = jnp.sum(normals * active[:, None].astype(normals.dtype), axis=0)
  nrm = psens.norm0(avg)
  return avg / jnp.maximum(nrm, 1e-9), nrm > 1e-9


def _grasp_quality(model, data):
  """Geometric-mean grasp term of handover.cc:100-124 (1 = no grasp)."""
  one = jnp.asarray(1.0, dtype=data.qpos.dtype)
  quality = one
  for side in ("left", "right"):
    n1, h1 = _finger_normal(model, data, f"{side}/fingerL_geom", "box_geom")
    n2, h2 = _finger_normal(model, data, f"{side}/fingerR_geom", "box_geom")
    hand = jnp.where(h1 & h2, 0.5 * (psens.dot0(n1, n2) + 1.0), one)
    quality = quality * hand
  return jnp.sqrt(jnp.maximum(quality, 0.0))


def residual(model, data, params):
  box = data.xpos[model.body("box")]
  target = data.mocap_pos[0]
  reach_l = _gripper_frame_vec(model, data, "left/gripper", box)
  reach_r = _gripper_frame_vec(model, data, "right/gripper", box)
  grasp = _grasp_quality(model, data)
  return jnp.concatenate([
      reach_l,
      reach_r,
      grasp[None],
      box - target,
      data.qvel[:16],  # 2 x 8 arm dofs (6 joints + 2 fingers per arm)
  ])


def transition(model, data, params):
  """Success/fall/timeout FSM (handover.cc:134-185), pure and jit-safe."""
  dtype = data.qpos.dtype
  box = data.xpos[model.body("box")]
  target = data.mocap_pos[0]
  target_size = model.geom_size[model.geom("target_geom"), 0]
  solved = jnp.linalg.norm(box - target) < target_size

  # --- target relocation on success: flip sides, low-discrepancy offsets
  count = data.userdata[0] + jnp.where(solved, 1.0, 0.0)
  u1 = jnp.mod(count * _PHI, 1.0)
  u2 = jnp.mod(count * _PHI * 7.0, 1.0)
  u3 = jnp.mod(count * _PHI * 13.0, 1.0)
  flip = jnp.where(target[0] > 0, -1.0, 1.0)
  side = jnp.where(u2 > 0.5, 1.0, -1.0)
  new_target = jnp.stack([
      flip * (0.3 + 0.1 * u1),
      side * (0.2 + 0.1 * u2),
      0.25 + 0.45 * u3,
  ]).astype(dtype)
  mocap_pos = jnp.where(solved, new_target, target)
  solve_time = jnp.where(solved, data.time, data.userdata[1])

  key_qpos = jnp.asarray(model.keyframe("home")[0], dtype=dtype)

  # --- box reset when it falls off the table (handover.cc:170-176)
  fell = box[2] < -0.1
  qpos = data.qpos
  qvel = data.qvel
  box_q = jnp.where(fell, key_qpos[16:23], qpos[16:23])
  qpos = qpos.at[16:23].set(box_q)
  box_v = jnp.where(fell, jnp.zeros(6, dtype=dtype), qvel[16:22])
  qvel = qvel.at[16:22].set(box_v)

  # --- arm reset after 30 s without a solve (handover.cc:179-185)
  stuck = data.time > solve_time + _SOLVE_TIMEOUT
  qpos = jnp.where(stuck, key_qpos, qpos)
  qvel = jnp.where(stuck, jnp.zeros_like(qvel), qvel)
  solve_time = jnp.where(stuck, data.time, solve_time)

  return data.replace(
      qpos=qpos, qvel=qvel,
      mocap_pos=data.mocap_pos.at[0].set(mocap_pos),
      userdata=data.userdata.at[0].set(count).at[1].set(solve_time))


@registry.register("Bimanual Handover")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model("bimanual.xml", dtype)
  return base.Task(name="Bimanual Handover", model=model, spec=spec,
                   params=params, residual=residual, transition=transition,
                   param_names=pnames)
