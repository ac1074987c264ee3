"""PickAndPlace / Panda bring (reference:
mjpc/tasks/manipulation/manipulation.cc:31-101, common.cc).

Residual mirrors manipulation.cc:34-61:
  (0) Reach: gripper centroid − object              (3)
  (1) Bring: 8 object-corner ↔ target-corner dists  (8) — full 6-DoF pose
  (2) Careful: log10(1 + robot↔non-object force)    (1) (common.cc:210-229)
  (3) Away: min(0, hand_z − away_height)            (1)
  (4) joint-velocity regularizer                    (nu)

Transition mirrors manipulation.cc:64-101 as a pure two-phase FSM:
phase 0 "bring" (reach on, away off) → when the pose matches, phase 1
"away" (reach off, away on) → when the hand retreats, re-randomize the
target pose (deterministic low-discrepancy orientation sequence instead of
absl::Uniform) and return to phase 0. The reference toggles cost weights
in-place; here the toggle is Task.weight_mod reading userdata[0].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import collision
from mujoco_mpc_tpu.tasks import base, registry

_PHI = 0.6180339887498949
_AWAY_HEIGHT = 0.25
_T_REACH, _T_BRING, _T_CAREFUL, _T_AWAY = 0, 1, 2, 3

_CORNERS = [(sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
            for sz in (-1.0, 1.0)]


def _hand_pos(model, data):
  """Gripper centroid (ComputeRobotiqHandPos analog, common.cc:231-236)."""
  gl = data.geom_xpos[model.geom("fingerL_geom")]
  gr = data.geom_xpos[model.geom("fingerR_geom")]
  return 0.5 * (gl + gr)


def _corners(model, data, pos, mat):
  size = model.geom_size[model.geom("object_geom")]
  offs = jnp.asarray(_CORNERS, dtype=pos.dtype) * size
  return pos[None] + offs @ mat.T  # (8, 3)


def _careful(model, data):
  """log10(1 + Σ robot↔non-object contact force) (common.cc:210-229).
  Here the only robot↔non-object candidate pair is palm↔table."""
  try:
    start, count, _ = collision.geom_pair_slots(
        model, model.geom("palm"), model.geom("table"))
  except KeyError:
    return jnp.zeros((), dtype=data.qpos.dtype)
  f = data.contact.force[start:start + count]
  total = jnp.sum(jnp.linalg.norm(f, axis=-1))
  return jnp.log10(total + 1.0)


def residual(model, data, params):
  obj = model.body("object")
  hand = _hand_pos(model, data)
  reach = hand - data.xpos[obj]

  obj_c = _corners(model, data, data.xpos[obj], data.xmat[obj])
  tgt = model.body("target")
  tgt_c = _corners(model, data, data.xpos[tgt], data.xmat[tgt])
  bring = jnp.linalg.norm(obj_c - tgt_c, axis=-1)  # (8,)

  careful = _careful(model, data)
  away = jnp.minimum(0.0, hand[2] - _AWAY_HEIGHT)

  return jnp.concatenate([
      reach, bring, careful[None], away[None], data.qvel[:7],
  ])


def weight_mod(model, data, params):
  """Phase-dependent reach/away weight toggle (manipulation.cc:70-80)."""
  phase = data.userdata[0]  # 0 = bring, 1 = away
  scale = jnp.ones(5, dtype=data.qpos.dtype)
  scale = scale.at[_T_REACH].set(1.0 - phase)
  scale = scale.at[_T_AWAY].set(phase)
  return scale


def transition(model, data, params):
  dtype = data.qpos.dtype
  obj = model.body("object")
  obj_c = _corners(model, data, data.xpos[obj], data.xmat[obj])
  tgt = model.body("target")
  tgt_c = _corners(model, data, data.xpos[tgt], data.xmat[tgt])
  bring_err = jnp.mean(jnp.linalg.norm(obj_c - tgt_c, axis=-1))
  hand = _hand_pos(model, data)

  phase = data.userdata[0]
  count = data.userdata[1]
  # bring solved → switch to away
  to_away = (phase == 0.0) & (data.time > 0) & (bring_err < 0.04)
  # away solved → new target pose, back to bring
  to_bring = (phase == 1.0) & (hand[2] - _AWAY_HEIGHT > -0.01)

  count2 = count + jnp.where(to_bring, 1.0, 0.0)
  u1 = jnp.mod(count2 * _PHI, 1.0)
  u2 = jnp.mod(count2 * _PHI * 7.0, 1.0)
  u3 = jnp.mod(count2 * _PHI * 13.0, 1.0)
  u4 = jnp.mod(count2 * _PHI * 29.0, 1.0)
  raw = jnp.stack([2 * u1 - 1, 2 * u2 - 1, 2 * u3 - 1, 2 * u4 - 1])
  quat = raw / jnp.maximum(jnp.linalg.norm(raw), 1e-9)
  # reference resets to (0.45, 0, 0.15) in its table frame with a random
  # quat; here both position and orientation wander deterministically
  new_pos = jnp.stack([0.1 * (2 * u1 - 1), 0.1 * (2 * u2 - 1),
                       0.12 + 0.1 * u3]).astype(dtype)

  mocap_pos = jnp.where(to_bring, new_pos, data.mocap_pos[0])
  mocap_quat = jnp.where(to_bring, quat.astype(dtype), data.mocap_quat[0])
  new_phase = jnp.where(to_away, 1.0, jnp.where(to_bring, 0.0, phase))

  return data.replace(
      mocap_pos=data.mocap_pos.at[0].set(mocap_pos),
      mocap_quat=data.mocap_quat.at[0].set(mocap_quat),
      userdata=data.userdata.at[0].set(new_phase).at[1].set(count2))


@registry.register("PickAndPlace")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "panda_bring.xml", dtype)
  return base.Task(name="PickAndPlace", model=model, spec=spec,
                   params=params, residual=residual, transition=transition,
                   weight_mod=weight_mod, param_names=pnames,
                   mode_names=("bring", "away"))
