"""Rubik cube solve: a free cube with a face-layer mechanism held and
turned by the Shadow hand.

Reference: mjpc/tasks/rubik/solve.cc:1-248 (modes kModeScramble/
kModeSolve/kModeWait, solve.h:56-62) on rubik/task.xml (26-cubie cube +
menagerie Shadow hand). Here the plant is tasks/models/rubik_hand.xml:
the same authored 24-joint/20-actuator Shadow hand as the reorient task
holding a free-body cube that carries six PASSIVE face hinges (the
reference's own transition-model face mechanism, transition_model.xml
.patch, mounted on the manipulated body) — the planner must keep the
cube in the palm, reorient it, and physically turn commanded face layers
with the fingers.

Residual layout mirrors solve.cc:59-133 at our hand's counts:
  (0) In Hand      cube_position − palm/grasp position          (3)
  (1) Orientation  goal ⊖ cube quaternion                       (3)
  (2) Cube Vel.    cube linear velocity                         (3)
  (3) Actuator     actuator_force                               (20)
  (4) Red..Yellow  face angle − goal-stack target (solve mode)  (6×1)
  (5) Grasp        hand configuration − home grasp              (24)
  (6) Joint Vel.   hand joint velocity                          (24)
  (7) Remaining    goal_index × 12 (progress bonus, Null norm)  (1)

The scramble is the reference's host-side instantaneous face-state write
(solve.cc:155-201 copies the transition model's qpos into the plant);
here it teleports the face hinges to the scrambled stack in one
transition call. Moves are a deterministic invertible sequence
(face(k), dir(k)) so the solve phase recomputes target stage g as the
cumulative sum of moves k < g without storing the goal cache:
userdata = [mode, goal_index]. Modes: 0 scramble, 1 solve, 2 wait.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math as pmath
from mujoco_mpc_tpu.physics import sensors as psens
from mujoco_mpc_tpu.tasks import base, registry

_HALF_PI = 1.5707963267948966

MODE_SCRAMBLE = 0
MODE_SOLVE = 1
MODE_WAIT = 2

MAX_MOVES = 10  # BASELINE config 5: 10-move unscramble
_NHAND = 24
_QCUBE = 24  # qpos offset of the cube free joint (after 24 hand joints)
_VCUBE = 24
_QFACE = 31  # qpos offset of the 6 face hinges
_VFACE = 30


def _move_static(k: int):
  """Deterministic invertible move sequence (STATIC per index):
  face ∈ [0,6), dir ∈ {−1,+1}. Mirrors the reference's per-scramble
  random face/direction draws (solve.cc:176-189) with a jit-safe
  deterministic schedule."""
  face = (3 * k + 1) % 6
  direction = 1.0 - 2.0 * (k % 2)
  return face, direction


def _face_targets(g, dtype):
  """Goal-stack face angles at stage g: cumulative moves k < g.

  solve.cc:160-165 goal_cache[i] = face state BEFORE move i; target at
  goal_index g is therefore Σ_{k<g} move_k. g may carry trailing batch
  dims (tile megakernel); returns (6, *b)."""
  cols = []
  for j in range(6):
    tj = None
    for k in range(MAX_MOVES):
      f, s = _move_static(k)
      if f != j:
        continue
      term = jnp.where(g > k, s * _HALF_PI, 0.0).astype(dtype)
      tj = term if tj is None else tj + term
    if tj is None:
      tj = jnp.zeros_like(jnp.asarray(g, dtype=dtype))
    cols.append(tj)
  return jnp.stack(cols)


def residual(model, data, params):
  mode = data.userdata[0]
  g = data.userdata[1]
  cube_pos = data.qpos[_QCUBE:_QCUBE + 3]
  cube_quat = data.qpos[_QCUBE + 3:_QCUBE + 7]
  palm = data.site_xpos[model.site("grasp_site")]
  goal_quat = data.mocap_quat[0]
  goal_quat = goal_quat / psens.norm0(goal_quat)
  ori_err = psens.quat_sub0(goal_quat, cube_quat)
  cube_vel = data.qvel[_VCUBE:_VCUBE + 3]
  # face-goal rows active in solve mode only (solve.cc:102-112 zeroes
  # them outside kModeSolve/kModeManual)
  targets = _face_targets(g, data.qpos.dtype)
  face_err = jnp.where(mode == MODE_SOLVE,
                       data.qpos[_QFACE:_QFACE + 6] - targets, 0.0)
  home = _home_hand(model)
  remaining = (g * 12.0).astype(data.qpos.dtype)  # solve.cc:128-131
  return jnp.concatenate([
      cube_pos - palm,
      ori_err,
      cube_vel,
      data.actuator_force,
      face_err,
      psens.sub_const0(data.qpos[:_NHAND], home),
      data.qvel[:_NHAND],
      remaining[None],
  ])


def _home_hand(model):
  qpos, _, _ = model.keyframe("home")
  return qpos[:_NHAND]  # numpy (tile path) or traced leaf (general)


def transition(model, data, params):
  """Scramble → solve → wait FSM (solve.cc:141-232, jit-safe)."""
  n_moves = jnp.clip(params[0], 0.0, float(MAX_MOVES))
  tol = params[1]
  mode = data.userdata[0]
  g = data.userdata[1]
  dtype = data.qpos.dtype

  faces = data.qpos[_QFACE:_QFACE + 6]

  # --- scramble: teleport faces to the scrambled stack (the reference
  # writes the transition model's qpos into the plant, solve.cc:193-198),
  # goal_index = n_moves − 1, mode → solve
  scrambled = _face_targets(n_moves, dtype)
  in_scramble = mode == MODE_SCRAMBLE
  new_faces = jnp.where(in_scramble, scrambled, faces)
  qpos = jax.lax.dynamic_update_slice(data.qpos, new_faces, (_QFACE,))
  face_vel = jnp.where(in_scramble, jnp.zeros(6, dtype=dtype),
                       data.qvel[_VFACE:_VFACE + 6])
  qvel = jax.lax.dynamic_update_slice(data.qvel, face_vel, (_VFACE,))

  # --- solve: advance the goal stack when the current stage is reached
  # (solve.cc:212-223: error norm < 0.085 → goal_index−− or solved)
  target = _face_targets(g, dtype)
  err = jnp.linalg.norm(new_faces - target)
  reached = jnp.logical_and(mode == MODE_SOLVE, err < tol)
  solved = jnp.logical_and(reached, g <= 0.0)

  new_mode = jnp.where(in_scramble, float(MODE_SOLVE), mode)
  new_g = jnp.where(in_scramble, jnp.maximum(n_moves - 1.0, 0.0), g)
  new_g = jnp.where(jnp.logical_and(reached, g > 0.0), g - 1.0, new_g)
  new_mode = jnp.where(solved, float(MODE_WAIT), new_mode)

  # --- drop check: cube below the palm stops optimization
  # (solve.cc:235-241 kResetHeight)
  dropped = qpos[_QCUBE + 2] < 0.1
  new_mode = jnp.where(dropped, float(MODE_WAIT), new_mode)

  ud = data.userdata
  ud = ud.at[0].set(new_mode.astype(ud.dtype))
  ud = ud.at[1].set(new_g.astype(ud.dtype))
  return data.replace(qpos=qpos, qvel=qvel, userdata=ud)


@registry.register("Rubik")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model(
      "rubik_hand.xml", dtype)
  return base.Task(name="Rubik", model=model, spec=spec, params=params,
                   residual=residual, transition=transition,
                   param_names=pnames)


# ---------------------------------------------------------------------
# The bare face mechanism (the reference's transition_model.xml, which
# it simulates host-side to generate goals) kept as a directly-actuated
# task — a cheap planner-drivable unit of the face dynamics.
# ---------------------------------------------------------------------


def _faces_residual(model, data, params):
  targets = data.userdata[2:8]
  return jnp.concatenate([
      data.qpos[:6] - targets,
      data.qvel[:6],
      data.ctrl,
  ])


def _faces_move(k):
  """Traced-index variant of _move_static for the userdata FSM."""
  face = jnp.mod(3.0 * k + 1.0, 6.0)
  direction = 1.0 - 2.0 * jnp.mod(k, 2.0)
  return face, direction


def _faces_transition(model, data, params):
  """Advance the scramble/solve stack when all faces reach their targets."""
  n_moves = params[0]
  tol = params[1]
  mode = data.userdata[0]
  idx = data.userdata[1]
  targets = data.userdata[2:8]

  settled = jnp.logical_and(
      jnp.max(jnp.abs(data.qpos[:6] - targets)) < tol,
      jnp.max(jnp.abs(data.qvel[:6])) < 0.6)

  face_s, dir_s = _faces_move(idx)
  onehot_s = (jnp.arange(6, dtype=targets.dtype) == face_s)
  scramble_targets = targets + jnp.where(onehot_s, dir_s * _HALF_PI, 0.0)

  face_u, dir_u = _faces_move(idx - 1.0)
  onehot_u = (jnp.arange(6, dtype=targets.dtype) == face_u)
  solve_targets = targets - jnp.where(onehot_u, dir_u * _HALF_PI, 0.0)

  in_scramble = jnp.logical_and(mode == MODE_SCRAMBLE, settled)
  in_solve = jnp.logical_and(mode == MODE_SOLVE, settled)

  new_targets = jnp.where(in_scramble, scramble_targets,
                          jnp.where(in_solve, solve_targets, targets))
  new_idx = jnp.where(in_scramble, idx + 1.0,
                      jnp.where(in_solve, idx - 1.0, idx))
  to_solve = jnp.logical_and(in_scramble, idx + 1.0 >= n_moves)
  to_wait = jnp.logical_and(in_solve, idx - 1.0 <= 0.0)
  new_mode = jnp.where(to_solve, float(MODE_SOLVE),
                       jnp.where(to_wait, float(MODE_WAIT), mode))

  ud = data.userdata
  ud = ud.at[0].set(new_mode.astype(ud.dtype))
  ud = ud.at[1].set(new_idx.astype(ud.dtype))
  ud = jax.lax.dynamic_update_slice(ud, new_targets.astype(ud.dtype), (2,))
  return data.replace(userdata=ud)


@registry.register("Rubik Faces")
def make_faces(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model("rubik.xml", dtype)
  return base.Task(name="Rubik Faces", model=model, spec=spec, params=params,
                   residual=_faces_residual, transition=_faces_transition,
                   param_names=pnames)
