"""Rubik cube solve: scramble → solve → wait FSM over face rotations.

Reference: mjpc/tasks/rubik/solve.cc:1-248 (modes kModeScramble/kModeSolve/
kModeWait, solve.h:56-62; a scramble stack of quarter-turn face moves is
applied and then unwound in reverse). The reference manipulates a full
26-cubie cube with a Shadow hand; here the plant is the reference's own
actuated face-layer mechanism (transition_model.xml.patch) — the planner
must drive each commanded face to its ±90° target through torque-limited
motors, and the FSM carries the move stack.

Moves are a deterministic invertible sequence (face(k), dir(k)) of the
move index, so the solve phase recomputes and undoes move k without
storing the stack: userdata = [mode, move_idx, target_angles x6].
Modes: 0 = scramble, 1 = solve, 2 = wait (solved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry

_HALF_PI = 1.5707963267948966

MODE_SCRAMBLE = 0
MODE_SOLVE = 1
MODE_WAIT = 2


def _move(k):
  """Deterministic invertible move sequence: (face ∈ [0,6), dir ∈ {−1,1})."""
  face = jnp.mod(3.0 * k + 1.0, 6.0)
  direction = 1.0 - 2.0 * jnp.mod(k, 2.0)
  return face, direction


def residual(model, data, params):
  targets = data.userdata[2:8]
  return jnp.concatenate([
      data.qpos[:6] - targets,
      data.qvel[:6],
      data.ctrl,
  ])


def transition(model, data, params):
  """Advance the scramble/solve stack when all faces reach their targets."""
  n_moves = params[0]
  tol = params[1]
  mode = data.userdata[0]
  idx = data.userdata[1]
  targets = data.userdata[2:8]

  settled = jnp.logical_and(
      jnp.max(jnp.abs(data.qpos[:6] - targets)) < tol,
      jnp.max(jnp.abs(data.qvel[:6])) < 0.6)

  # scramble: apply move idx (targets[face] += dir·π/2), idx += 1;
  # switch to solve after n_moves. solve: undo move idx−1, idx −= 1;
  # switch to wait at idx == 0.
  face_s, dir_s = _move(idx)
  onehot_s = (jnp.arange(6, dtype=targets.dtype) == face_s)
  scramble_targets = targets + jnp.where(onehot_s, dir_s * _HALF_PI, 0.0)

  face_u, dir_u = _move(idx - 1.0)
  onehot_u = (jnp.arange(6, dtype=targets.dtype) == face_u)
  solve_targets = targets - jnp.where(onehot_u, dir_u * _HALF_PI, 0.0)

  in_scramble = jnp.logical_and(mode == MODE_SCRAMBLE, settled)
  in_solve = jnp.logical_and(mode == MODE_SOLVE, settled)

  new_targets = jnp.where(in_scramble, scramble_targets,
                          jnp.where(in_solve, solve_targets, targets))
  new_idx = jnp.where(in_scramble, idx + 1.0,
                      jnp.where(in_solve, idx - 1.0, idx))
  # mode transitions fire when the LAST move of the phase has been applied
  to_solve = jnp.logical_and(in_scramble, idx + 1.0 >= n_moves)
  to_wait = jnp.logical_and(in_solve, idx - 1.0 <= 0.0)
  new_mode = jnp.where(to_solve, float(MODE_SOLVE),
                       jnp.where(to_wait, float(MODE_WAIT), mode))

  ud = data.userdata
  ud = ud.at[0].set(new_mode.astype(ud.dtype))
  ud = ud.at[1].set(new_idx.astype(ud.dtype))
  ud = jax.lax.dynamic_update_slice(ud, new_targets.astype(ud.dtype), (2,))
  return data.replace(userdata=ud)


@registry.register("Rubik")
def make(dtype=jnp.float32) -> base.Task:
  model, spec, params, pnames = registry.load_task_model("rubik.xml", dtype)
  return base.Task(name="Rubik", model=model, spec=spec, params=params,
                   residual=residual, transition=transition,
                   param_names=pnames)
