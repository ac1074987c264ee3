"""Trajectory rollouts: lax.scan over the physics step with cost recording.

Replaces Trajectory::Rollout + ThreadPool fan-out (mjpc/trajectory.cc:
92-210, mjpc/planners/sampling/planner.cc:355-393): one rollout is a scan;
a batch of candidates is a vmap; a multi-chip batch is a shard_map over the
candidate axis (parallel/mesh.py). Divergence handling follows the
reference (CheckWarnings → pin return to a huge value so bad samples lose,
mjpc/trajectory.cc:169-187) via nan→big-cost masking, which is also what
the MJX prototype does (predictive_sampling.py:107).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.step import step as _phys_step
from mujoco_mpc_tpu.physics.types import Data, Model
from mujoco_mpc_tpu.tasks import base as task_base

# reference kMaxReturnValue: divergence sentinel cost
MAX_RETURN = 1e6

PolicyFn = Callable[[jax.Array, Data], jax.Array]  # (time, data) -> ctrl


def _scale(task, m, d, tp):
  """State-dependent (nterm,) weight multiplier, or None (Task.weight_mod,
  the pure analogue of reference Transition weight mutation)."""
  if task.weight_mod is None:
    return None
  return task.weight_mod(m, d, tp.residual_params)


class RolloutResult(NamedTuple):
  total_return: jax.Array  # () mean per-step cost (risk-transformed)
  costs: jax.Array  # (T,)
  qpos: jax.Array  # (T, nq) post-step configurations
  residuals: jax.Array  # (T, nres)
  final: Data


def rollout(task: task_base.Task, d0: Data, policy_fn: PolicyFn,
            horizon: int, params: Optional[task_base.TaskParams] = None,
            transition: bool = False, unroll: int = 1) -> RolloutResult:
  """Roll a policy for `horizon` steps, recording residuals and costs.

  Cost at step t is evaluated on the pre-step state with the step's action
  applied (matching the MJX prototype's step function; the C++ reference
  records sensordata inside mj_step — same quantity one pipeline stage
  apart).
  """
  m = task.model
  tp = params if params is not None else task.params

  if transition and task.transition is not None:
    # transitions may read any derived field → carry the full Data
    def body(d, _):
      action = policy_fn(d.time, d)
      d = d.replace(ctrl=action)
      d = task.transition(m, d, tp.residual_params)
      d = _phys_step(m, d)
      res = task.residual(m, d, tp.residual_params)
      cost = task_base.cost_value(task.spec, tp, res, _scale(task, m, d, tp))
      return d, (cost, d.qpos, res)

    final, (costs, qpos, residuals) = jax.lax.scan(
        body, d0, None, length=horizon)
  else:
    # hot path: carry ONLY the integrated state. Carrying the full Data
    # makes XLA copy every derived field (xpos/cdof/qM/…) through the
    # while-loop each step — measured 41% of device time on the walker
    # planner iteration. Derived fields are recomputed in-step anyway.
    def body(carry, _):
      qpos, qvel, act, t, lam = carry
      # lam: APGD warm start — previous step's dual forces (solver.py)
      d = d0.replace(qpos=qpos, qvel=qvel, act=act, time=t,
                     efc_lambda=lam)
      action = policy_fn(t, d)
      d = _phys_step(m, d.replace(ctrl=action))
      res = task.residual(m, d, tp.residual_params)
      cost = task_base.cost_value(task.spec, tp, res, _scale(task, m, d, tp))
      return ((d.qpos, d.qvel, d.act, d.time, d.efc_lambda),
              (cost, d.qpos, res))

    carry, (costs, qpos, residuals) = jax.lax.scan(
        body, (d0.qpos, d0.qvel, d0.act, d0.time, d0.efc_lambda), None,
        length=horizon, unroll=unroll)
    final = d0.replace(qpos=carry[0], qvel=carry[1], act=carry[2],
                       time=carry[3], efc_lambda=carry[4])

  # divergence guard: any nan/inf in the trajectory → huge return
  costs = jnp.nan_to_num(costs, nan=MAX_RETURN, posinf=MAX_RETURN,
                         neginf=MAX_RETURN)
  total = jnp.mean(costs)
  return RolloutResult(total, costs, qpos, residuals, final)


def rollout_return(task: task_base.Task, d0: Data, policy_fn: PolicyFn,
                   horizon: int,
                   params: Optional[task_base.TaskParams] = None,
                   unroll: int = 1) -> jax.Array:
  """Scalar-return-only rollout (cheapest form for sampling planners)."""
  return rollout(task, d0, policy_fn, horizon, params,
                 unroll=unroll).total_return


def noisy_rollout(task: task_base.Task, d0: Data, policy_fn: PolicyFn,
                  horizon: int, rng: jax.Array,
                  xfrc_std: float = 0.1, xfrc_rate: float = 0.1,
                  params: Optional[task_base.TaskParams] = None
                  ) -> jax.Array:
  """Domain-randomized rollout: OU applied-force perturbations on bodies.

  Reference Trajectory::NoisyRollout (mjpc/trajectory.cc:147-155), used by
  the Robust planner to re-score candidates under disturbance. The OU
  process runs inside the scan; stationary std = xfrc_std · body mass scale.
  """
  m = task.model
  tp = params if params is not None else task.params
  mass_scale = jnp.concatenate(
      [jnp.ones((m.nbody, 3), dtype=d0.qpos.dtype),
       jnp.broadcast_to(m.body_mass[:, None], (m.nbody, 3))], axis=-1)

  def body(carry, key):
    qpos, qvel, act, t, ou, lam = carry
    eps = jax.random.normal(key, ou.shape, dtype=ou.dtype)
    ou = (1.0 - xfrc_rate) * ou + jnp.sqrt(
        xfrc_rate * (2 - xfrc_rate)) * xfrc_std * mass_scale * eps
    d = d0.replace(qpos=qpos, qvel=qvel, act=act, time=t, efc_lambda=lam)
    action = policy_fn(t, d)
    d = _phys_step(m, d.replace(ctrl=action, xfrc_applied=ou))
    res = task.residual(m, d, tp.residual_params)
    cost = task_base.cost_value(task.spec, tp, res, _scale(task, m, d, tp))
    return (d.qpos, d.qvel, d.act, d.time, ou, d.efc_lambda), cost

  keys = jax.random.split(rng, horizon)
  # inherit d0's varying-manual-axes type so the scan carry is consistent
  # when this runs inside a shard_map shard (see parallel/mesh.py)
  ou0 = jnp.zeros((m.nbody, 6), dtype=d0.qpos.dtype) + 0.0 * d0.qpos[0]
  _, costs = jax.lax.scan(
      body, (d0.qpos, d0.qvel, d0.act, d0.time, ou0, d0.efc_lambda), keys)
  costs = jnp.nan_to_num(costs, nan=MAX_RETURN, posinf=MAX_RETURN,
                         neginf=MAX_RETURN)
  return jnp.mean(costs)
