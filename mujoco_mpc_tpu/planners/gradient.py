"""Gradient-descent planner: autodiff through the rollout + line search.

The reference (mjpc/planners/gradient/planner.cc:159-, gradient/gradient.cc,
spline_mapping.cc) builds dJ/d(spline params) by chaining finite-difference
model Jacobians (mjd_transitionFD), analytic cost derivatives, and explicit
spline-mapping matrices. On TPU the whole chain is one reverse-mode autodiff
through the scanned rollout — exact, fused by XLA, and O(memory) bounded via
jax.checkpoint on the step. The parallel line search over step sizes
(reference linesearch members, gradient/planner.h) is a vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.ops.rollout import MAX_RETURN
from mujoco_mpc_tpu.physics.step import step as phys_step
from mujoco_mpc_tpu.planners.base import PlanInfo
from mujoco_mpc_tpu.physics.types import Data
from mujoco_mpc_tpu.tasks.base import Task, TaskParams, cost_value


@struct.dataclass
class GradientPolicy:
  times: jax.Array  # (k,)
  values: jax.Array  # (k, nu)


@dataclasses.dataclass(frozen=True)
class GradientConfig:
  spline_points: int = 10
  horizon: int = 100
  interp: spline.Interp = spline.Interp.LINEAR
  num_steps: int = 10  # line-search candidates
  min_step: float = 1e-4
  max_step: float = 1.0

  @classmethod
  def from_task(cls, task: Task, horizon_steps: Optional[int] = None):
    m = task.model
    dt = float(m.custom("agent_timestep", float(m.opt.timestep)))
    hor = horizon_steps or int(
        round(float(m.custom("agent_horizon", 1.0)) / dt))
    return cls(
        spline_points=int(m.custom("gradient_spline_points", 10)),
        horizon=hor)


class GradientPlanner:
  def __init__(self, config: GradientConfig):
    self.config = config

  def init(self, task: Task) -> GradientPolicy:
    m = task.model
    k = self.config.spline_points
    horizon_time = self.config.horizon * m.opt.timestep
    times = jnp.linspace(0.0, horizon_time, k).astype(m.qpos0.dtype)
    mid = task.default_ctrl()
    return GradientPolicy(times=times, values=jnp.tile(mid, (k, 1)))

  def action(self, task: Task, policy: GradientPolicy,
             data: Data) -> jax.Array:
    u = spline.sample(policy.times, policy.values, data.time,
                      self.config.interp)
    m = task.model
    return jnp.where(m.actuator_ctrllimited,
                     jnp.clip(u, m.actuator_ctrlrange[:, 0],
                              m.actuator_ctrlrange[:, 1]), u)

  def _return_fn(self, task: Task, data: Data, times: jax.Array,
                 params: TaskParams):
    """Differentiable total return as a function of spline node values."""
    cfg = self.config
    m = task.model
    tp = params

    @jax.checkpoint
    def body(carry, u):
      qpos, qvel, act, t = carry  # slim carry: avoid full-Data loop copies
      d = data.replace(qpos=qpos, qvel=qvel, act=act, time=t, ctrl=u)
      d = phys_step(m, d)
      res = task.residual(m, d, tp.residual_params)
      return (d.qpos, d.qvel, d.act, d.time), cost_value(task.spec, tp, res)

    def total(values):
      lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
      # smooth clip keeps useful gradients at the control bounds
      mid = 0.5 * (lo + hi)
      half = 0.5 * (hi - lo)
      ts = data.time + jnp.arange(cfg.horizon, dtype=values.dtype) * (
          m.opt.timestep)
      us = spline.sample_many(times, values, ts, cfg.interp)
      us = jnp.where(m.actuator_ctrllimited,
                     mid + half * jnp.tanh((us - mid) / half), us)
      _, costs = jax.lax.scan(
          body, (data.qpos, data.qvel, data.act, data.time), us)
      return jnp.mean(costs)

    return total

  def optimize(self, task: Task, policy: GradientPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[GradientPolicy, PlanInfo]:
    with jax.default_matmul_precision("highest"):
      return self._optimize(task, policy, data, rng, params)

  def _optimize(self, task: Task, policy: GradientPolicy, data: Data,
                rng: jax.Array, params: Optional[TaskParams] = None
                ) -> Tuple[GradientPolicy, PlanInfo]:
    del rng  # deterministic planner
    cfg = self.config
    m = task.model
    tp = params if params is not None else task.params
    k = cfg.spline_points
    dt = m.opt.timestep

    horizon_time = (cfg.horizon - 1) * dt
    denom = k if cfg.interp == spline.Interp.ZERO else k - 1
    new_times = data.time + jnp.arange(k, dtype=policy.times.dtype) * (
        horizon_time / jnp.maximum(denom, 1))
    nominal = spline.resample(policy.times, policy.values, new_times,
                              cfg.interp)

    total = self._return_fn(task, data, new_times, tp)
    nominal_return, grad = jax.value_and_grad(total)(nominal)
    # normalize the step by gradient scale (reference line search is over
    # absolute improvement scale)
    gnorm = jnp.maximum(jnp.linalg.norm(grad), 1e-10)
    direction = grad / gnorm

    steps = jnp.exp(jnp.linspace(jnp.log(cfg.min_step),
                                 jnp.log(cfg.max_step),
                                 cfg.num_steps)).astype(nominal.dtype)
    cands = nominal[None] - steps[:, None, None] * direction[None]
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    cands = jnp.where(m.actuator_ctrllimited, jnp.clip(cands, lo, hi), cands)

    returns = jax.vmap(total)(cands)
    returns = jnp.nan_to_num(returns, nan=MAX_RETURN, posinf=MAX_RETURN)
    all_returns = jnp.concatenate([nominal_return[None], returns])
    all_cands = jnp.concatenate([nominal[None], cands])
    winner = jnp.argmin(all_returns)
    new_policy = policy.replace(times=new_times, values=all_cands[winner])
    info = PlanInfo(costs=all_returns, winner=winner,
                    best_return=all_returns[winner])
    return new_policy, info
