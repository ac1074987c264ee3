"""Sample-Gradient planner: NES-style search-gradient + line search.

Reference (mjpc/planners/sample_gradient/planner.cc:169-470): perturbation
candidates around the nominal; an approximate gradient from the sampled
returns with log-rank fitness shaping (Wierstra et al. 2014, as cited by the
reference) and exponential gradient filtering; additional candidates along
−gradient at log-spaced step sizes in [min, max]; winner ∈ {nominal,
perturbations, gradient candidates}.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import rollout as rollout_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.planners.base import PlanInfo
from mujoco_mpc_tpu.physics.types import Data
from mujoco_mpc_tpu.tasks.base import Task, TaskParams


@struct.dataclass
class SGPolicy:
  times: jax.Array  # (k,)
  values: jax.Array  # (k, nu)
  gradient: jax.Array  # (k, nu) filtered search gradient
  exploration: jax.Array  # ()


@dataclasses.dataclass(frozen=True)
class SGConfig:
  num_noisy: int = 56  # perturbation candidates (excl. nominal)
  num_gradient: int = 8  # line-search candidates along −gradient
  spline_points: int = 10
  horizon: int = 100
  interp: spline.Interp = spline.Interp.ZERO
  min_step: float = 1e-3
  max_step: float = 1.0
  gradient_filter: float = 1.0  # 1 = no momentum

  @classmethod
  def from_task(cls, task: Task, horizon_steps: Optional[int] = None):
    m = task.model
    dt = float(m.custom("agent_timestep", float(m.opt.timestep)))
    hor = horizon_steps or int(
        round(float(m.custom("agent_horizon", 1.0)) / dt))
    return cls(
        num_noisy=int(m.custom("sampling_trajectories", 64)) - 8,
        spline_points=int(m.custom("sampling_spline_points", 10)),
        horizon=hor,
    )


def _fitness_weights(n: int, dtype) -> jax.Array:
  """Log-rank utility weights (planner.cc:436-449)."""
  f0 = jnp.log(0.5 * n + 1.0)
  ranks = jnp.arange(n, dtype=dtype)
  w = jnp.maximum(0.0, f0 - jnp.log(ranks + 1.0))
  return w / jnp.sum(w) - 1.0 / n


class SampleGradientPlanner:
  def __init__(self, config: SGConfig):
    self.config = config

  def init(self, task: Task) -> SGPolicy:
    m = task.model
    k = self.config.spline_points
    horizon_time = self.config.horizon * m.opt.timestep
    times = jnp.linspace(0.0, horizon_time, k).astype(m.qpos0.dtype)
    mid = task.default_ctrl()
    expl = jnp.asarray(float(m.custom("sampling_exploration", 0.2)),
                       dtype=m.qpos0.dtype)
    return SGPolicy(times=times, values=jnp.tile(mid, (k, 1)),
                    gradient=jnp.zeros((k, m.nu), dtype=m.qpos0.dtype),
                    exploration=expl)

  def action(self, task: Task, policy: SGPolicy, data: Data) -> jax.Array:
    u = spline.sample(policy.times, policy.values, data.time,
                      self.config.interp)
    m = task.model
    return jnp.where(m.actuator_ctrllimited,
                     jnp.clip(u, m.actuator_ctrlrange[:, 0],
                              m.actuator_ctrlrange[:, 1]), u)

  def optimize(self, task: Task, policy: SGPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[SGPolicy, PlanInfo]:
    cfg = self.config
    m = task.model
    k = cfg.spline_points
    dt = m.opt.timestep
    nn, ng = cfg.num_noisy, cfg.num_gradient

    horizon_time = (cfg.horizon - 1) * dt
    denom = k if cfg.interp == spline.Interp.ZERO else k - 1
    new_times = data.time + jnp.arange(k, dtype=policy.times.dtype) * (
        horizon_time / jnp.maximum(denom, 1))
    nominal = spline.resample(policy.times, policy.values, new_times,
                              cfg.interp)
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    scale = jnp.where(m.actuator_ctrllimited, 0.5 * (hi - lo), 1.0)

    noise = (jax.random.normal(rng, (nn, k, m.nu), dtype=nominal.dtype) *
             policy.exploration * scale[None, None, :])
    noisy = nominal[None] + noise

    def clipc(c):
      return jnp.where(m.actuator_ctrllimited, jnp.clip(c, lo, hi), c)

    def ret(values):
      pf = lambda t, d: spline.sample(new_times, values, t, cfg.interp)
      return rollout_mod.rollout_return(task, data, pf, cfg.horizon, params)

    noisy_returns = jax.vmap(ret)(clipc(noisy))

    # search gradient with fitness shaping: weight by return rank
    order = jnp.argsort(noisy_returns)  # best first
    w = _fitness_weights(nn, nominal.dtype)
    grad = -jnp.einsum("i,ikl->kl", w, noise[order]) / nn
    grad = (cfg.gradient_filter * grad +
            (1.0 - cfg.gradient_filter) * policy.gradient)

    # log-spaced line search along −gradient (planner.cc LogScale)
    steps = jnp.exp(jnp.linspace(jnp.log(cfg.min_step),
                                 jnp.log(cfg.max_step), ng)
                    ).astype(nominal.dtype)
    grad_cands = clipc(nominal[None] - steps[:, None, None] * grad[None])
    grad_returns = jax.vmap(ret)(grad_cands)

    nominal_return = ret(nominal)
    all_cands = jnp.concatenate([nominal[None], clipc(noisy), grad_cands])
    all_returns = jnp.concatenate(
        [nominal_return[None], noisy_returns, grad_returns])
    winner = jnp.argmin(all_returns)
    new_policy = policy.replace(times=new_times, values=all_cands[winner],
                                gradient=grad)
    info = PlanInfo(costs=all_returns, winner=winner,
                    best_return=all_returns[winner])
    return new_policy, info
