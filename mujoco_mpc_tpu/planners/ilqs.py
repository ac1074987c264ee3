"""iLQS: hybrid sampling + iLQG planner.

Reference (mjpc/planners/ilqs/planner.cc:87): run Predictive Sampling and
iLQG, keep whichever wins; spline ⇄ direct-action conversions let each
planner seed the other (ilqs/planner.h:42-48 mappings). Here the
conversion is simply sampling the winning spline at the step times (and
fitting the spline to the winning action sequence in the other direction).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.planners.base import PlanInfo
from mujoco_mpc_tpu.planners.ilqg import ILQGConfig, ILQGPlanner, ILQGPolicy
from mujoco_mpc_tpu.planners.sampling import (SamplingConfig, SamplingPlanner,
                                              SamplingPolicy)
from mujoco_mpc_tpu.physics.types import Data
from mujoco_mpc_tpu.tasks.base import Task, TaskParams


@struct.dataclass
class ILQSPolicy:
  sampling: SamplingPolicy
  ilqg: ILQGPolicy
  use_ilqg: jax.Array  # () bool: current winner


@dataclasses.dataclass(frozen=True)
class ILQSConfig:
  sampling: SamplingConfig = dataclasses.field(
      default_factory=SamplingConfig)
  ilqg: ILQGConfig = dataclasses.field(default_factory=ILQGConfig)

  @classmethod
  def from_task(cls, task: Task, horizon_steps: Optional[int] = None):
    return cls(sampling=SamplingConfig.from_task(task, horizon_steps),
               ilqg=ILQGConfig.from_task(task, horizon_steps))


class ILQSPlanner:
  def __init__(self, config: ILQSConfig):
    self.config = config
    self.sampler = SamplingPlanner(config.sampling)
    self.ilqg = ILQGPlanner(config.ilqg)

  def init(self, task: Task) -> ILQSPolicy:
    return ILQSPolicy(sampling=self.sampler.init(task),
                      ilqg=self.ilqg.init(task),
                      use_ilqg=jnp.zeros((), dtype=bool))

  def action(self, task: Task, policy: ILQSPolicy, data: Data) -> jax.Array:
    u_s = self.sampler.action(task, policy.sampling, data)
    u_i = self.ilqg.action(task, policy.ilqg, data)
    return jnp.where(policy.use_ilqg, u_i, u_s)

  def optimize(self, task: Task, policy: ILQSPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[ILQSPolicy, PlanInfo]:
    m = task.model
    dt = m.opt.timestep
    T = self.config.ilqg.horizon

    # 1. sampling improvement
    s_policy, s_info = self.sampler.optimize(task, policy.sampling, data,
                                             rng, params)

    # 2. seed iLQG nominal with the sampled winner (spline → actions)
    ts = data.time + dt * jnp.arange(T, dtype=data.qpos.dtype)
    us_seed = spline.sample_many(s_policy.times, s_policy.values, ts,
                                 self.config.sampling.interp)
    # keep the seeded actions only if sampling currently beats iLQG
    seeded = policy.ilqg.replace(
        us=jnp.where(policy.use_ilqg, policy.ilqg.us, us_seed),
        gains=jnp.where(policy.use_ilqg, policy.ilqg.gains,
                        jnp.zeros_like(policy.ilqg.gains)),
        t0=data.time)
    i_policy, i_info = self.ilqg.optimize(task, seeded, data, rng, params)

    use_ilqg = i_info.best_return < s_info.best_return
    # 3. winner back-propagates to the spline (actions → spline nodes)
    vals_from_ilqg = spline.sample_many(
        ts, i_policy.us, s_policy.times, self.config.sampling.interp)
    s_policy = s_policy.replace(
        values=jnp.where(use_ilqg, vals_from_ilqg, s_policy.values))

    new_policy = ILQSPolicy(sampling=s_policy, ilqg=i_policy,
                            use_ilqg=use_ilqg)
    best = jnp.minimum(s_info.best_return, i_info.best_return)
    info = PlanInfo(
        costs=jnp.stack([s_info.best_return, i_info.best_return]),
        winner=use_ilqg.astype(jnp.int32), best_return=best)
    return new_policy, info
