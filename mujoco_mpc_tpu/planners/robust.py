"""Robust planner: disturbance-averaged re-ranking of candidates.

Reference (mjpc/planners/robust/robust_planner.cc:91, params
robust_planner.h:66-72): take the ncandidates best policies from a delegate
RankedPlanner, re-evaluate each with nrepetitions domain-randomized rollouts
(OU applied-force noise), and select the best average. TPU design: the
(ncandidates × nrepetitions) grid is one 2-D vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import rollout as rollout_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.planners.base import PlanInfo
from mujoco_mpc_tpu.planners.sampling import SamplingPlanner, SamplingPolicy
from mujoco_mpc_tpu.physics.types import Data
from mujoco_mpc_tpu.tasks.base import Task, TaskParams


@dataclasses.dataclass(frozen=True)
class RobustConfig:
  ncandidates: int = 12  # reference default
  nrepetitions: int = 5
  xfrc_std: float = 0.1
  xfrc_rate: float = 0.1


class RobustPlanner:
  """Decorator over a SamplingPlanner-style delegate."""

  def __init__(self, delegate: SamplingPlanner, config: RobustConfig):
    self.delegate = delegate
    self.config = config

  def init(self, task: Task) -> SamplingPolicy:
    return self.delegate.init(task)

  def action(self, task: Task, policy, data: Data) -> jax.Array:
    return self.delegate.action(task, policy, data)

  def optimize(self, task: Task, policy, data: Data, rng: jax.Array,
               params: Optional[TaskParams] = None
               ) -> Tuple[SamplingPolicy, PlanInfo]:
    cfg = self.config
    dcfg = self.delegate.config
    rng_c, rng_n = jax.random.split(rng)
    resampled, cands, returns = self.delegate.candidates(
        task, policy, data, rng_c, params)

    # top candidates from the delegate's ranking
    _, top_idx = jax.lax.top_k(-returns, cfg.ncandidates)
    top = cands[top_idx]  # (ncand, k, nu)

    # re-evaluate under OU force disturbance, averaged over repetitions
    keys = jax.random.split(rng_n, cfg.ncandidates * cfg.nrepetitions)
    keys = keys.reshape(cfg.ncandidates, cfg.nrepetitions, 2)

    def score_one(values, key):
      pf = lambda t, d: spline.sample(resampled.times, values, t,
                                      dcfg.interp)
      return rollout_mod.noisy_rollout(
          task, data, pf, dcfg.horizon, key,
          xfrc_std=cfg.xfrc_std, xfrc_rate=cfg.xfrc_rate, params=params)

    scores = jax.vmap(
        lambda v, ks: jnp.mean(jax.vmap(lambda k: score_one(v, k))(ks))
    )(top, keys)

    best = jnp.argmin(scores)
    new_policy = resampled.replace(values=top[best])
    info = PlanInfo(costs=scores, winner=top_idx[best],
                    best_return=scores[best])
    return new_policy, info
