"""Cross-Entropy Method planner.

Reference (mjpc/planners/cross_entropy/planner.cc:168-260): same sampling
machinery as predictive sampling, but the nominal is refit to the **mean of
the n_elite best** candidates, and the per-parameter sampling variance is
re-estimated from the elites (with a std_min floor). TPU design: top-k via
lax.top_k, elite statistics as masked reductions — no sorting networks, no
host round-trips.
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
class CEMPolicy:
  times: jax.Array  # (k,)
  values: jax.Array  # (k, nu)
  std: jax.Array  # (k, nu) per-parameter sampling std (adaptive)


@dataclasses.dataclass(frozen=True)
class CEMConfig:
  num_trajectories: int = 128
  n_elite: int = 12  # reference default max(N/10, 2)
  spline_points: int = 10
  horizon: int = 100
  interp: spline.Interp = spline.Interp.ZERO
  std_min: float = 0.1
  std_initial: float = 0.3

  @classmethod
  def from_task(cls, task: Task, horizon_steps: Optional[int] = None):
    m = task.model
    dt = float(m.custom("agent_timestep", float(m.opt.timestep)))
    hor = horizon_steps or int(
        round(float(m.custom("agent_horizon", 1.0)) / dt))
    n = int(m.custom("sampling_trajectories", 128))
    return cls(
        num_trajectories=n,
        n_elite=int(m.custom("n_elite", max(n // 10, 2))),
        spline_points=int(m.custom("sampling_spline_points", 10)),
        horizon=hor,
        std_initial=float(m.custom("sampling_exploration", 0.3)),
        std_min=float(m.custom("std_min", 0.1)),
    )


class CrossEntropyPlanner:
  def __init__(self, config: CEMConfig, use_megakernel: bool = True):
    self.config = config
    self.use_megakernel = use_megakernel
    self._mega = None

  def init(self, task: Task) -> CEMPolicy:
    # whole-rollout Pallas megakernel fast path (ops/megarollout.py) —
    # same machinery as SamplingPlanner.init
    if (self.use_megakernel and self._mega is None and
        self.config.num_trajectories % 128 == 0 and
        jax.default_backend() == "tpu"):
      from mujoco_mpc_tpu.ops import megarollout
      self._mega = megarollout.try_build(task, self.config.horizon)
    m = task.model
    k = self.config.spline_points
    horizon_time = self.config.horizon * m.opt.timestep
    times = jnp.linspace(0.0, horizon_time, k).astype(m.qpos0.dtype)
    mid = task.default_ctrl()
    scale = jnp.where(
        m.actuator_ctrllimited,
        0.5 * (m.actuator_ctrlrange[:, 1] - m.actuator_ctrlrange[:, 0]), 1.0)
    std = jnp.tile(self.config.std_initial * scale, (k, 1))
    return CEMPolicy(times=times, values=jnp.tile(mid, (k, 1)), std=std)

  def action(self, task: Task, policy: CEMPolicy, data: Data) -> jax.Array:
    u = spline.sample(policy.times, policy.values, data.time,
                      self.config.interp)
    m = task.model
    return jnp.where(m.actuator_ctrllimited,
                     jnp.clip(u, m.actuator_ctrlrange[:, 0],
                              m.actuator_ctrlrange[:, 1]), u)

  def _gen_candidates(self, task: Task, policy: CEMPolicy, data: Data,
                      rng: jax.Array) -> Tuple[jax.Array, jax.Array,
                                               jax.Array]:
    """(new_times, nominal, candidate values (N,k,nu)) — shared verbatim
    by the mesh-sharded CEM so sharded/unsharded draw identical sets."""
    cfg = self.config
    m = task.model
    k, n = cfg.spline_points, cfg.num_trajectories
    dt = m.opt.timestep

    horizon_time = (cfg.horizon - 1) * dt
    denom = k if cfg.interp == spline.Interp.ZERO else k - 1
    new_times = data.time + jnp.arange(k, dtype=policy.times.dtype) * (
        horizon_time / jnp.maximum(denom, 1))
    nominal = spline.resample(policy.times, policy.values, new_times,
                              cfg.interp)
    std_rs = spline.resample(policy.times, policy.std, new_times, cfg.interp)

    noise = jax.random.normal(rng, (n - 1, k, m.nu),
                              dtype=nominal.dtype) * std_rs[None]
    cands = jnp.concatenate([nominal[None], nominal[None] + noise])
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    cands = jnp.where(m.actuator_ctrllimited, jnp.clip(cands, lo, hi), cands)
    return new_times, nominal, cands

  def _returns(self, task: Task, data: Data, new_times: jax.Array,
               cands: jax.Array,
               params: Optional[TaskParams]) -> jax.Array:
    """Candidate returns (N,); overridden by the sharded CEM."""
    cfg = self.config
    m = task.model
    n = cands.shape[0]
    if self._mega is not None and data.qpos.ndim == 1 and n % 128 == 0:
      ts = data.time + jnp.arange(
          cfg.horizon, dtype=cands.dtype) * m.opt.timestep
      actions = jax.vmap(
          lambda v: spline.sample_many(new_times, v, ts, cfg.interp))(cands)
      return self._mega.returns(
          data.qpos, data.qvel, actions,
          params if params is not None else task.params, data.time,
          mocap_pos=data.mocap_pos, mocap_quat=data.mocap_quat,
          userdata=data.userdata)

    def ret(values):
      pf = lambda t, d: spline.sample(new_times, values, t, cfg.interp)
      return rollout_mod.rollout_return(task, data, pf, cfg.horizon,
                                        params)

    return jax.vmap(ret)(cands)

  def optimize(self, task: Task, policy: CEMPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[CEMPolicy, PlanInfo]:
    cfg = self.config
    new_times, nominal, cands = self._gen_candidates(task, policy, data, rng)
    returns = self._returns(task, data, new_times, cands, params)

    # elite statistics (planner.cc:224-270)
    neg_top, elite_idx = jax.lax.top_k(-returns, cfg.n_elite)
    elites = cands[elite_idx]  # (n_elite, k, nu)
    mean = jnp.mean(elites, axis=0)
    var = jnp.sum((elites - mean[None]) ** 2, axis=0) / jnp.maximum(
        cfg.n_elite - 1, 1)
    std = jnp.maximum(jnp.sqrt(var), cfg.std_min)

    new_policy = policy.replace(times=new_times, values=mean, std=std)
    winner = elite_idx[0]
    info = PlanInfo(costs=returns, winner=winner,
                    best_return=returns[winner])
    return new_policy, info
