"""Predictive Sampling: the zero-order random-search planner.

Reference algorithm (mjpc/planners/sampling/planner.cc:155-393): N noisy
copies of the nominal spline policy (index 0 = noise-free nominal), rollouts
of each, keep the argmin. TPU design: the candidate axis is a vmap (or a
sharded mesh axis) instead of a ThreadPool; noise is drawn with counter-based
PRNG inside jit; spline resampling to the current time replaces the
ring-buffer DiscardBefore/AddNode bookkeeping.

Noise model matches the reference (AddNoiseToPolicy, planner.cc:326-352):
per-actuator std = exploration · ½·ctrlrange, with a two-component mixture —
20% of samples use a second exploration std when configured
(planner.cc:335-338) — and clamping to ctrlrange.
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

_STD2_PROPORTION = 0.2  # reference kStd2Proportion


@struct.dataclass
class SamplingPolicy:
  """Spline control policy: (times, values) node arrays."""
  times: jax.Array  # (k,)
  values: jax.Array  # (k, nu)
  exploration: jax.Array  # () noise std (GUI-tunable → traced)
  exploration2: jax.Array  # () second mixture std (0 = disabled)


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
  num_trajectories: int = 128
  spline_points: int = 10
  horizon: int = 100  # steps
  interp: spline.Interp = spline.Interp.ZERO

  @classmethod
  def from_task(cls, task: Task, horizon_steps: Optional[int] = None):
    m = task.model
    dt = float(m.custom("agent_timestep", float(m.opt.timestep)))
    hor = horizon_steps or int(
        round(float(m.custom("agent_horizon", 1.0)) / dt))
    return cls(
        num_trajectories=int(m.custom("sampling_trajectories", 128)),
        spline_points=int(m.custom("sampling_spline_points", 10)),
        horizon=hor,
        interp=spline.Interp(int(m.custom("sampling_representation", 0))),
    )


class SamplingPlanner:
  """Functional predictive-sampling planner."""

  def __init__(self, config: SamplingConfig, use_megakernel: bool = True):
    self.config = config
    self.use_megakernel = use_megakernel
    self._mega = None

  def init(self, task: Task) -> SamplingPolicy:
    # attempt the whole-rollout Pallas megakernel for this concrete task
    # (ops/megarollout.py); requires concrete model constants → built here,
    # outside jit. Falls back to the general vmap path when unsupported.
    if (self.use_megakernel and self._mega is None and
        self.config.num_trajectories % 128 == 0 and
        jax.default_backend() == "tpu"):  # Mosaic lowering is TPU-only
      from mujoco_mpc_tpu.ops import megarollout
      # try_build returns None for unsupported models AND when `task`
      # holds tracers (init called under jit — constants unavailable)
      self._mega = megarollout.try_build(task, self.config.horizon)
    m = task.model
    k = self.config.spline_points
    dt = m.opt.timestep
    horizon_time = self.config.horizon * dt
    times = jnp.linspace(0.0, horizon_time, k).astype(m.qpos0.dtype)
    mid = task.default_ctrl()
    values = jnp.tile(mid, (k, 1))
    expl = jnp.asarray(
        float(m.custom("sampling_exploration", 0.1)), dtype=m.qpos0.dtype)
    return SamplingPolicy(times=times, values=values, exploration=expl,
                          exploration2=jnp.zeros_like(expl))

  # ---------------------------------------------------------------- action
  def action(self, task: Task, policy: SamplingPolicy,
             data: Data) -> jax.Array:
    u = spline.sample(policy.times, policy.values, data.time,
                      self.config.interp)
    lo = task.model.actuator_ctrlrange[:, 0]
    hi = task.model.actuator_ctrlrange[:, 1]
    return jnp.where(task.model.actuator_ctrllimited,
                     jnp.clip(u, lo, hi), u)

  # -------------------------------------------------------------- optimize
  def _gen_candidates(self, task: Task, policy: SamplingPolicy, data: Data,
                      rng: jax.Array) -> Tuple[jax.Array, jax.Array,
                                               jax.Array]:
    """(new_times, nominal, candidate values (N,k,nu)).

    Nominal resample + two-component spline-node noise + clamping
    (reference UpdateNominalPolicy planner.cc:240-323, AddNoiseToPolicy
    planner.cc:326-352). Shared verbatim by the mesh-sharded planner, so
    sharded and unsharded runs draw identical candidate sets."""
    cfg = self.config
    m = task.model
    k = cfg.spline_points
    n = cfg.num_trajectories
    dt = m.opt.timestep

    # 1. resample nominal onto a fresh grid anchored at the current time
    horizon_time = (cfg.horizon - 1) * dt
    denom = k if cfg.interp == spline.Interp.ZERO else k - 1
    new_times = data.time + jnp.arange(k, dtype=policy.times.dtype) * (
        horizon_time / jnp.maximum(denom, 1))
    nominal = spline.resample(policy.times, policy.values, new_times,
                              cfg.interp)

    # 2. two-component Gaussian noise on spline nodes, scaled by ctrlrange
    rng_n, rng_b = jax.random.split(rng)
    scale = 0.5 * (m.actuator_ctrlrange[:, 1] - m.actuator_ctrlrange[:, 0])
    scale = jnp.where(m.actuator_ctrllimited, scale, 1.0)
    use2 = jnp.logical_and(
        policy.exploration2 > 0,
        jax.random.bernoulli(rng_b, _STD2_PROPORTION, (n - 1,)))
    stds = jnp.where(use2, policy.exploration2, policy.exploration)
    noise = (jax.random.normal(rng_n, (n - 1, k, m.nu),
                               dtype=nominal.dtype) *
             stds[:, None, None] * scale[None, None, :])
    cands = jnp.concatenate([nominal[None], nominal[None] + noise])
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    cands = jnp.where(m.actuator_ctrllimited,
                      jnp.clip(cands, lo, hi), cands)
    return new_times, nominal, cands

  def _returns(self, task: Task, data: Data, new_times: jax.Array,
               cands: jax.Array,
               params: Optional[TaskParams]) -> jax.Array:
    """Candidate returns (N,): whole-rollout Pallas megakernel when the
    model qualifies (ops/megarollout.py), general vmap rollout otherwise
    (the reference's ThreadPool fan-out, planner.cc:355-393). Overridden
    by the mesh-sharded planners with a shard_map evaluation."""
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
      policy_fn = lambda t, d: spline.sample(new_times, values, t,
                                             cfg.interp)
      return rollout_mod.rollout_return(task, data, policy_fn,
                                        cfg.horizon, params)

    return jax.vmap(ret)(cands)

  def candidates(self, task: Task, policy: SamplingPolicy, data: Data,
                 rng: jax.Array,
                 params: Optional[TaskParams] = None
                 ) -> Tuple[SamplingPolicy, jax.Array, jax.Array]:
    """Nominal resample + noisy candidates + their returns.

    Returns (resampled nominal policy, candidate values (N,k,nu),
    returns (N,)). Exposed separately so Robust/iLQS can re-rank
    candidates (reference RankedPlanner, planner.h:84-102).
    """
    new_times, nominal, cands = self._gen_candidates(task, policy, data, rng)
    returns = self._returns(task, data, new_times, cands, params)
    resampled = policy.replace(times=new_times, values=nominal)
    return resampled, cands, returns

  def optimize(self, task: Task, policy: SamplingPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[SamplingPolicy, PlanInfo]:
    resampled, cands, returns = self.candidates(task, policy, data, rng,
                                                params)
    winner = jnp.argmin(returns)
    new_policy = resampled.replace(values=cands[winner])
    info = PlanInfo(costs=returns, winner=winner,
                    best_return=returns[winner])
    return new_policy, info
