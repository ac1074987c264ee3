"""Device-mesh scale-out: candidate rollouts sharded over ICI.

The reference's entire "distributed backend" is an intra-process ThreadPool
(SURVEY §5.8, mjpc/threadpool.h:32). The TPU-native equivalent: candidates
are a data-parallel mesh axis; each chip rolls out its shard in lockstep.
Per-candidate returns leave the shard_map still sharded (out_specs P(AXIS));
the global winner reduction (argmin / top_k / elite statistics) runs at the
jit level where GSPMD inserts the ICI collectives — O(N) scalars + the
winning (k, nu) node array cross chips, nothing else. All shard_maps are
VMA-checked (no check_vma escape hatch).

Planners:
  ShardedSamplingPlanner — predictive sampling, candidate axis sharded
  ShardedCrossEntropyPlanner — CEM; elite stats on gathered returns
  ShardedRobustPlanner — robust re-scoring; (candidate × repetition) grid
    sharded over candidates
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mujoco_mpc_tpu.ops import rollout as rollout_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.planners.base import PlanInfo
from mujoco_mpc_tpu.planners.cross_entropy import (CEMConfig, CEMPolicy,
                                                   CrossEntropyPlanner)
from mujoco_mpc_tpu.planners.robust import RobustConfig, RobustPlanner
from mujoco_mpc_tpu.planners.sampling import (SamplingConfig, SamplingPlanner,
                                              SamplingPolicy,
                                              _STD2_PROPORTION)
from mujoco_mpc_tpu.physics.types import Data
from mujoco_mpc_tpu.tasks.base import Task, TaskParams

AXIS = "candidates"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
  devs = jax.devices()
  n = n_devices or len(devs)
  return Mesh(devs[:n], (AXIS,))


def _check_divisible(n: int, mesh: Mesh, what: str):
  n_dev = mesh.devices.size
  if n % n_dev:
    raise ValueError(
        f"{what}={n} must be divisible by mesh size {n_dev}")


def _vary(data, axis=AXIS):
  """Mark a replicated capture as varying so per-shard scans may evolve it."""
  return jax.tree.map(lambda x: jax.lax.pcast(x, axis, to="varying"), data)


def _resample_nominal(cfg, m, policy, data):
  k = cfg.spline_points
  dt = m.opt.timestep
  horizon_time = (cfg.horizon - 1) * dt
  denom = k if cfg.interp == spline.Interp.ZERO else k - 1
  new_times = data.time + jnp.arange(k, dtype=policy.times.dtype) * (
      horizon_time / jnp.maximum(denom, 1))
  nominal = spline.resample(policy.times, policy.values, new_times,
                            cfg.interp)
  return new_times, nominal


def _shard_mega(planner, per_dev: int):
  """The planner's whole-rollout megakernel for per-shard evaluation.

  Built by the sharded planners' init() (outside jit). On TPU the Pallas
  kernel runs per shard inside shard_map (per-device candidate count must
  be a 128 multiple); elsewhere (CPU mesh tests / dryrun) the same tile
  math runs as plain XLA (MegaRollout.returns_xla), so multi-chip
  correctness of the *fast path* is exercised without Mosaic. (mega=None,
  ·) → general vmap rollout."""
  mega = getattr(planner, "_mega", None)
  if mega is None:
    return None, False
  use_pallas = (jax.default_backend() == "tpu" and per_dev % 128 == 0)
  return mega, use_pallas


def _mega_shard_returns(mega, use_pallas, task, cfg, data, new_times, cands,
                        params):
  """Per-shard candidate returns through the megakernel (inside shard_map).

  All operands are marked axis-varying: the replicated start state feeds a
  per-shard kernel whose outputs are varying (VMA-checked shard_map)."""
  m = task.model
  ts = data.time + jnp.arange(
      cfg.horizon, dtype=cands.dtype) * m.opt.timestep
  actions = jax.vmap(
      lambda v: spline.sample_many(new_times, v, ts, cfg.interp))(cands)
  p = params if params is not None else task.params
  qp, qv, mp, mq, ud, t0, p = _vary(
      (data.qpos, data.qvel, data.mocap_pos, data.mocap_quat,
       data.userdata, data.time, p))
  fn = mega.returns if use_pallas else mega.returns_xla
  return fn(qp, qv, actions, p, t0, mocap_pos=mp, mocap_quat=mq,
            userdata=ud)


class ShardedSamplingPlanner(SamplingPlanner):
  """Predictive sampling with the candidate axis sharded over a mesh.

  Semantics are identical to SamplingPlanner (same noise model, same
  winner); only the placement differs. num_trajectories must divide by the
  mesh size.
  """

  def __init__(self, config: SamplingConfig, mesh: Mesh,
               use_megakernel: bool = True):
    super().__init__(config, use_megakernel=use_megakernel)
    self.mesh = mesh
    _check_divisible(config.num_trajectories, mesh, "num_trajectories")

  def init(self, task: Task) -> SamplingPolicy:
    policy = super().init(task)
    if self.use_megakernel and self._mega is None:
      # build here (outside jit — concrete model constants) even off-TPU:
      # the CPU mesh runs the same tile math via returns_xla
      from mujoco_mpc_tpu.ops import megarollout
      self._mega = megarollout.try_build(task, self.config.horizon)
    return policy

  def optimize(self, task: Task, policy: SamplingPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[SamplingPolicy, PlanInfo]:
    cfg = self.config
    m = task.model
    k = cfg.spline_points
    n = cfg.num_trajectories
    n_dev = self.mesh.devices.size
    per_dev = n // n_dev

    new_times, nominal = _resample_nominal(cfg, m, policy, data)
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    scale = jnp.where(m.actuator_ctrllimited, 0.5 * (hi - lo), 1.0)
    mega, use_pallas = _shard_mega(self, per_dev)

    def shard_eval(rng_shard):
      """Runs on each device: generate + roll the local candidate shard."""
      idx = jax.lax.axis_index(AXIS)
      key = jax.random.fold_in(rng_shard[0], idx)
      kn, kb = jax.random.split(key)
      use2 = jnp.logical_and(
          policy.exploration2 > 0,
          jax.random.bernoulli(kb, _STD2_PROPORTION, (per_dev,)))
      stds = jnp.where(use2, policy.exploration2, policy.exploration)
      noise = (jax.random.normal(kn, (per_dev, k, m.nu),
                                 dtype=nominal.dtype) *
               stds[:, None, None] * scale[None, None, :])
      # device 0's first candidate is the noise-free nominal
      first = jnp.logical_and(idx == 0,
                              jax.lax.broadcasted_iota(
                                  jnp.int32, (per_dev, 1, 1), 0) == 0)
      noise = jnp.where(first, 0.0, noise)
      cands = nominal[None] + noise
      cands = jnp.where(m.actuator_ctrllimited,
                        jnp.clip(cands, lo, hi), cands)

      if mega is not None:
        # fast path: per-shard whole-rollout megakernel (Pallas on TPU,
        # tile-XLA elsewhere) — the winner reduction below stays an ICI
        # collective, so the round-2 single-chip perf story composes
        return _mega_shard_returns(mega, use_pallas, task, cfg, data,
                                   new_times, cands, params), cands

      # the scan carry must be marked varying on the candidate axis
      # (each shard evolves its own copies of the replicated start state)
      data_v = _vary(data)

      def ret(values):
        pf = lambda t, d: spline.sample(new_times, values, t, cfg.interp)
        return rollout_mod.rollout_return(task, data_v, pf, cfg.horizon,
                                          params)

      return jax.vmap(ret)(cands), cands

    # outputs stay sharded (P(AXIS)); the argmin below is a GSPMD-inserted
    # ICI reduction — no manual all_gather, VMA fully checked
    fn = jax.shard_map(
        shard_eval, mesh=self.mesh, in_specs=(P(AXIS),),
        out_specs=(P(AXIS), P(AXIS)))
    rng_per_dev = jnp.tile(rng[None], (n_dev, 1))
    returns, cands = fn(rng_per_dev)
    winner = jnp.argmin(returns)
    new_policy = policy.replace(times=new_times, values=cands[winner])
    info = PlanInfo(costs=returns, winner=winner,
                    best_return=returns[winner])
    return new_policy, info


class ShardedCrossEntropyPlanner(CrossEntropyPlanner):
  """CEM with the candidate axis sharded over a mesh.

  Rollouts are sharded; the elite top-k + mean/variance refit runs on the
  gathered (tiny) return/candidate arrays — semantics identical to
  CrossEntropyPlanner (reference cross_entropy/planner.cc:168-260)."""

  def __init__(self, config: CEMConfig, mesh: Mesh,
               use_megakernel: bool = True):
    super().__init__(config, use_megakernel=use_megakernel)
    self.mesh = mesh
    _check_divisible(config.num_trajectories, mesh, "num_trajectories")

  def init(self, task: Task) -> CEMPolicy:
    policy = super().init(task)
    if self.use_megakernel and self._mega is None:
      from mujoco_mpc_tpu.ops import megarollout
      self._mega = megarollout.try_build(task, self.config.horizon)
    return policy

  def optimize(self, task: Task, policy: CEMPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[CEMPolicy, PlanInfo]:
    cfg = self.config
    m = task.model
    k, n = cfg.spline_points, cfg.num_trajectories
    n_dev = self.mesh.devices.size
    per_dev = n // n_dev

    new_times, nominal = _resample_nominal(cfg, m, policy, data)
    std_rs = spline.resample(policy.times, policy.std, new_times, cfg.interp)
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    mega, use_pallas = _shard_mega(self, per_dev)

    def shard_eval(rng_shard):
      idx = jax.lax.axis_index(AXIS)
      key = jax.random.fold_in(rng_shard[0], idx)
      noise = jax.random.normal(key, (per_dev, k, m.nu),
                                dtype=nominal.dtype) * std_rs[None]
      # device 0's first candidate is the noise-free nominal
      first = jnp.logical_and(idx == 0,
                              jax.lax.broadcasted_iota(
                                  jnp.int32, (per_dev, 1, 1), 0) == 0)
      noise = jnp.where(first, 0.0, noise)
      cands = nominal[None] + noise
      cands = jnp.where(m.actuator_ctrllimited,
                        jnp.clip(cands, lo, hi), cands)

      if mega is not None:
        return _mega_shard_returns(mega, use_pallas, task, cfg, data,
                                   new_times, cands, params), cands

      data_v = _vary(data)

      def ret(values):
        pf = lambda t, d: spline.sample(new_times, values, t, cfg.interp)
        return rollout_mod.rollout_return(task, data_v, pf, cfg.horizon,
                                          params)

      return jax.vmap(ret)(cands), cands

    fn = jax.shard_map(
        shard_eval, mesh=self.mesh, in_specs=(P(AXIS),),
        out_specs=(P(AXIS), P(AXIS)))
    rng_per_dev = jnp.tile(rng[None], (n_dev, 1))
    returns, cands = fn(rng_per_dev)

    # elite statistics on the (gathered) candidate set — GSPMD turns the
    # top_k + gathers into the needed collectives
    _, elite_idx = jax.lax.top_k(-returns, cfg.n_elite)
    elites = cands[elite_idx]
    mean = jnp.mean(elites, axis=0)
    var = jnp.sum((elites - mean[None]) ** 2, axis=0) / jnp.maximum(
        cfg.n_elite - 1, 1)
    std = jnp.maximum(jnp.sqrt(var), cfg.std_min)

    new_policy = policy.replace(times=new_times, values=mean, std=std)
    winner = elite_idx[0]
    info = PlanInfo(costs=returns, winner=winner,
                    best_return=returns[winner])
    return new_policy, info


class ShardedRobustPlanner(RobustPlanner):
  """Robust re-scoring with the candidate axis of the (candidate ×
  repetition) grid sharded over a mesh (reference
  robust/robust_planner.cc:91). The delegate's candidate generation runs
  replicated; the ncandidates × nrepetitions noisy re-evaluations — the
  expensive part — are sharded."""

  def __init__(self, delegate: SamplingPlanner, config: RobustConfig,
               mesh: Mesh):
    super().__init__(delegate, config)
    self.mesh = mesh
    _check_divisible(config.ncandidates, mesh, "ncandidates")

  def optimize(self, task: Task, policy, data: Data, rng: jax.Array,
               params: Optional[TaskParams] = None
               ) -> Tuple[SamplingPolicy, PlanInfo]:
    cfg = self.config
    dcfg = self.delegate.config
    n_dev = self.mesh.devices.size
    per_dev = cfg.ncandidates // n_dev
    rng_c, rng_n = jax.random.split(rng)
    resampled, cands, returns = self.delegate.candidates(
        task, policy, data, rng_c, params)

    _, top_idx = jax.lax.top_k(-returns, cfg.ncandidates)
    top = cands[top_idx]  # (ncand, k, nu)

    def shard_score(rng_shard, top_shard):
      idx = jax.lax.axis_index(AXIS)
      key = jax.random.fold_in(rng_shard[0], idx)
      keys = jax.random.split(key, per_dev * cfg.nrepetitions)
      keys = keys.reshape(per_dev, cfg.nrepetitions, 2)
      data_v = _vary(data)

      def score_one(values, k2):
        pf = lambda t, d: spline.sample(resampled.times, values, t,
                                        dcfg.interp)
        return rollout_mod.noisy_rollout(
            task, data_v, pf, dcfg.horizon, k2,
            xfrc_std=cfg.xfrc_std, xfrc_rate=cfg.xfrc_rate, params=params)

      return jax.vmap(
          lambda v, ks: jnp.mean(jax.vmap(lambda kk: score_one(v, kk))(ks))
      )(top_shard, keys)

    fn = jax.shard_map(
        shard_score, mesh=self.mesh, in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS))
    rng_per_dev = jnp.tile(rng_n[None], (n_dev, 1))
    scores = fn(rng_per_dev, top)

    best = jnp.argmin(scores)
    new_policy = resampled.replace(values=top[best])
    info = PlanInfo(costs=scores, winner=top_idx[best],
                    best_return=scores[best])
    return new_policy, info
