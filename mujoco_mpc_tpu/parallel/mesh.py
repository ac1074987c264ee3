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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_mpc_tpu.ops import rollout as rollout_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.planners.base import PlanInfo
from mujoco_mpc_tpu.planners.cross_entropy import (CEMConfig, CEMPolicy,
                                                   CrossEntropyPlanner)
from mujoco_mpc_tpu.planners.robust import RobustConfig, RobustPlanner
from mujoco_mpc_tpu.planners.sampling import (SamplingConfig, SamplingPlanner,
                                              SamplingPolicy)
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


def _sharded_returns(planner, mesh, task, cfg, data, new_times, cands,
                     params):
  """Candidate returns (N,) with the candidate axis sharded over `mesh`.

  Candidates arrive from the SAME jit-level generation code as the
  unsharded planner (identical RNG stream — GSPMD shards the generation
  work), so only the rollout evaluation runs inside shard_map. Keeping the
  shard_map region down to the rollout kernel matters for latency: a
  planner iteration is a ~3 ms call, and wrapping the cheap noise/spline
  ops in shard_map measurably inflated it (~25%) versus letting GSPMD
  partition them.
  """
  m = task.model
  n = cands.shape[0]
  per_dev = n // mesh.devices.size
  cands = jax.lax.with_sharding_constraint(
      cands, NamedSharding(mesh, P(AXIS)))
  mega, use_pallas = _shard_mega(planner, per_dev)
  p = params if params is not None else task.params

  if mega is not None:
    # fast path: whole-rollout megakernel per shard (Pallas on TPU,
    # tile-XLA elsewhere). Actions are spline-sampled at jit level; the
    # replicated start state is pcast to axis-varying inside the region.
    ts = data.time + jnp.arange(
        cfg.horizon, dtype=cands.dtype) * m.opt.timestep
    actions = jax.vmap(
        lambda v: spline.sample_many(new_times, v, ts, cfg.interp))(cands)

    def shard_kernel(acts):
      qp, qv, mp, mq, ud, t0, pv = _vary(
          (data.qpos, data.qvel, data.mocap_pos, data.mocap_quat,
           data.userdata, data.time, p))
      if use_pallas:
        # pallas_call cannot infer output vma inside a VMA-checked
        # shard_map — declare the returns axis-varying explicitly
        return mega.returns(qp, qv, acts, pv, t0, mocap_pos=mp,
                            mocap_quat=mq, userdata=ud, vma=(AXIS,))
      return mega.returns_xla(qp, qv, acts, pv, t0, mocap_pos=mp,
                              mocap_quat=mq, userdata=ud)

    fn = jax.shard_map(shard_kernel, mesh=mesh, in_specs=(P(AXIS),),
                       out_specs=P(AXIS))
    return fn(actions)

  # general path: per-shard vmap of the scan rollout. The scan carry must
  # be marked varying on the candidate axis (each shard evolves its own
  # copies of the replicated start state).
  def shard_roll(cands_shard):
    data_v = _vary(data)

    def ret(values):
      pf = lambda t, d: spline.sample(new_times, values, t, cfg.interp)
      return rollout_mod.rollout_return(task, data_v, pf, cfg.horizon,
                                        params)

    return jax.vmap(ret)(cands_shard)

  fn = jax.shard_map(shard_roll, mesh=mesh, in_specs=(P(AXIS),),
                     out_specs=P(AXIS))
  return fn(cands)


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

  def _returns(self, task: Task, data: Data, new_times: jax.Array,
               cands: jax.Array,
               params: Optional[TaskParams]) -> jax.Array:
    """Candidate returns with the candidate axis sharded over the mesh.

    Candidate generation (inherited `_gen_candidates`) runs at jit level —
    GSPMD shards it; the winner argmin in the inherited `optimize` becomes
    an ICI reduction. Only the rollout evaluation is an explicit
    shard_map, so the single-chip megakernel perf story composes with
    scale-out unchanged."""
    return _sharded_returns(self, self.mesh, task, self.config, data,
                            new_times, cands, params)


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

  def _returns(self, task: Task, data: Data, new_times: jax.Array,
               cands: jax.Array,
               params: Optional[TaskParams]) -> jax.Array:
    """Sharded candidate returns; elite top-k + mean/var refit stay in the
    inherited `optimize` at jit level, where GSPMD inserts the needed
    collectives over the sharded returns."""
    return _sharded_returns(self, self.mesh, task, self.config, data,
                            new_times, cands, params)


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
