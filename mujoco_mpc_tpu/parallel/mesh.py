"""Device-mesh scale-out: candidate rollouts sharded over ICI.

The reference's entire "distributed backend" is an intra-process ThreadPool
(SURVEY §5.8, mjpc/threadpool.h:32). The TPU-native equivalent: candidates
are a data-parallel mesh axis; each chip rolls out its shard in lockstep,
and a single all_gather of the (tiny) per-candidate returns + spline node
arrays picks the global winner. Nothing else crosses chips — the algorithm
is embarrassingly parallel over candidates, so collectives ride ICI and
cost O(N·k·nu) bytes per planning iteration.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mujoco_mpc_tpu.ops import rollout as rollout_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.planners.base import PlanInfo
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


class ShardedSamplingPlanner(SamplingPlanner):
  """Predictive sampling with the candidate axis sharded over a mesh.

  Semantics are identical to SamplingPlanner (same noise model, same
  winner); only the placement differs. num_trajectories must divide by the
  mesh size.
  """

  def __init__(self, config: SamplingConfig, mesh: Mesh):
    super().__init__(config)
    self.mesh = mesh
    n_dev = mesh.devices.size
    if config.num_trajectories % n_dev:
      raise ValueError(
          f"num_trajectories={config.num_trajectories} must be divisible "
          f"by mesh size {n_dev}")

  def optimize(self, task: Task, policy: SamplingPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[SamplingPolicy, PlanInfo]:
    cfg = self.config
    m = task.model
    k = cfg.spline_points
    n = cfg.num_trajectories
    n_dev = self.mesh.devices.size
    per_dev = n // n_dev
    dt = m.opt.timestep

    horizon_time = (cfg.horizon - 1) * dt
    denom = k if cfg.interp == spline.Interp.ZERO else k - 1
    new_times = data.time + jnp.arange(k, dtype=policy.times.dtype) * (
        horizon_time / jnp.maximum(denom, 1))
    nominal = spline.resample(policy.times, policy.values, new_times,
                              cfg.interp)
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    scale = jnp.where(m.actuator_ctrllimited, 0.5 * (hi - lo), 1.0)

    def shard_eval(rng_shard):
      """Runs on each device: generate + roll local candidates."""
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

      # the scan carry must be marked varying on the candidate axis
      # (each shard evolves its own copies of the replicated start state)
      data_v = jax.tree.map(
          lambda x: jax.lax.pcast(x, AXIS, to="varying"), data)

      def ret(values):
        pf = lambda t, d: spline.sample(new_times, values, t, cfg.interp)
        return rollout_mod.rollout_return(task, data_v, pf, cfg.horizon,
                                          params)

      returns = jax.vmap(ret)(cands)
      # global winner: gather the tiny (N,) returns + (N,k,nu) nodes
      all_returns = jax.lax.all_gather(returns, AXIS, tiled=True)
      all_cands = jax.lax.all_gather(cands, AXIS, tiled=True)
      return all_returns, all_cands

    # outputs are all_gathered (identical on every device) → replicated
    # out_specs; check_vma=False because the VMA system has no
    # varying→invariant cast for post-all_gather values.
    fn = jax.shard_map(
        shard_eval, mesh=self.mesh, in_specs=(P(AXIS),),
        out_specs=(P(), P()), check_vma=False)
    rng_per_dev = jnp.tile(rng[None], (n_dev, 1))
    returns, cands = fn(rng_per_dev)
    winner = jnp.argmin(returns)
    new_policy = policy.replace(times=new_times, values=cands[winner])
    info = PlanInfo(costs=returns, winner=winner,
                    best_return=returns[winner])
    return new_policy, info
