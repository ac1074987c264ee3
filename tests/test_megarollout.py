"""Megakernel rollout correctness: tile-layout physics vs the general path.

The tile-layout step (physics/tilestep.py) and the whole-rollout kernel
(ops/megarollout.py) must reproduce the general scan/vmap rollout bit-for-
algorithm (f32 reassociation tolerance). These tests run the SAME tile code
the TPU kernel traces, on CPU (plain XLA + Pallas interpret mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.ops import megarollout as MR
from mujoco_mpc_tpu.ops import rollout as R
from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics import tilestep
from mujoco_mpc_tpu.tasks import registry

HORIZON = 20


def _walker_setup(T=HORIZON, n=8):
  task = registry.get_task("Walker")
  m = task.model
  data = phys_io.make_data(m)
  qpos, _, _ = m.keyframe("home")
  data = data.replace(qpos=jnp.asarray(qpos, dtype=data.qpos.dtype))
  actions = 0.4 * jax.random.normal(
      jax.random.PRNGKey(0), (n, T, m.nu), dtype=jnp.float32)
  return task, data, actions


def _general_returns(task, data, actions, T):
  m = task.model

  def ret(acts):
    def pf(t, d):
      idx = jnp.clip(
          jnp.round((t - data.time) / m.opt.timestep).astype(jnp.int32),
          0, T - 1)
      return acts[idx]
    return R.rollout_return(task, data, pf, T)

  return jax.jit(jax.vmap(ret))(actions)


def test_tilestep_rollout_matches_general_path():
  """Contact-rich walker: tile-layout physics == scan/vmap physics."""
  task, data, actions = _walker_setup()
  mr = MR.MegaRollout(task, HORIZON)
  assert mr.tm.ncon >= 5  # dm_control walker: feet/legs vs plane + self
  ref = _general_returns(task, data, actions, HORIZON)
  got = jax.jit(mr.returns_xla)(data.qpos, data.qvel, actions,
                                task.params, data.time)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3)


def test_pallas_kernel_matches_tile_path():
  """Pallas interpret mode == the plain-XLA tile path (same trace)."""
  task, data, actions = _walker_setup(T=8, n=128)
  mr = MR.MegaRollout(task, 8, block=128, interpret=True)
  ref = jax.jit(mr.returns_xla)(data.qpos, data.qvel, actions,
                                task.params, data.time)
  got = jax.jit(mr.returns)(data.qpos, data.qvel, actions,
                            task.params, data.time)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_unsupported_models_fall_back():
  """Out-of-class models (site-transmission actuators here) → None."""
  task = registry.get_task("Quadrotor")  # free joint + SITE actuators
  assert MR.try_build(task, 8) is None
  with pytest.raises(tilestep.UnsupportedModel):
    tilestep.extract(task.model)


def _humanoid_setup(T=12, n=8):
  task = registry.get_task("Humanoid Walk")
  m = task.model
  data = phys_io.make_data(m)
  qpos, _, _ = m.keyframe("home")
  data = data.replace(qpos=jnp.asarray(qpos, dtype=data.qpos.dtype))
  actions = 0.2 * jax.random.normal(
      jax.random.PRNGKey(0), (n, T, m.nu), dtype=jnp.float32)
  return task, data, actions


def test_tilestep_free_joint_single_step_matches_general():
  """Free-joint (quaternion) humanoid: one tile step == one general step
  across randomly perturbed states (FK/cdof/CRB/RNE/contact/integration)."""
  from mujoco_mpc_tpu.physics.step import step as phys_step
  task = registry.get_task("Humanoid Walk")
  m = task.model
  tm = tilestep.extract(m)
  data = phys_io.make_data(m)
  qpos_h, _, _ = m.keyframe("home")
  rng = np.random.RandomState(1)
  B = 8
  qps = np.stack([np.asarray(qpos_h, np.float32) +
                  rng.uniform(-0.05, 0.05, m.nq).astype(np.float32)
                  for _ in range(B)])
  qvs = rng.uniform(-0.5, 0.5, (B, m.nv)).astype(np.float32)
  cts = rng.uniform(-0.5, 0.5, (B, m.nu)).astype(np.float32)

  def gen_step(qp, qv, ct):
    d2 = phys_step(m, data.replace(qpos=qp, qvel=qv, ctrl=ct))
    return d2.qpos, d2.qvel

  gq, gv = jax.jit(jax.vmap(gen_step))(qps, qvs, cts)
  stb = jax.jit(lambda q, v, c: tilestep.step_tb(tm, q, v, c)[:2])
  tq, tv = stb(jnp.asarray(qps.T), jnp.asarray(qvs.T), jnp.asarray(cts.T))
  np.testing.assert_allclose(np.asarray(gq), np.asarray(tq).T, atol=2e-5)
  np.testing.assert_allclose(np.asarray(gv), np.asarray(tv).T, atol=2e-4)


def test_quadruped_megakernel_matches_general_path():
  """Mocap goal + userdata gait FSM + weight_mod + subtree angmom all
  inside the tile rollout — matches the general path."""
  task = registry.get_task("Quadruped Flat")
  m = task.model
  data = phys_io.make_data(m)
  qpos, _, _ = m.keyframe("home")
  data = data.replace(
      qpos=jnp.asarray(qpos, dtype=data.qpos.dtype),
      mocap_pos=jnp.asarray([[1.0, 0.3, 0.3]], jnp.float32))
  u = np.zeros(m.nuserdata, np.float32)
  u[0] = 2  # trot
  u[3] = 4 * np.pi  # phase velocity
  data = data.replace(userdata=jnp.asarray(u))
  T, n = 10, 8
  actions = 0.2 * jax.random.normal(
      jax.random.PRNGKey(0), (n, T, m.nu), dtype=jnp.float32)
  mr = MR.MegaRollout(task, T)
  ref = _general_returns(task, data, actions, T)
  got = jax.jit(mr.returns_xla)(
      data.qpos, data.qvel, actions, task.params, data.time,
      mocap_pos=data.mocap_pos, mocap_quat=data.mocap_quat,
      userdata=data.userdata)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3)


def test_humanoid_megakernel_matches_general_path():
  """Contact-rich free-joint humanoid (plane-box + box-box + subtree-CoM
  residual terms): tile rollout == general rollout."""
  task, data, actions = _humanoid_setup(T=12)
  mr = MR.MegaRollout(task, 12)
  ref = _general_returns(task, data, actions, 12)
  got = jax.jit(mr.returns_xla)(data.qpos, data.qvel, actions,
                                task.params, data.time)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3)


def test_divergence_guard():
  """Exploding actions → MAX_RETURN, not nan."""
  task, data, actions = _walker_setup(T=10, n=4)
  mr = MR.MegaRollout(task, 10)
  bad = actions.at[0].set(1e30)
  got = jax.jit(mr.returns_xla)(data.qpos, data.qvel, bad,
                                task.params, data.time)
  assert bool(jnp.all(jnp.isfinite(got)))


def test_params_are_runtime_tunable():
  """Changing TaskParams (weights) changes returns without a rebuild."""
  task, data, actions = _walker_setup(T=10, n=4)
  mr = MR.MegaRollout(task, 10)
  f = jax.jit(mr.returns_xla)
  r1 = f(data.qpos, data.qvel, actions, task.params, data.time)
  heavier = task.params.replace(weights=task.params.weights * 3.0)
  r2 = f(data.qpos, data.qvel, actions, heavier, data.time)
  assert not np.allclose(np.asarray(r1), np.asarray(r2))
  np.testing.assert_allclose(np.asarray(r2), 3.0 * np.asarray(r1),
                             rtol=1e-5)


def test_sharded_megakernel_matches_unsharded():
  """The megakernel under shard_map (the multi-chip fast path,
  parallel/mesh.py::_mega_shard_returns machinery) == the unsharded tile
  path on identical candidates, on an 8-device CPU mesh (VERDICT r2 #1)."""
  from jax.sharding import Mesh, PartitionSpec as P
  from mujoco_mpc_tpu.parallel import mesh as mesh_mod

  task, data, actions = _walker_setup(T=10, n=32)
  mr = MR.MegaRollout(task, 10)
  params = task.params

  ref = jax.jit(mr.returns_xla)(
      data.qpos, data.qvel, actions, params, data.time,
      mocap_pos=data.mocap_pos, mocap_quat=data.mocap_quat,
      userdata=data.userdata)

  mesh = Mesh(np.array(jax.devices()[:8]), (mesh_mod.AXIS,))

  def shard_fn(acts):
    qp, qv, mp, mq, ud, t0, p = mesh_mod._vary(
        (data.qpos, data.qvel, data.mocap_pos, data.mocap_quat,
         data.userdata, data.time, params))
    return mr.returns_xla(qp, qv, acts, p, t0, mocap_pos=mp,
                          mocap_quat=mq, userdata=ud)

  sharded = jax.jit(jax.shard_map(
      shard_fn, mesh=mesh, in_specs=P(mesh_mod.AXIS),
      out_specs=P(mesh_mod.AXIS)))(actions)
  np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                             rtol=1e-5)


def test_sharded_sampling_planner_uses_megakernel():
  """ShardedSamplingPlanner builds + routes through the megakernel on the
  CPU mesh (the dryrun asserts the same on the driver side)."""
  from jax.sharding import Mesh
  from mujoco_mpc_tpu.parallel import mesh as mesh_mod
  from mujoco_mpc_tpu.planners import sampling

  task = registry.get_task("Walker")
  cfg = sampling.SamplingConfig(num_trajectories=16, spline_points=4,
                                horizon=10)
  mesh = Mesh(np.array(jax.devices()[:8]), (mesh_mod.AXIS,))
  planner = mesh_mod.ShardedSamplingPlanner(cfg, mesh)
  policy = planner.init(task)
  assert planner._mega is not None
  data = phys_io.make_data(task.model)
  qpos, _, _ = task.model.keyframe("home")
  data = data.replace(qpos=jnp.asarray(qpos, dtype=data.qpos.dtype))
  policy, info = jax.jit(planner.optimize)(task, policy, data,
                                           jax.random.PRNGKey(0))
  assert info.costs.shape == (16,)
  assert bool(jnp.all(jnp.isfinite(info.costs)))
