"""Estimator recovery tests on synthetic rollouts.

Mirrors the reference strategy (SURVEY §4: test/simulation.h generates
measurements, kalman_test.cc / unscented_test.cc check update math): roll
the true system, corrupt sensors with noise, start the filter from a wrong
state, and require convergence to the truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu import physics
from mujoco_mpc_tpu.estimators import base as est_base
from mujoco_mpc_tpu.estimators.ground_truth import GroundTruth
from mujoco_mpc_tpu.estimators.kalman import Kalman
from mujoco_mpc_tpu.estimators.unscented import Unscented
from tests import models as tm


def _simulate(m, steps, seed=0, ctrl_scale=0.3):
  """True trajectory + noisy measurements."""
  rng = np.random.RandomState(seed)
  d = physics.make_data(m)
  d = d.replace(qpos=d.qpos + 0.1)  # offset start
  step = jax.jit(physics.step)
  fwd = jax.jit(physics.forward)
  ctrls, sensors, qs, vs = [], [], [], []
  for t in range(steps):
    u = jnp.asarray(ctrl_scale * np.sin(0.05 * t) * np.ones(m.nu),
                    dtype=d.qpos.dtype)
    d = d.replace(ctrl=u)
    d = step(m, d)
    df = fwd(m, d)
    noisy = np.asarray(df.sensordata) + rng.normal(
        0, 0.001, m.nsensordata)
    ctrls.append(u)
    sensors.append(jnp.asarray(noisy, dtype=d.qpos.dtype))
    qs.append(np.asarray(d.qpos))
    vs.append(np.asarray(d.qvel))
  return ctrls, sensors, np.asarray(qs), np.asarray(vs)


@pytest.fixture(scope="module")
def pendulum():
  return physics.load_model(tm.PENDULUM, dtype=jnp.float64)


@pytest.mark.parametrize("filter_cls", [Kalman, Unscented])
def test_filter_recovers_state(pendulum, filter_cls):
  m = pendulum
  steps = 150
  ctrls, sensors, qs, vs = _simulate(m, steps)

  filt = filter_cls(m)
  d0 = physics.make_data(m)
  # wrong initial state
  d0 = d0.replace(qpos=d0.qpos + 0.4, qvel=d0.qvel - 0.3)
  state = filt.init(d0, p0=0.25, q_process=1e-5, r_sensor=1e-5)
  upd = jax.jit(filt.update)

  err0 = abs(float(d0.qpos[0]) - qs[0, 0])
  for t in range(steps):
    state = upd(state, ctrls[t], sensors[t])
  qpos, qvel, _ = filt.state(state)
  err_q = abs(float(qpos[0]) - qs[-1, 0])
  err_v = abs(float(qvel[0]) - vs[-1, 0])
  assert err_q < 0.02, f"{filter_cls.__name__} qpos err {err_q} (init {err0})"
  assert err_v < 0.05, f"{filter_cls.__name__} qvel err {err_v}"


def test_ground_truth_tracks_open_loop(pendulum):
  m = pendulum
  steps = 50
  ctrls, sensors, qs, vs = _simulate(m, steps)
  gt = GroundTruth(m)
  d0 = physics.make_data(m).replace(
      qpos=physics.make_data(m).qpos + 0.1)
  s = gt.init(d0)
  upd = jax.jit(gt.update)
  for t in range(steps):
    s = upd(s, ctrls[t], sensors[t])
  qpos, qvel, _ = gt.state(s)
  np.testing.assert_allclose(qpos, qs[-1], atol=1e-9)


def test_covariance_stays_spd(pendulum):
  m = pendulum
  ctrls, sensors, _, _ = _simulate(m, 50)
  filt = Kalman(m)
  state = filt.init(physics.make_data(m))
  upd = jax.jit(filt.update)
  for t in range(50):
    state = upd(state, ctrls[t], sensors[t])
    eig = np.linalg.eigvalsh(np.asarray(state.cov))
    assert eig.min() > -1e-10, f"covariance lost SPD at t={t}: {eig.min()}"


def test_manifold_retraction_roundtrip():
  """retract/local_diff must be exact inverses on quaternion manifolds."""
  m = physics.load_model(tm.FREEBODY, dtype=jnp.float64)
  rng = np.random.RandomState(3)
  q = physics.make_data(m).qpos
  quat = rng.randn(4); quat /= np.linalg.norm(quat)
  q = q.at[3:7].set(jnp.asarray(quat))
  dq = jnp.asarray(rng.uniform(-0.3, 0.3, m.nv))
  q2 = est_base.retract(m, q, dq)
  back = est_base.local_diff(m, q2, q)
  np.testing.assert_allclose(back, dq, atol=1e-9)


def test_direct_smooths_noisy_trajectory(pendulum):
  """Direct optimizer recovers a trajectory from noisy configurations
  (reference direct_optimize_test.cc Particle2D analog)."""
  from mujoco_mpc_tpu.estimators.direct import Direct, DirectConfig

  m = pendulum
  T = 16
  ctrls, sensors, qs, vs = _simulate(m, T, ctrl_scale=0.5)
  sensors = jnp.stack(sensors)
  ctrls = jnp.stack(ctrls)
  rng = np.random.RandomState(7)
  q_noisy = jnp.asarray(qs + rng.normal(0, 0.05, qs.shape))

  direct = Direct(m, DirectConfig(horizon=T, max_iterations=8))
  res = jax.jit(direct.optimize)(q_noisy, sensors, ctrls)
  assert float(res.cost) < float(res.cost_initial) * 0.1
  # interior configurations should be much closer to the truth
  err_before = np.abs(np.asarray(q_noisy)[2:-2] - qs[2:-2]).mean()
  err_after = np.abs(np.asarray(res.qpos)[2:-2] - qs[2:-2]).mean()
  assert err_after < err_before * 0.5, (err_before, err_after)


def test_batch_filter_tracks(pendulum):
  from mujoco_mpc_tpu.estimators.batch import Batch

  m = pendulum
  steps = 40
  ctrls, sensors, qs, vs = _simulate(m, steps, ctrl_scale=0.4)
  filt = Batch(m, window=8, max_iterations=2)
  d0 = physics.make_data(m).replace(
      qpos=physics.make_data(m).qpos + 0.1)
  state = filt.init(d0)
  upd = jax.jit(filt.update)
  for t in range(steps):
    state = upd(state, ctrls[t], sensors[t])
  qpos, qvel, _ = filt.state(state)
  assert abs(float(qpos[0]) - qs[-1, 0]) < 0.05


def test_system_id_recovers_damping(pendulum):
  """Differentiable-physics system ID: recover joint damping by gradient
  descent through the rollout (reference direct/model_parameters.h — FD
  there, exact gradients here)."""
  import optax
  from mujoco_mpc_tpu.physics.step import step as phys_step

  m_true = pendulum
  steps = 60
  ctrls, sensors, qs, vs = _simulate(m_true, steps, ctrl_scale=0.6)
  qs = jnp.asarray(qs)
  ctrls = jnp.stack(ctrls)

  def rollout_qpos(damping):
    m = m_true.replace(dof_damping=damping)
    d = physics.make_data(m).replace(qpos=physics.make_data(m).qpos + 0.1)

    def body(d, u):
      d = phys_step(m, d.replace(ctrl=u))
      return d, d.qpos

    _, traj = jax.lax.scan(body, d, ctrls)
    return traj

  def loss(log_damping):
    traj = rollout_qpos(jnp.exp(log_damping))
    return jnp.mean((traj - qs) ** 2)

  # start from a wrong damping (true = 0.1)
  theta = jnp.log(jnp.asarray([0.5]))
  opt = optax.adam(0.15)
  state = opt.init(theta)
  vg = jax.jit(jax.value_and_grad(loss))
  for i in range(200):
    val, g = vg(theta)
    updates, state = opt.update(g, state, theta)
    theta = optax.apply_updates(theta, updates)
  est = float(jnp.exp(theta[0]))
  assert abs(est - 0.1) < 0.02, f"recovered damping {est}, true 0.1"


def test_plan_from_estimate():
  """Agent plans from the estimator's state when requested."""
  from mujoco_mpc_tpu.agent.agent import Agent

  agent = Agent("Cartpole")
  agent.set_state(qpos=[0.2, 0.3])
  agent.attach_estimator("kalman")
  agent.step()
  info = agent.planner_step(from_estimate=True)
  assert np.isfinite(float(info.best_return))


def test_async_estimator_keeps_steps_fused():
  """start_estimation() moves the estimator update onto its own thread
  (reference EstimatorLoop, app.cc:151-206): steps(n) keeps the fused
  single-dispatch scan AND the estimate still tracks the sim."""
  from mujoco_mpc_tpu.agent.agent import Agent

  agent = Agent("Cartpole")
  agent.set_state(qpos=[0.2, 0.3])
  agent.attach_estimator("kalman")

  # inline estimator forces the per-step fallback: no fused cache entry
  agent.steps(3)
  assert 3 not in agent._jit_steps_cache

  agent.start_estimation()
  try:
    agent.steps(5)
    assert 5 in agent._jit_steps_cache  # fused path retained
    import time
    deadline = time.time() + 10.0
    est = agent.estimated_state()
    # the estimator thread catches up to the published state
    while time.time() < deadline:
      est = agent.estimated_state()
      err = np.abs(est["qpos"] - np.asarray(agent.data.qpos)).max()
      if np.isfinite(err) and err < 0.2:
        break
      time.sleep(0.05)
    assert np.all(np.isfinite(est["qpos"]))
    err = np.abs(est["qpos"] - np.asarray(agent.data.qpos)).max()
    assert err < 0.2, f"estimate diverged from sim: {err}"
  finally:
    agent.stop_estimation()
