"""In-process gRPC service test (reference grpc/agent_service_test.cc) and
full client↔server subprocess test (reference python agent_test.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def client():
  from mujoco_mpc_tpu.service.client import AgentClient
  c = AgentClient("Particle", planner="sampling", jax_platform="cpu")
  yield c
  c.close()


def test_rpc_surface(client):
  client.set_state(qpos=[0.2, -0.2])
  st = client.get_state()
  np.testing.assert_allclose(st["qpos"], [0.2, -0.2], atol=1e-6)

  ret0 = client.planner_step()
  assert np.isfinite(ret0)
  u = client.get_action()
  assert u.shape == (2,)
  assert np.all(np.abs(u) <= 1.0 + 1e-6)

  st1 = client.step()
  assert st1["time"] > 0

  costs = client.get_cost_term_values()
  assert set(costs) == {"Position", "Velocity", "Control"}
  assert client.get_total_cost() > 0
  r = client.get_residuals()
  assert r.shape == (6,)

  best = client.get_best_trajectory()
  assert best["candidate_returns"].shape == (64,)

  client.set_cost_weights({"Velocity": 0.5})
  client.reset()
  st2 = client.get_state()
  np.testing.assert_allclose(st2["qpos"], [0.0, 0.0], atol=1e-6)


def test_mode_rpcs_and_set_anything(client):
  # Particle has no task modes → single "default" mode
  assert client.get_all_modes() == ["default"]
  client.set_mode("default")
  assert client.get_mode() == "default"

  # nominal action works (open-loop policy: identical semantics)
  u = client.get_action(nominal_action=True)
  assert u.shape == (2,)

  # rollout-based action averaging (reference grpc_agent_util.cc): the
  # physics is rolled over the window and restored afterwards
  st_before = client.get_state()
  u_avg = client.get_action(time=st_before["time"], averaging_duration=0.05)
  assert u_avg.shape == (2,) and np.all(np.isfinite(u_avg))
  st_after = client.get_state()
  np.testing.assert_allclose(st_after["qpos"], st_before["qpos"], atol=1e-9)
  assert st_after["time"] == st_before["time"]

  # SetAnything: state + weights + parameters in one call
  client.set_anything(qpos=[0.1, 0.1], cost_weights={"Velocity": 0.25})
  st = client.get_state()
  np.testing.assert_allclose(st["qpos"], [0.1, 0.1], atol=1e-6)
  client.reset()


def test_planning_improves_over_rpc(client):
  client.reset()
  client.set_state(qpos=[0.25, 0.0])
  c0 = client.get_total_cost()
  for _ in range(40):
    client.planner_step()
    client.step()
  assert client.get_total_cost() < c0


def test_filter_service_roundtrip():
  """In-process StateEstimation service (reference filter_service)."""
  import jax
  import jax.numpy as jnp
  from mujoco_mpc_tpu.service.filter_service import FilterClient
  from mujoco_mpc_tpu.tasks import registry
  from mujoco_mpc_tpu.physics import io as phys_io
  from mujoco_mpc_tpu.physics.step import step as phys_step, forward as fwd

  task = registry.get_task("Cartpole")
  m = task.model
  with FilterClient("Cartpole", filter="kalman") as fc:
    d = phys_io.make_data(m).replace(
        qpos=jnp.asarray([0.3, 0.2], dtype=jnp.float64))
    step = jax.jit(phys_step)
    for t in range(40):
      u = np.asarray([0.1])
      d = step(m, d.replace(ctrl=jnp.asarray(u, dtype=d.qpos.dtype)))
      z = np.asarray(jax.jit(fwd)(m, d).sensordata)
      fc.update(u, z)
    st = fc.state()
    assert abs(st["qpos"][0] - float(d.qpos[0])) < 0.05
    cov = fc.covariance()
    assert cov.shape == (4, 4)
    noise = fc.noise()
    assert noise["process"].shape == (4,)


def test_direct_service_roundtrip():
  """In-process Direct service (reference direct_service)."""
  from mujoco_mpc_tpu.service.direct_service import DirectClient

  with DirectClient("Cartpole", horizon=8) as dc:
    st = dc.status()
    assert st["horizon"] == 8 and not st["optimized"]
    rng = np.random.RandomState(0)
    for t in range(8):
      dc.data(t, qpos=[0.01 * t + rng.normal(0, 0.01), 0.0],
              sensor=[0.01 * t, 0.0, 0.01 * t, 0.0, 1.0], ctrl=[0.0])
    res = dc.optimize()
    assert res["cost_final"] <= res["cost_initial"]
    assert dc.status()["optimized"]

    # Noise + SensorInfo RPCs (reference direct.proto:29,37)
    info = dc.sensor_info()
    assert info["num_measurements"] == 5  # cartpole sensordata dim
    n0 = dc.noise()
    assert n0["process"].shape == (2,) and n0["sensor"].shape == (5,)
    c_before = dc.cost()
    n1 = dc.noise(process=[2.0, 2.0], sensor=[0.5] * 5)
    np.testing.assert_allclose(n1["process"], [2.0, 2.0])
    np.testing.assert_allclose(n1["sensor"], [0.5] * 5)
    assert dc.cost() != c_before  # weights feed the cost


def test_async_planning_over_rpc(client):
  """Server-side background planning (reference ui_agent_service)."""
  import time
  client.reset()
  client.set_state(qpos=[0.3, -0.3])
  c0 = client.get_total_cost()
  client.start_planning()
  try:
    for _ in range(60):
      client.step()
      time.sleep(0.002)
  finally:
    client.stop_planning()
  assert client.get_total_cost() < c0
