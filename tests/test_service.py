"""In-process gRPC service test (reference grpc/agent_service_test.cc) and
full client↔server subprocess test (reference python agent_test.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def client():
  from mujoco_mpc_tpu.service.client import AgentClient
  c = AgentClient("Particle", planner="sampling")
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


def test_planning_improves_over_rpc(client):
  client.reset()
  client.set_state(qpos=[0.25, 0.0])
  c0 = client.get_total_cost()
  for _ in range(40):
    client.planner_step()
    client.step()
  assert client.get_total_cost() < c0
