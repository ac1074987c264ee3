"""Tests: checkpoint/resume, embedding interface, testspeed harness,
profiling."""

import tempfile

import numpy as np


def test_checkpoint_roundtrip():
  from mujoco_mpc_tpu.agent.agent import Agent
  from mujoco_mpc_tpu.utils import checkpoint

  agent = Agent("Particle")
  agent.set_state(qpos=[0.17, -0.08])
  agent.planner_step()
  with tempfile.TemporaryDirectory() as td:
    path = checkpoint.save(td + "/ckpt", agent)
    agent2 = Agent("Particle")
    checkpoint.restore(path, agent2)
    np.testing.assert_allclose(agent2.get_state()["qpos"], [0.17, -0.08],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(agent2.policy.values),
                               np.asarray(agent.policy.values), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(agent2.task.params.weights),
        np.asarray(agent.task.params.weights))


def test_checkpoint_rejects_mismatched_template():
  import pytest
  from mujoco_mpc_tpu.agent.agent import Agent
  from mujoco_mpc_tpu.utils import checkpoint

  agent = Agent("Particle")
  with tempfile.TemporaryDirectory() as td:
    path = checkpoint.save(td + "/ckpt", agent)
    other = Agent("Cartpole", planner="ilqg")
    with pytest.raises(ValueError, match="leaves"):
      checkpoint.restore(path, other)


def test_embedding_interface():
  from mujoco_mpc_tpu.agent import interface

  handle = interface.create_policy("Particle")
  try:
    u = interface.step_policy(handle, qpos=[0.1, 0.1], qvel=[0, 0])
    assert u.shape == (2,)
    interface.set_weights(handle, {"Velocity": 0.2})
  finally:
    interface.destroy_policy(handle)


def test_testspeed_harness():
  from mujoco_mpc_tpu.tools.testspeed import synchronous_planning_cost

  out = synchronous_planning_cost("Particle", total_time=0.3, plan_every=4,
                                  keyframe=None, verbose=False)
  assert out["realtime_factor"] > 0
  assert np.isfinite(out["total_cost"])


def test_phase_timer():
  import time
  from mujoco_mpc_tpu.utils.profiling import PhaseTimer

  pt = PhaseTimer()
  with pt.phase("x"):
    time.sleep(0.01)
  rep = pt.report()
  assert rep["x"]["count"] == 1
  assert rep["x"]["mean_ms"] >= 10


def test_native_capi_smoke():
  """Build the C ABI library and drive the agent from a C++ host
  (reference interface.h embedding)."""
  import os
  import subprocess
  import sys

  here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  build = os.path.join(here, "mujoco_mpc_tpu", "native", "build.py")
  env = dict(os.environ)
  env["MJPC_JAX_PLATFORM"] = "cpu"
  env["PYTHONPATH"] = here + ":" + env.get("PYTHONPATH", "")
  out = subprocess.run([sys.executable, build, "--test"], env=env,
                       capture_output=True, text=True, timeout=400)
  assert out.returncode == 0, out.stdout + out.stderr
  assert "C ABI smoke test OK" in out.stdout


def test_agent_async_plan_loop_reduces_cost():
  """Full async plan loop with a real thread (reference
  test/agent/agent_test.cc:94-140)."""
  import time
  from mujoco_mpc_tpu.agent.agent import Agent

  agent = Agent("Particle")
  agent.set_state(qpos=[0.25, -0.25])
  c0 = agent.total_cost()
  agent.start_planning()
  try:
    for _ in range(150):
      agent.step()
      time.sleep(0.001)
  finally:
    agent.stop_planning()
  assert agent.total_cost() < c0 * 0.5


def test_agent_best_trajectory():
  from mujoco_mpc_tpu.agent.agent import Agent

  agent = Agent("Particle")
  agent.set_state(qpos=[0.2, 0.2])
  agent.planner_step()
  traj = agent.best_trajectory()
  assert traj["qpos"].shape[1] == 2
  assert np.isfinite(traj["total_return"])
  assert traj["costs"].ndim == 1
