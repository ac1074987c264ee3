"""Embedding interface: run the agent inside another program.

Reference (mjpc/interface.{h,cc}): AgentRunner + a C ABI
(create_policy/step_policy/set_weights, interface.h:43-48) for embedding
the planner without GUI/gRPC. Python-native equivalent with the same
surface; the ctypes-compatible functional wrappers allow foreign hosts to
drive it through simple arrays.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# native hosts cannot call jax.config before embedding starts; honor an
# env knob here (JAX_PLATFORMS itself is unreliable under the axon plugin)
if os.environ.get("MJPC_JAX_PLATFORM"):
  import jax

  jax.config.update("jax_platforms", os.environ["MJPC_JAX_PLATFORM"])

from mujoco_mpc_tpu.agent.agent import Agent

_RUNNERS: Dict[int, "AgentRunner"] = {}
_NEXT_ID = [1]


class AgentRunner:
  """Owns an asynchronously planning agent; callers feed states and read
  actions (reference AgentRunner semantics)."""

  def __init__(self, task: str, planner: str = "sampling"):
    self.agent = Agent(task, planner=planner)
    self.agent.start_planning()

  def step_policy(self, qpos, qvel, time: float = 0.0) -> np.ndarray:
    """Publish the latest state, return the current policy's action."""
    self.agent.set_state(qpos=qpos, qvel=qvel, time=time)
    return self.agent.action()

  def set_weights(self, weights: Dict[str, float]):
    self.agent.set_cost_weights(weights)

  def close(self):
    self.agent.stop_planning()


# --- C-ABI-style functional surface (reference interface.h:43-48) ---------

def create_policy(task: str, planner: str = "sampling") -> int:
  runner = AgentRunner(task, planner)
  handle = _NEXT_ID[0]
  _NEXT_ID[0] += 1
  _RUNNERS[handle] = runner
  return handle


def step_policy(handle: int, qpos, qvel, time: float = 0.0) -> np.ndarray:
  return _RUNNERS[handle].step_policy(qpos, qvel, time)


def set_weights(handle: int, weights: Dict[str, float]) -> None:
  _RUNNERS[handle].set_weights(weights)


def destroy_policy(handle: int) -> None:
  runner = _RUNNERS.pop(handle, None)
  if runner is not None:
    runner.close()
