"""Drive the agent over gRPC (reference: python/mujoco_mpc demos).

Usage: python examples/grpc_client.py [--platform cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="")
args = parser.parse_args()

from mujoco_mpc_tpu.service.client import AgentClient  # noqa: E402

with AgentClient("Particle", jax_platform=args.platform) as agent:
  agent.set_state(qpos=[0.2, -0.2])
  print("cost terms:", agent.get_cost_term_values())
  for _ in range(50):
    agent.planner_step()
    agent.step()
  print("final state:", agent.get_state()["qpos"],
        "cost:", agent.get_total_cost())
