"""Cartpole swing-up demo (reference: python demos; run anywhere).

Usage: python examples/cartpole_swingup.py [--platform cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import math

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="")
args = parser.parse_args()
if args.platform:
  import jax
  jax.config.update("jax_platforms", args.platform)

from mujoco_mpc_tpu.agent.agent import Agent  # noqa: E402

agent = Agent("Cartpole")
agent.reset(keyframe="home")  # pole hanging down
print(f"initial cost: {agent.total_cost():.2f}")
for i in range(300):
  if i % 2 == 0:
    agent.planner_step()
  agent.step()
ang = float(agent.get_state()["qpos"][1]) % (2 * math.pi)
print(f"final cost: {agent.total_cost():.3f}; "
      f"pole {min(ang, 2*math.pi-ang):.3f} rad from upright")
