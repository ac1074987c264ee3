"""Cartpole balance + recenter demo (the reference's own cartpole task:
task.xml home is cart x=1 / pole up, solved by the gradient planner —
reference mjpc/tasks/cartpole/task.xml:10,48).

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
agent.reset(keyframe="home")  # cart at x=1, pole up (reference home)
print(f"initial cost: {agent.total_cost():.2f}")
for i in range(300):
  if i % 2 == 0:
    agent.planner_step()
  agent.step()
st = agent.get_state()
ang = float(st["qpos"][1]) % (2 * math.pi)
print(f"final cost: {agent.total_cost():.3f}; "
      f"cart {float(st['qpos'][0]):.3f}; "
      f"pole {min(ang, 2*math.pi-ang):.3f} rad from upright")
