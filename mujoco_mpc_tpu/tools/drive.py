"""Headless behavior drive: plan + act a task for N steps, print metrics.

The marquee behaviors ("walker walks", "humanoid strides", "quadruped
switches gait") are regression-locked through this tool: it runs the
synchronous plan/act loop (reference testspeed-style cadence,
mjpc/testspeed.cc:44-146) and prints one JSON line with displacement and
cost metrics that tests (tests/test_behaviors_tpu.py) assert against.

Usage:
  python -m mujoco_mpc_tpu.tools.drive --task Walker --steps 600 \
      --plan_every 2 [--candidates 1024] [--platform cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time as time_mod


def main():
  p = argparse.ArgumentParser(description="mjpc_tpu behavior drive")
  p.add_argument("--task", required=True)
  p.add_argument("--planner", default="sampling")
  p.add_argument("--steps", type=int, default=600)
  p.add_argument("--plan_every", type=int, default=2)
  p.add_argument("--candidates", type=int, default=0,
                 help="override sampling_trajectories (0 = task XML value)")
  p.add_argument("--horizon", type=int, default=0)
  p.add_argument("--keyframe", default="home")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--mode", default="", help="initial task mode")
  p.add_argument("--platform", default="",
                 help="force jax platform (cpu); default = real device")
  args = p.parse_args()

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  import numpy as np

  from mujoco_mpc_tpu.agent.agent import Agent
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task(args.task)
  agent = Agent(task, planner=args.planner,
                horizon_steps=args.horizon or None, seed=args.seed)
  if args.candidates:
    cfg = dataclasses.replace(agent.planner.config,
                              num_trajectories=args.candidates)
    agent.planner = type(agent.planner)(cfg)
    agent.policy = agent.planner.init(agent.task)
    agent.previous_policy = agent.policy
    agent._jit_opt = jax.jit(agent.planner.optimize)
    agent._jit_act = jax.jit(agent.planner.action)

  try:
    agent.reset(keyframe=args.keyframe)
  except (KeyError, ValueError):
    agent.reset()
  if args.mode:
    agent.set_mode(args.mode)

  from mujoco_mpc_tpu.physics.step import forward as phys_forward
  d0 = jax.jit(phys_forward)(agent.sim_task.model, agent.data)
  # root body (index 1: world is 0) world position before/after
  start_root = np.asarray(d0.xpos[1]) if task.model.nbody > 1 else \
      np.zeros(3)
  start_qpos = np.asarray(agent.data.qpos)

  t0 = time_mod.perf_counter()
  best_returns = []
  modes_seen = set()
  for i in range(0, args.steps, args.plan_every):
    info = agent.planner_step()
    best_returns.append(float(info.best_return))
    # plan_every env steps in one fused device dispatch (Agent.steps) —
    # per-call latency over a tunneled device dominates otherwise
    agent.steps(min(args.plan_every, args.steps - i))
    modes_seen.add(agent.get_mode())
  wall = time_mod.perf_counter() - t0

  d1 = jax.jit(phys_forward)(agent.sim_task.model, agent.data)
  end_root = np.asarray(d1.xpos[1]) if task.model.nbody > 1 else np.zeros(3)
  delta = end_root - start_root
  ud = np.asarray(agent.data.userdata)
  print(json.dumps({
      "task": args.task,
      "planner": args.planner,
      "steps": args.steps,
      "sim_time": float(agent.data.time),
      "wall_s": round(wall, 2),
      "displacement": [round(float(x), 4) for x in delta],
      "horizontal_displacement": round(
          float(np.linalg.norm(delta[:2])), 4),
      "final_cost": agent.total_cost(),
      "best_return_last": best_returns[-1] if best_returns else None,
      "best_return_first": best_returns[0] if best_returns else None,
      "modes_seen": sorted(modes_seen),
      "final_mode": agent.get_mode(),
      "userdata": [round(float(x), 4) for x in ud[:8]],
      "qpos_start": [round(float(x), 4) for x in start_qpos[:3]],
      "qpos_end": [round(float(x), 4)
                   for x in np.asarray(agent.data.qpos)[:3]],
  }))


if __name__ == "__main__":
  main()
