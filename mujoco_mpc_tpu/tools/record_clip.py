"""Record a marker clip for Humanoid Track from a driven simulation.

The reference interpolates real CMU mocap keyframes
(mjpc/tasks/humanoid/tracking/tracking.cc:28-141); the CMU data files are
not shippable here, so this tool produces *recorded-from-simulation*
clips: it drives the Humanoid Walk task with the sampling planner and
samples the tracking marker set at the clip rate. The npz it writes is
the clip file format tasks/humanoid_track.py loads at import
(markers (L, nmarker, 3), fps, name).

Usage:
  python -m mujoco_mpc_tpu.tools.record_clip --steps 800 \
      --out mujoco_mpc_tpu/tasks/models/assets/clips/strider.npz
"""

from __future__ import annotations

import argparse
import os


def main():
  p = argparse.ArgumentParser(description="record a Humanoid Track clip")
  p.add_argument("--task", default="Humanoid Walk")
  p.add_argument("--steps", type=int, default=800)
  p.add_argument("--plan_every", type=int, default=2)
  p.add_argument("--fps", type=float, default=30.0)
  p.add_argument("--name", default="strider")
  p.add_argument("--out", required=True)
  p.add_argument("--candidates", type=int, default=0)
  p.add_argument("--param", action="append", default=[],
                 help="task parameter override, name=value (repeatable); "
                      "e.g. --param Speed=2.5 records a faster gait")
  p.add_argument("--keyframe", default="home")
  p.add_argument("--platform", default="")
  args = p.parse_args()

  import dataclasses

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  import numpy as np

  from mujoco_mpc_tpu.agent.agent import Agent
  from mujoco_mpc_tpu.physics.step import forward as phys_forward
  from mujoco_mpc_tpu.tasks import humanoid_track

  agent = Agent(args.task)
  if args.candidates:
    cfg = dataclasses.replace(agent.planner.config,
                              num_trajectories=args.candidates)
    agent.planner = type(agent.planner)(cfg)
    agent.policy = agent.planner.init(agent.task)
    agent.previous_policy = agent.policy
    agent._jit_opt = jax.jit(agent.planner.optimize)
    agent._jit_act = jax.jit(agent.planner.action)
  agent.reset(keyframe=args.keyframe)
  for kv in args.param:
    name, val = kv.split("=", 1)
    agent.set_task_parameter(name, float(val))
  m = agent.sim_task.model
  marker_ids = [m.body(n) for n in humanoid_track._MARKERS]
  fwd = jax.jit(phys_forward)

  frames = []
  next_sample = 0.0
  for i in range(args.steps):
    if i % args.plan_every == 0:
      agent.planner_step()
    agent.step()
    t = float(agent.data.time)
    if t >= next_sample:
      df = fwd(m, agent.data)
      frames.append(np.stack([np.asarray(df.xpos[b]) for b in marker_ids]))
      next_sample += 1.0 / args.fps

  out = os.path.abspath(args.out)
  os.makedirs(os.path.dirname(out), exist_ok=True)
  np.savez(out, markers=np.asarray(frames), fps=args.fps, name=args.name)
  print(f"wrote {len(frames)} frames ({len(frames)/args.fps:.1f} s) "
        f"to {out}; final sim x = {float(agent.data.qpos[0]):+.2f} m")


if __name__ == "__main__":
  main()
