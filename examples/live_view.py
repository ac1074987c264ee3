"""Live interactive viewer: plan-while-acting with GUI mutation + traces.

The reference is an *interactive* application: render loop ∥ physics loop ∥
plan loop with live weight/mode mutation and candidate-trace rendering
(mjpc/app.cc:209-386,464-503; mjpc/planners/sampling/planner.cc:401-438).
This bridge reproduces that surface on GL-capable hosts with
mujoco.viewer's passive viewer around the asynchronous Agent:

  python examples/live_view.py --task Cartpole
  python examples/live_view.py --task "Quadruped Flat" --ctrl-noise 0.05

Keys (forwarded through the viewer's key callback — the same mutation
surface the RPC SetAnything/SetCostWeights/SetMode methods expose):
  M        cycle task mode            R   reset (home keyframe)
  UP/DOWN  scale first cost weight    T   toggle candidate traces
  SPACE    pause/resume physics

On hosts without GL (this CI container), --headless N runs the same loop
windowless and exports the per-iteration best-trajectory traces +
candidate returns to an .npz next to the episode trace.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _mj_model_for(task_name: str):
  """The host-side mujoco model matching the task (for rendering only)."""
  import mujoco
  from examples.replay import _task_xml_path

  return mujoco.MjModel.from_xml_path(_task_xml_path(task_name))


def _best_trace(agent, horizon=None):
  """(T, 3) world positions of the root body along the best trajectory."""
  import jax
  from mujoco_mpc_tpu.physics.step import forward as phys_forward

  traj = agent.best_trajectory(horizon=horizon)
  fwd = jax.jit(phys_forward)
  pts = []
  d = agent.data
  for qpos in traj["qpos"]:
    d2 = d.replace(qpos=d.qpos.at[:].set(np.asarray(qpos)))
    df = fwd(agent.sim_task.model, d2)
    pts.append(np.asarray(df.xpos[1]) if agent.task.model.nbody > 1
               else np.zeros(3))
  return np.asarray(pts), traj["costs"]


def main():
  p = argparse.ArgumentParser(description="mjpc_tpu live viewer")
  p.add_argument("--task", default="Cartpole")
  p.add_argument("--planner", default="sampling")
  p.add_argument("--ctrl-noise", type=float, default=0.0)
  p.add_argument("--headless", type=int, default=0,
                 help="run N steps without GL, export traces")
  p.add_argument("--trace-out", default="/tmp/live_traces.npz")
  p.add_argument("--platform", default="",
                 help="force jax platform (cpu); default = real device")
  args = p.parse_args()

  if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

  from mujoco_mpc_tpu.agent.agent import Agent

  agent = Agent(args.task, planner=args.planner)
  try:
    agent.reset(keyframe="home")
  except (KeyError, ValueError):
    agent.reset()

  if args.headless:
    # windowless: same loop, traces to disk
    agent.start_planning()
    traces, returns = [], []
    try:
      for i in range(args.headless):
        agent.step(ctrl_noise_std=args.ctrl_noise)
        if i % 20 == 0:
          pts, costs = _best_trace(agent)
          traces.append(pts)
          returns.append(np.asarray(agent.last_info.costs)
                         if agent.last_info else np.zeros(1))
    finally:
      agent.stop_planning()
    np.savez(args.trace_out,
             traces=np.asarray(traces),
             candidate_returns=np.asarray(returns, dtype=object if
                                          len({r.shape for r in returns}) > 1
                                          else None))
    print(f"wrote {len(traces)} trace snapshots to {args.trace_out}; "
          f"final cost {agent.total_cost():.3f}")
    return

  import mujoco
  import mujoco.viewer

  mj = _mj_model_for(args.task)
  md = mujoco.MjData(mj)
  state = {"paused": False, "traces": True, "wscale": 1.0}

  def on_key(keycode):
    name = agent.task.spec.names[0]
    if keycode == ord(' '):
      state["paused"] = not state["paused"]
    elif keycode == ord('R'):
      agent.reset(keyframe="home")
    elif keycode == ord('T'):
      state["traces"] = not state["traces"]
    elif keycode == ord('M') and len(agent.mode_names) > 1:
      cur = agent.mode_names.index(agent.get_mode())
      agent.set_mode(agent.mode_names[(cur + 1) % len(agent.mode_names)])
      print("mode:", agent.get_mode())
    elif keycode == 265:  # UP
      state["wscale"] *= 1.25
      agent.set_cost_weights({name: state["wscale"]})
      print(f"weight {name} = {state['wscale']:.3f}")
    elif keycode == 264:  # DOWN
      state["wscale"] *= 0.8
      agent.set_cost_weights({name: state["wscale"]})
      print(f"weight {name} = {state['wscale']:.3f}")

  agent.start_planning()
  try:
    with mujoco.viewer.launch_passive(mj, md, key_callback=on_key) as v:
      while v.is_running():
        t0 = time.perf_counter()
        if not state["paused"]:
          agent.step(ctrl_noise_std=args.ctrl_noise)
        st = agent.get_state()
        md.qpos[:] = st["qpos"]
        md.qvel[:] = st["qvel"]
        mujoco.mj_forward(mj, md)
        if state["traces"] and agent.last_info is not None:
          pts, _ = _best_trace(agent, horizon=20)
          v.user_scn.ngeom = 0
          for i, pt in enumerate(pts[::2]):
            if v.user_scn.ngeom >= v.user_scn.maxgeom:
              break
            g = v.user_scn.geoms[v.user_scn.ngeom]
            mujoco.mjv_initGeom(
                g, mujoco.mjtGeom.mjGEOM_SPHERE, [0.01, 0, 0],
                pt.astype(np.float64), np.eye(3).ravel(),
                [0.2, 0.8, 0.2, 0.7])
            v.user_scn.ngeom += 1
        v.sync()
        dt = float(mj.opt.timestep) - (time.perf_counter() - t0)
        if dt > 0:
          time.sleep(dt)
  finally:
    agent.stop_planning()


if __name__ == "__main__":
  main()
