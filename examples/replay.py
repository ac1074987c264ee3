"""Replay a recorded episode in the MuJoCo viewer (VERDICT r1 #9; the
headless counterpart of the reference's GLFW app, mjpc/app.cc:209-386).

Usage:
  python examples/replay.py trace.npz --task "Quadruped Flat"      # live view
  python examples/replay.py trace.npz --task Cartpole --video out.mp4
  python examples/replay.py trace.npz --task Cartpole --summary    # no GL

The trace is a TraceRecorder .npz (tools/trace.py): times/qpos/qvel/ctrl/
cost arrays plus task metadata. The task name resolves the MJCF through the
task registry so the replayed model matches the recorded one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _task_xml_path(task_name: str) -> str:
  from mujoco_mpc_tpu.tasks import registry

  # task factories load "<file>.xml" from tasks/models; recover the path
  # by matching the registered model file to the task's model name
  import mujoco_mpc_tpu.tasks as tasks_pkg
  model_dir = os.path.join(os.path.dirname(tasks_pkg.__file__), "models")
  task = registry.get_task(task_name)
  for f in sorted(os.listdir(model_dir)):
    if not f.endswith(".xml"):
      continue
    import mujoco
    mj = mujoco.MjModel.from_xml_path(os.path.join(model_dir, f))
    if mj.nq == task.model.nq and mj.nu == task.model.nu:
      return os.path.join(model_dir, f)
  raise FileNotFoundError(f"no XML found for task {task_name!r}")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("trace", help=".npz file from TraceRecorder.save")
  ap.add_argument("--task", default=None,
                  help="task name (default: from trace metadata)")
  ap.add_argument("--video", default=None,
                  help="render offscreen to this .mp4 instead of live view")
  ap.add_argument("--summary", action="store_true",
                  help="print a text summary only (no GL required)")
  ap.add_argument("--fps", type=float, default=None,
                  help="playback rate (default: recorded timestamps)")
  args = ap.parse_args()

  data = np.load(args.trace, allow_pickle=True)
  meta = json.loads(str(data["meta"])) if "meta" in data else {}
  task_name = args.task or meta.get("task")
  if task_name is None:
    raise SystemExit("--task required (trace has no metadata)")

  times, qpos = data["times"], data["qpos"]
  print(f"trace: {len(times)} frames over {times[-1] - times[0]:.2f}s, "
        f"task={task_name}, planner={meta.get('planner', '?')}")
  if "cost" in data:
    c = data["cost"]
    print(f"cost: start {c[0]:.4f} min {c.min():.4f} end {c[-1]:.4f}")
  if args.summary:
    q = qpos
    print(f"qpos[0] range: [{q[:, 0].min():.3f}, {q[:, 0].max():.3f}]")
    return

  import mujoco
  xml = _task_xml_path(task_name)
  m = mujoco.MjModel.from_xml_path(xml)
  d = mujoco.MjData(m)

  if args.video:
    import imageio
    renderer = mujoco.Renderer(m, height=480, width=640)
    frames = []
    stride = max(1, len(qpos) // int((times[-1] - times[0]) * 30 + 1))
    for q in qpos[::stride]:
      d.qpos[:] = q
      mujoco.mj_forward(m, d)
      renderer.update_scene(d)
      frames.append(renderer.render())
    imageio.mimsave(args.video, frames, fps=30)
    print(f"wrote {args.video} ({len(frames)} frames)")
    return

  import time

  import mujoco.viewer
  with mujoco.viewer.launch_passive(m, d) as viewer:
    t_prev = times[0]
    for q, t in zip(qpos, times):
      if not viewer.is_running():
        break
      d.qpos[:] = q
      mujoco.mj_forward(m, d)
      viewer.sync()
      dt = (1.0 / args.fps) if args.fps else float(t - t_prev)
      t_prev = t
      if dt > 0:
        time.sleep(dt)


if __name__ == "__main__":
  main()
