"""Trajectory recording and export — the headless stand-in for the GUI.

The reference renders live candidate traces and state in its GLFW viewer
(SURVEY §2.1 App/GUI); this environment has no GL, so the equivalent
surface is: record episodes (qpos/ctrl/cost/traces) to .npz, and replay
them in any external MuJoCo viewer via the saved task XML path
(mujoco.viewer works on machines with a display: load the model, play
back qpos frames).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


class TraceRecorder:
  """Record an agent episode for later visualization/analysis."""

  def __init__(self, agent, record_terms: bool = True):
    self.agent = agent
    self.record_terms = record_terms
    self.times, self.qpos, self.qvel, self.ctrl, self.cost = (
        [], [], [], [], [])
    self.terms = []  # per-step cost-term values (GUI cost figure)
    self.best_returns = []  # planner improvement figure

  def record(self):
    st = self.agent.get_state()
    self.times.append(st["time"])
    self.qpos.append(st["qpos"])
    self.qvel.append(st["qvel"])
    self.ctrl.append(np.asarray(self.agent.data.ctrl))
    self.cost.append(self.agent.total_cost())
    if self.record_terms:
      t = self.agent.cost_terms()
      self.terms.append([t[k] for k in self.agent.task.spec.names])
    info = self.agent.last_info
    self.best_returns.append(
        float(info.best_return) if info is not None else np.nan)

  def save(self, path: str) -> str:
    path = os.path.abspath(path)
    np.savez(
        path,
        times=np.asarray(self.times),
        qpos=np.asarray(self.qpos),
        qvel=np.asarray(self.qvel),
        ctrl=np.asarray(self.ctrl),
        cost=np.asarray(self.cost),
        terms=np.asarray(self.terms) if self.terms else np.zeros((0, 0)),
        best_returns=np.asarray(self.best_returns),
        meta=json.dumps({
            "task": self.agent.task.name,
            "planner": self.agent.planner_name,
            "term_names": list(self.agent.task.spec.names),
        }))
    return path + (".npz" if not path.endswith(".npz") else "")


def replay_script(trace_path: str, task_xml: str) -> str:
  """Emit a standalone replay script for machines with a display."""
  return f"""# replay with: python replay.py (requires a display + mujoco)
import time
import numpy as np
import mujoco
import mujoco.viewer

data = np.load({trace_path!r})
m = mujoco.MjModel.from_xml_path({task_xml!r})
d = mujoco.MjData(m)
with mujoco.viewer.launch_passive(m, d) as v:
  for qpos, t in zip(data["qpos"], data["times"]):
    d.qpos[:] = qpos
    mujoco.mj_forward(m, d)
    v.sync()
    time.sleep(float(m.opt.timestep))
"""
