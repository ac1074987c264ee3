"""Web dashboard (ui/server.py) — the reference GUI mutation surface
(mjpc/simulate.cc sidebar: planner dropdown, weight/parameter sliders,
mode selection, pause/reset) exercised over HTTP without GL."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mujoco_mpc_tpu.ui import server as ui_server


def _req(port, path, body=None):
  url = f"http://127.0.0.1:{port}{path}"
  if body is None:
    r = urllib.request.urlopen(url, timeout=30)
  else:
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    r = urllib.request.urlopen(req, timeout=30)
  return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def dashboard():
  ui = ui_server.AgentUI("Particle", render=False)  # no threads: pure API
  srv = ui_server.make_server(ui, port=0)
  t = threading.Thread(target=srv.serve_forever, daemon=True)
  t.start()
  yield ui, srv.server_address[1]
  srv.shutdown()


def test_state_surface(dashboard):
  ui, port = dashboard
  code, st = _req(port, "/api/state")
  assert code == 200
  assert st["task"] == "Particle"
  assert st["planner"] in st["planners"]
  assert "sampling" in st["planners"] and "ilqg" in st["planners"]
  assert len(st["tasks"]) >= 23  # full registry in the dropdown
  assert st["weights"] and all(isinstance(v, float)
                               for v in st["weights"].values())
  assert st["render"] is False and st["paused"] is False


def test_weight_and_param_sliders_mutate_task(dashboard):
  ui, port = dashboard
  _, st = _req(port, "/api/state")
  name = next(iter(st["weights"]))
  code, out = _req(port, "/api/set", {"weights": {name: 3.25}})
  assert code == 200 and out["ok"]
  assert abs(ui.agent.get_cost_weights()[name] - 3.25) < 1e-6
  if st["params"]:
    pname = next(iter(st["params"]))
    _req(port, "/api/set", {"params": {pname: 0.5}})
    i = ui.agent.task.param_names.index(pname)
    assert abs(float(np.asarray(
        ui.agent.task.params.residual_params[i])) - 0.5) < 1e-6


def test_run_controls(dashboard):
  ui, port = dashboard
  _req(port, "/api/set", {"paused": True, "speed": 2.0,
                          "ctrl_noise": 0.1, "traces": True})
  assert ui.paused and ui.speed == 2.0
  assert ui.ctrl_noise == 0.1 and ui.traces
  _req(port, "/api/set", {"paused": False, "traces": False})
  code, st = _req(port, "/api/state")
  assert not st["paused"]


def test_planner_switch_preserves_state(dashboard):
  ui, port = dashboard
  ui.agent.set_state(qpos=np.asarray(ui.agent.data.qpos) + 0.05)
  qpos_before = np.asarray(ui.agent.data.qpos).copy()
  code, out = _req(port, "/api/planner", {"planner": "cross_entropy"})
  assert code == 200 and out["ok"]
  assert ui.agent.planner_name == "cross_entropy"
  np.testing.assert_allclose(np.asarray(ui.agent.data.qpos), qpos_before,
                             atol=1e-6)
  code, _ = _req(port, "/api/reset", {})
  assert code == 200


def test_bad_requests_are_400(dashboard):
  _, port = dashboard
  try:
    _req(port, "/api/planner", {"planner": "nope"})
    assert False, "expected HTTPError"
  except urllib.error.HTTPError as e:
    assert e.code == 400


def test_page_serves(dashboard):
  _, port = dashboard
  r = urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30)
  html = r.read().decode()
  assert "mjpc_tpu" in html and "costchart" in html
  # no GL: frame endpoint says so instead of crashing
  try:
    urllib.request.urlopen(f"http://127.0.0.1:{port}/frame.jpg", timeout=30)
    assert False
  except urllib.error.HTTPError as e:
    assert e.code == 404


def test_live_loop_accrues_history():
  """Threads on: physics + plan loops fill the plot history ring
  (reference PhysicsLoop/PlanLoop, app.cc:117-206). slow: jit compiles
  the particle planner."""
  import time

  ui = ui_server.AgentUI("Particle", render=False)
  ui.start()
  try:
    deadline = time.time() + 120
    while time.time() < deadline and (
        len(ui.history) < 3 or not ui.plan_times):
      time.sleep(0.5)
    assert len(ui.history) >= 3, "physics loop produced no samples"
    assert ui.plan_times, "plan loop produced no iterations"
    st = ui.state()
    assert st["planner_hz"] is not None
    assert st["history"][-1]["t"] > 0
  finally:
    ui.stop()
