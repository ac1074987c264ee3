import time, sys
t0 = time.perf_counter()
def mark(s):
    print(f"[{time.perf_counter()-t0:8.1f}s] {s}", flush=True)
import jax
from mujoco_mpc_tpu.agent.agent import Agent
mark(f"imports done, backend={jax.default_backend()}")
agent = Agent(task_name="Bimanual Handover")
mark("agent built")
from mujoco_mpc_tpu.physics import tilestep
try:
    tilestep.extract(agent.task.model)
    mark("tile-eligible: YES (unexpected)")
except tilestep.UnsupportedModel as e:
    mark(f"tile-eligible: no ({e})")
from mujoco_mpc_tpu.physics import solver, collision
m = agent.task.model
mark(f"npairs={len(m.collision_pairs)} ncon={collision.npoints(m)} nrow={solver.nrow_static(m)} nv={m.nv}")
info = agent.planner_step()
mark(f"first planner_step, best_return={float(info.best_return):.3f}")
info = agent.planner_step()
mark("second planner_step")
for i in range(5):
    info = agent.planner_step()
mark("5 more planner_steps")
agent.steps(2)
mark("first steps(2)")
for i in range(10):
    agent.planner_step(); agent.steps(2)
mark("10 plan+step cycles")
