"""Humanoid walking demo — 1024-candidate batches; run on TPU.

Usage: python examples/humanoid_walk.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import registry
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import step as phys_step

task = registry.get_task("Humanoid Walk")
cfg = dataclasses.replace(sampling.SamplingConfig.from_task(task),
                          num_trajectories=1024)
planner = sampling.SamplingPlanner(cfg)
policy = planner.init(task)
d = phys_io.make_data(task.model).replace(
    qpos=jnp.asarray(task.model.keyframe("home")[0], dtype=jnp.float32))
opt = jax.jit(planner.optimize)
act = jax.jit(planner.action)
step = jax.jit(phys_step)
rng = jax.random.PRNGKey(0)
for i in range(800):
  if i % 2 == 0:
    rng, k = jax.random.split(rng)
    policy, info = opt(task, policy, d, k)
  d = d.replace(ctrl=act(task, policy, d))
  d = step(task.model, d)
  if i % 100 == 99:
    head_z = float(d.site_xpos[task.model.site("head_site"), 2])
    print(f"t={float(d.time):4.1f}s  x={float(d.qpos[0]):+5.2f}m  "
          f"head z={head_z:.2f}  best={float(info.best_return):.3f}")
