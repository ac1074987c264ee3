"""Batch estimator: fixed-lag smoother = sliding-window Direct optimizer.

Reference (mjpc/estimators/batch.h:39 — `class Batch : public Direct,
public Estimator`; Update at batch.cc:285): shift the window, append the
newest measurement, re-optimize the configuration trajectory, report the
newest state. Window length ≤ kMaxFilterHistory=64 (batch.h:35).
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.estimators.direct import Direct, DirectConfig
from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import step as phys_step
from mujoco_mpc_tpu.physics.types import Data, Model

MAX_FILTER_HISTORY = 64  # reference batch.h:35


@struct.dataclass
class BatchState:
  qpos: jax.Array  # (W, nq) configuration window
  sensors: jax.Array  # (W, ns)
  ctrls: jax.Array  # (W, nu)
  time: jax.Array  # ()


class Batch:
  def __init__(self, model: Model, window: int = 16,
               sensor_start: int = 0, nsensordata=None,
               max_iterations: int = 3):
    assert 3 <= window <= MAX_FILTER_HISTORY
    self.model = model
    self.window = window
    self.direct = Direct(
        model, DirectConfig(horizon=window, max_iterations=max_iterations),
        sensor_start=sensor_start, nsensordata=nsensordata)
    self.ns = self.direct.ns

  def init(self, data: Data | None = None) -> BatchState:
    m = self.model
    d = data if data is not None else phys_io.make_data(m)
    return BatchState(
        qpos=jnp.tile(d.qpos, (self.window, 1)),
        sensors=jnp.zeros((self.window, self.ns), dtype=d.qpos.dtype),
        ctrls=jnp.zeros((self.window, m.nu), dtype=d.qpos.dtype),
        time=d.time)

  def update(self, state: BatchState, ctrl: jax.Array,
             sensor: jax.Array) -> BatchState:
    m = self.model
    z = (sensor[self.direct.sensor_start:
                self.direct.sensor_start + self.ns]
         if sensor.shape[0] == m.nsensordata else sensor)
    # predict the newest configuration by stepping the last estimate
    d = phys_io.make_data(m).replace(
        qpos=state.qpos[-1],
        qvel=base.local_diff(m, state.qpos[-1], state.qpos[-2]) /
        m.opt.timestep,
        ctrl=ctrl)
    q_new = phys_step(m, d).qpos

    qpos = jnp.concatenate([state.qpos[1:], q_new[None]])
    sensors = jnp.concatenate([state.sensors[1:], z[None]])
    ctrls = jnp.concatenate([state.ctrls[1:], ctrl[None]])

    result = self.direct.optimize(qpos, sensors, ctrls)
    return BatchState(qpos=result.qpos, sensors=sensors, ctrls=ctrls,
                      time=state.time + m.opt.timestep)

  def state(self, s: BatchState) -> Tuple[jax.Array, jax.Array, jax.Array]:
    m = self.model
    qvel = base.local_diff(m, s.qpos[-1], s.qpos[-2]) / m.opt.timestep
    return s.qpos[-1], qvel, jnp.zeros((m.na,), dtype=s.qpos.dtype)
