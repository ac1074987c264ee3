"""Unscented Kalman filter with quaternion-aware sigma points.

Reference (mjpc/estimators/unscented.cc): sigma points from the Cholesky
factor of P (:293), quaternion-aware state means (:578), joint
measurement/prediction update (:484). Here sigma points live in the tangent
space (retraction x ⊕ δ), means are computed as tangent averages about the
central point, and the whole filter is one jitted function with the sigma
propagation vmapped (the reference evaluates sigma points in a thread loop).
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import forward as phys_forward
from mujoco_mpc_tpu.physics.step import step as phys_step
from mujoco_mpc_tpu.physics.types import Data, Model


@struct.dataclass
class UnscentedState:
  data: Data
  cov: jax.Array  # (nt, nt)
  noise_process: jax.Array  # (nt,)
  noise_sensor: jax.Array  # (ns,)


class Unscented:
  def __init__(self, model: Model, sensor_start: int = 0,
               nsensordata: int | None = None, alpha: float = 1.0,
               beta: float = 2.0):
    self.model = model
    self.sensor_start = sensor_start
    self.ns = (nsensordata if nsensordata is not None
               else model.nsensordata - sensor_start)
    self.alpha = alpha
    self.beta = beta

  def init(self, data: Data | None = None, p0: float = 1e-2,
           q_process: float = 1e-4, r_sensor: float = 1e-3
           ) -> UnscentedState:
    m = self.model
    nt = base.tangent_dim(m)
    d = data if data is not None else phys_io.make_data(m)
    dtype = d.qpos.dtype
    return UnscentedState(
        data=d, cov=jnp.eye(nt, dtype=dtype) * p0,
        noise_process=jnp.full((nt,), q_process, dtype=dtype),
        noise_sensor=jnp.full((self.ns,), r_sensor, dtype=dtype))

  def _weights(self, nt: int, dtype):
    lam = self.alpha ** 2 * nt - nt
    wm0 = lam / (nt + lam)
    wc0 = wm0 + (1 - self.alpha ** 2 + self.beta)
    wi = 1.0 / (2 * (nt + lam))
    wm = jnp.concatenate([jnp.asarray([wm0], dtype=dtype),
                          jnp.full((2 * nt,), wi, dtype=dtype)])
    wc = jnp.concatenate([jnp.asarray([wc0], dtype=dtype),
                          jnp.full((2 * nt,), wi, dtype=dtype)])
    return wm, wc, lam

  def update(self, state: UnscentedState, ctrl: jax.Array,
             sensor: jax.Array) -> UnscentedState:
    # covariance recursions need f32 matmuls on TPU (MXU default is bf16)
    with jax.default_matmul_precision("highest"):
      return self._update(state, ctrl, sensor)

  def _update(self, state: UnscentedState, ctrl: jax.Array,
              sensor: jax.Array) -> UnscentedState:
    m = self.model
    d = state.data
    nt = base.tangent_dim(m)
    dtype = d.qpos.dtype
    wm, wc, lam = self._weights(nt, dtype)

    # sigma displacements: 0, ±cols of chol((nt+λ)P)
    scale = jnp.sqrt(jnp.maximum(nt + lam, 1e-8))
    chol = jnp.linalg.cholesky(
        state.cov + 1e-10 * jnp.eye(nt, dtype=dtype)) * scale
    deltas = jnp.concatenate(
        [jnp.zeros((1, nt), dtype=dtype), chol.T, -chol.T])  # (2nt+1, nt)

    def propagate(dx):
      qpos, qvel, act = base.pack_state(m, d.qpos, d.qvel, d.act, dx)
      d2 = phys_step(m, d.replace(qpos=qpos, qvel=qvel, act=act, ctrl=ctrl))
      d2f = phys_forward(m, d2)
      y = d2f.sensordata[self.sensor_start:self.sensor_start + self.ns]
      return d2.qpos, d2.qvel, d2.act, y

    qs, vs, accs, ys = jax.vmap(propagate)(deltas)

    # manifold mean about the central propagated point
    q0, v0, a0 = qs[0], vs[0], accs[0]

    def to_tangent(q, v, a):
      dq = base.local_diff(m, q, q0)
      parts = [dq, v - v0] + ([a - a0] if m.na else [])
      return jnp.concatenate(parts)

    tx = jax.vmap(to_tangent)(qs, vs, accs)  # (2nt+1, nt)
    mean_t = jnp.einsum("i,ij->j", wm, tx)
    qpos_m, qvel_m, act_m = base.pack_state(m, q0, v0, a0, mean_t)

    dxs = tx - mean_t[None]
    cov_x = jnp.einsum("i,ij,ik->jk", wc, dxs, dxs) + jnp.diag(
        state.noise_process)

    y_mean = jnp.einsum("i,ij->j", wm, ys)
    dys = ys - y_mean[None]
    cov_y = jnp.einsum("i,ij,ik->jk", wc, dys, dys) + jnp.diag(
        state.noise_sensor)
    cov_xy = jnp.einsum("i,ij,ik->jk", wc, dxs, dys)

    z = (sensor[self.sensor_start:self.sensor_start + self.ns]
         if sensor.shape[0] == m.nsensordata else sensor)
    gain = cov_xy @ jnp.linalg.inv(cov_y)
    dx = gain @ (z - y_mean)
    qpos_f, qvel_f, act_f = base.pack_state(m, qpos_m, qvel_m, act_m, dx)
    cov = cov_x - gain @ cov_y @ gain.T
    cov = 0.5 * (cov + cov.T)

    d_next = state.data.replace(qpos=qpos_f, qvel=qvel_f, act=act_f,
                                time=d.time + m.opt.timestep)
    return state.replace(data=d_next, cov=cov)

  def state(self, s: UnscentedState
            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    return s.data.qpos, s.data.qvel, s.data.act
