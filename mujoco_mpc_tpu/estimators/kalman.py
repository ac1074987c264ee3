"""Extended Kalman filter with autodiff Jacobians.

Reference (mjpc/estimators/kalman.{h,cc}, algorithm docs/ESTIMATORS.md:
18-60): prediction = mj_step + FD transition Jacobian A (kalman.cc:292),
measurement update with dense covariance and FD sensor Jacobian C
(kalman.cc:212). Here both Jacobians are exact jacfwd through the physics
step / sensor pipeline, taken in the tangent space of the configuration
manifold (quaternion-aware — the reference relies on mjd_transitionFD's
internal quaternion handling).
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
class KalmanState:
  data: Data  # current mean state (qpos, qvel, act inside)
  cov: jax.Array  # (nt, nt) tangent-space covariance
  noise_process: jax.Array  # (nt,) process noise diagonal
  noise_sensor: jax.Array  # (ns,) measurement noise diagonal


class Kalman:
  """EKF over (qpos, qvel, act) with sensordata measurements."""

  def __init__(self, model: Model, sensor_start: int = 0,
               nsensordata: int | None = None):
    self.model = model
    self.sensor_start = sensor_start
    self.ns = (nsensordata if nsensordata is not None
               else model.nsensordata - sensor_start)

  def init(self, data: Data | None = None, p0: float = 1e-2,
           q_process: float = 1e-4, r_sensor: float = 1e-3) -> KalmanState:
    m = self.model
    nt = base.tangent_dim(m)
    d = data if data is not None else phys_io.make_data(m)
    dtype = d.qpos.dtype
    return KalmanState(
        data=d,
        cov=jnp.eye(nt, dtype=dtype) * p0,
        noise_process=jnp.full((nt,), q_process, dtype=dtype),
        noise_sensor=jnp.full((self.ns,), r_sensor, dtype=dtype))

  # ------------------------------------------------------------- internals
  def _measure(self, d: Data) -> jax.Array:
    d = phys_forward(self.model, d)
    return d.sensordata[self.sensor_start:self.sensor_start + self.ns]

  def _step_tangent(self, d: Data, ctrl: jax.Array,
                    dx: jax.Array) -> jax.Array:
    """Tangent-space transition: (x ⊕ dx) → step → ⊖ reference next state."""
    m = self.model
    qpos, qvel, act = base.pack_state(m, d.qpos, d.qvel, d.act, dx)
    d2 = d.replace(qpos=qpos, qvel=qvel, act=act, ctrl=ctrl)
    d2 = phys_step(m, d2)
    return d2, None

  # ------------------------------------------------------------------- API
  def update(self, state: KalmanState, ctrl: jax.Array,
             sensor: jax.Array) -> KalmanState:
    """Measurement update at the current time, then prediction
    (UpdateMeasurement + UpdatePrediction, kalman.cc:212,292)."""
    # covariance recursions need f32 matmuls on TPU (MXU default is bf16)
    with jax.default_matmul_precision("highest"):
      return self._update(state, ctrl, sensor)

  def _update(self, state: KalmanState, ctrl: jax.Array,
              sensor: jax.Array) -> KalmanState:
    m = self.model
    d = state.data
    nt = base.tangent_dim(m)
    dx0 = jnp.zeros((nt,), dtype=d.qpos.dtype)

    # --- measurement update
    def meas_of_dx(dx):
      qpos, qvel, act = base.pack_state(m, d.qpos, d.qvel, d.act, dx)
      return self._measure(d.replace(qpos=qpos, qvel=qvel, act=act))

    y_pred = meas_of_dx(dx0)
    cmat = jax.jacfwd(meas_of_dx)(dx0)  # (ns, nt)
    s = cmat @ state.cov @ cmat.T + jnp.diag(state.noise_sensor)
    innov = sensor[self.sensor_start:self.sensor_start + self.ns] - y_pred \
        if sensor.shape[0] == m.nsensordata else sensor - y_pred
    gain = state.cov @ cmat.T @ jnp.linalg.inv(s)
    dx = gain @ innov
    qpos, qvel, act = base.pack_state(m, d.qpos, d.qvel, d.act, dx)
    d = d.replace(qpos=qpos, qvel=qvel, act=act)
    eye = jnp.eye(nt, dtype=d.qpos.dtype)
    cov = (eye - gain @ cmat) @ state.cov
    cov = 0.5 * (cov + cov.T)

    # --- prediction
    def next_of_dx(dx):
      qpos2, qvel2, act2 = base.pack_state(m, d.qpos, d.qvel, d.act, dx)
      d2 = phys_step(m, d2_template.replace(
          qpos=qpos2, qvel=qvel2, act=act2, ctrl=ctrl))
      dq = base.local_diff(m, d2.qpos, ref_next.qpos)
      dv = d2.qvel - ref_next.qvel
      da = d2.act - ref_next.act
      return jnp.concatenate([dq, dv, da]) if m.na else \
          jnp.concatenate([dq, dv])

    d2_template = d
    ref_next = phys_step(m, d.replace(ctrl=ctrl))
    amat = jax.jacfwd(next_of_dx)(dx0)  # (nt, nt)
    cov = amat @ cov @ amat.T + jnp.diag(state.noise_process)
    cov = 0.5 * (cov + cov.T)

    return state.replace(data=ref_next, cov=cov)

  def state(self, s: KalmanState) -> Tuple[jax.Array, jax.Array, jax.Array]:
    return s.data.qpos, s.data.qvel, s.data.act
