"""Estimator layer: state-space utilities shared by EKF/UKF/batch.

Reference interface (mjpc/estimators/estimator.h:33-98): Initialize/Reset/
Update(ctrl, sensor)/State/Covariance/Noise. Here an estimator is a pytree
state + pure `update` function; covariance lives in the tangent space of
the configuration manifold (dimension 2·nv + na), with quaternion-aware
retraction/difference, so free/ball joints are handled exactly rather than
via the reference's qpos-space finite differences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math as pmath
from mujoco_mpc_tpu.physics.step import integrate_pos
from mujoco_mpc_tpu.physics.types import JointType, Model


def retract(m: Model, qpos: jax.Array, dq: jax.Array) -> jax.Array:
  """qpos ⊕ dq: apply a tangent-space displacement (manifold retraction)."""
  return integrate_pos(m, qpos, dq, 1.0)


def local_diff(m: Model, qa: jax.Array, qb: jax.Array) -> jax.Array:
  """qa ⊖ qb → tangent vector (mju_differentiatePos with dt=1)."""
  out = []
  for j in range(m.njnt):
    qadr, jt = m.jnt_qposadr[j], m.jnt_type[j]
    if jt == JointType.FREE:
      out.append(qa[qadr:qadr + 3] - qb[qadr:qadr + 3])
      out.append(pmath.quat_sub(qa[qadr + 3:qadr + 7],
                                qb[qadr + 3:qadr + 7]))
    elif jt == JointType.BALL:
      out.append(pmath.quat_sub(qa[qadr:qadr + 4], qb[qadr:qadr + 4]))
    else:
      out.append((qa[qadr] - qb[qadr])[None])
  return (jnp.concatenate(out) if out
          else jnp.zeros((0,), dtype=qa.dtype))


def tangent_dim(m: Model) -> int:
  return 2 * m.nv + m.na


def measurement_slice(m: Model):
  """(start, dim) of the non-USER sensordata — the measurement vector.

  USER sensors are cost-term placeholders (reference convention); real
  measurements follow them. Honors `estimator_sensor_start` /
  `estimator_number_sensor` custom numerics when present (reference
  cartpole task.xml estimator settings)."""
  start = m.custom("estimator_sensor_start", None)
  if start is not None:
    # reference counts sensors, not addresses: convert
    idx = int(start)
    nsens = m.custom("estimator_number_sensor", None)
    adr = m.sensor_spec[idx][3] if idx < len(m.sensor_spec) else 0
    if nsens is not None:
      last = idx + int(nsens) - 1
      end = m.sensor_spec[last][3] + m.sensor_spec[last][4]
      return adr, end - adr
    return adr, m.nsensordata - adr
  from mujoco_mpc_tpu.physics.types import SensorType
  for (stype, _, _, adr, _dim) in m.sensor_spec:
    if SensorType(stype) != SensorType.USER:
      return adr, m.nsensordata - adr
  return 0, m.nsensordata


def pack_state(m: Model, qpos, qvel, act, dx):
  """(qpos, qvel, act) ⊕ tangent dx → new (qpos, qvel, act)."""
  nv, na = m.nv, m.na
  qpos2 = retract(m, qpos, dx[:nv])
  qvel2 = qvel + dx[nv:2 * nv]
  act2 = act + dx[2 * nv:] if na else act
  return qpos2, qvel2, act2
