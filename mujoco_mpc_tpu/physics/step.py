"""Top-level physics pipeline: forward dynamics and integration.

Pure-functional equivalents of mj_forward / mj_step (the external C calls at
the heart of the reference's rollout loop, mjpc/trajectory.cc:141-180), plus
inverse dynamics for the direct optimizer. Everything is jit/vmap/scan
compatible and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import linalg
from mujoco_mpc_tpu.physics import collision, dynamics, kinematics, sensors
from mujoco_mpc_tpu.physics import solver as solver_mod
from mujoco_mpc_tpu.physics.types import Data, JointType, Model
from mujoco_mpc_tpu.physics import math


def _chol(m: Model, d: Data):
  """Cholesky of the implicit-damping inertia  M + h·diag(damping).

  Folding joint damping into the factor gives MuJoCo-Euler's unconditionally
  stable implicit damping at zero extra cost (one factorization per step).
  """
  h = m.opt.timestep
  mimp = d.qM + h * jnp.diag(m.dof_damping)
  return linalg.chol_factor(mimp)


def forward(m: Model, d: Data, compute_sensors: bool = True) -> Data:
  """Position+velocity+acceleration pipeline; fills qacc and sensordata."""
  # TPU default matmul precision is bf16: the inertia/Delassus chain loses
  # enough bits to blow up the contact solve in marginal states (verified
  # on a captured hard-landing state — f32 steps fine, bf16 NaNs). These
  # matmuls are tiny (nv ≤ ~60); full f32 costs nothing.
  with jax.default_matmul_precision("highest"):
    return _forward(m, d, compute_sensors)


def _forward(m: Model, d: Data, compute_sensors: bool = True) -> Data:
  d = kinematics.kinematics(m, d)
  d = dynamics.com_pos(m, d)
  d, cdof_dot = dynamics.com_vel(m, d)
  ibody = dynamics._body_inertias(m, d)  # shared by CRB and RNE
  d = dynamics.crb(m, d, ibody)
  d = dynamics.rne(m, d, cdof_dot, ibody)
  d = dynamics.passive(m, d)
  d = dynamics.actuation(m, d)

  qfrc_smooth = (d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied +
                 dynamics.xfrc_accumulate(m, d) - d.qfrc_bias)
  factor = _chol(m, d)
  d = d.replace(qLD=factor)
  qacc_smooth = linalg.chol_solve(factor, qfrc_smooth)

  d = collision.collide(m, d)
  d = solver_mod.solve(m, d, qacc_smooth, factor)
  qacc = linalg.chol_solve(factor, qfrc_smooth + d.qfrc_constraint)
  d = d.replace(qacc=qacc)
  if compute_sensors:
    d = sensors.sensors(m, d)
  return d


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                  dt) -> jax.Array:
  """qpos ⊕ qvel·dt respecting quaternion manifolds (mj_integratePos).

  Scalar joints integrate in one vectorized op (the all-scalar case — most
  planar models — is a single add); quaternion joints get the exact
  exponential map each.
  """
  # fast path: no quaternion joints and dense addressing
  if all(jt in (JointType.HINGE, JointType.SLIDE) for jt in m.jnt_type):
    if m.nq == m.nv:
      return qpos + dt * qvel

  out = qpos
  scalar_q = [m.jnt_qposadr[j] for j in range(m.njnt)
              if m.jnt_type[j] in (JointType.HINGE, JointType.SLIDE)]
  scalar_v = [m.jnt_dofadr[j] for j in range(m.njnt)
              if m.jnt_type[j] in (JointType.HINGE, JointType.SLIDE)]
  if scalar_q:
    qi = jnp.asarray(scalar_q, dtype=jnp.int32)
    vi = jnp.asarray(scalar_v, dtype=jnp.int32)
    out = out.at[qi].add(dt * qvel[vi])
  for j in range(m.njnt):
    qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    jt = m.jnt_type[j]
    if jt == JointType.FREE:
      out = out.at[qadr:qadr + 3].add(dt * qvel[vadr:vadr + 3])
      quat = math.quat_integrate(
          out[qadr + 3:qadr + 7], qvel[vadr + 3:vadr + 6],
          jnp.asarray(dt, dtype=qpos.dtype))
      out = out.at[qadr + 3:qadr + 7].set(quat)
    elif jt == JointType.BALL:
      quat = math.quat_integrate(
          out[qadr:qadr + 4], qvel[vadr:vadr + 3],
          jnp.asarray(dt, dtype=qpos.dtype))
      out = out.at[qadr:qadr + 4].set(quat)
  return out


def step(m: Model, d: Data) -> Data:
  """One physics step: semi-implicit Euler (implicit joint damping), or
  classic RK4 when the model selects integrator="RK4" (the id is static →
  the branch resolves at trace time; mj_step's mjINT_RK4 analog).

  Sensors are NOT evaluated here — rollout hot loops read Data directly
  (task residuals); call forward() when sensordata is needed.
  """
  if m.opt.integrator == 1:  # mjINT_RK4
    return _step_rk4(m, d)
  d = forward(m, d, compute_sensors=False)
  h = m.opt.timestep
  qvel = d.qvel + h * d.qacc
  act = d.act + h * d.act_dot if m.na else d.act
  qpos = integrate_pos(m, d.qpos, qvel, h)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def _step_rk4(m: Model, d: Data) -> Data:
  """Classic 4th-order Runge-Kutta on (qpos, qvel, act) — manifold-aware
  position updates via integrate_pos (mj_RungeKutta analog)."""
  h = m.opt.timestep
  half = 0.5 * h

  def deriv(qpos, qvel, act, t):
    dd = d.replace(qpos=qpos, qvel=qvel, act=act, time=t)
    dd = forward(m, dd, compute_sensors=False)
    return dd.qacc, dd.act_dot, dd

  a1, ad1, d1 = deriv(d.qpos, d.qvel, d.act, d.time)
  q2 = integrate_pos(m, d.qpos, d.qvel, half)
  a2, ad2, _ = deriv(q2, d.qvel + half * a1,
                     d.act + half * ad1 if m.na else d.act, d.time + half)
  q3 = integrate_pos(m, d.qpos, d.qvel + half * a1, half)
  a3, ad3, _ = deriv(q3, d.qvel + half * a2,
                     d.act + half * ad2 if m.na else d.act, d.time + half)
  q4 = integrate_pos(m, d.qpos, d.qvel + half * a2, h)
  a4, ad4, _ = deriv(q4, d.qvel + h * a3,
                     d.act + h * ad3 if m.na else d.act, d.time + h)

  v_avg = (d.qvel + 2 * (d.qvel + half * a1) + 2 * (d.qvel + half * a2) +
           (d.qvel + h * a3)) / 6.0
  a_avg = (a1 + 2 * a2 + 2 * a3 + a4) / 6.0
  qpos = integrate_pos(m, d.qpos, v_avg, h)
  qvel = d.qvel + h * a_avg
  act = (d.act + h * (ad1 + 2 * ad2 + 2 * ad3 + ad4) / 6.0
         if m.na else d.act)
  # carry d1's derived fields (contacts/forces at the step's start state)
  return d1.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def inverse(m: Model, d: Data) -> jax.Array:
  """Inverse dynamics: applied force consistent with (qpos, qvel, qacc).

  qfrc_inverse = M·qacc + bias − passive − constraint, the quantity the
  direct optimizer penalizes (reference: mjd_inverseFD uses,
  mjpc/direct/direct.cc:1678-1781 — here it is exact and differentiable).
  """
  with jax.default_matmul_precision("highest"):
    return _inverse(m, d)


def _inverse(m: Model, d: Data) -> jax.Array:
  d = kinematics.kinematics(m, d)
  d = dynamics.com_pos(m, d)
  d, cdof_dot = dynamics.com_vel(m, d)
  ibody = dynamics._body_inertias(m, d)
  d = dynamics.crb(m, d, ibody)
  d = dynamics.rne(m, d, cdof_dot, ibody)
  d = dynamics.passive(m, d)

  factor = _chol(m, d)
  qfrc_smooth = (d.qfrc_passive + d.qfrc_applied +
                 dynamics.xfrc_accumulate(m, d) - d.qfrc_bias)
  qacc_smooth = linalg.chol_solve(factor, qfrc_smooth)
  d = collision.collide(m, d)
  d = solver_mod.solve(m, d, qacc_smooth, factor)

  return (d.qM @ d.qacc + d.qfrc_bias - d.qfrc_passive -
          d.qfrc_constraint)
