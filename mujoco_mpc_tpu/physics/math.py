"""Quaternion and spatial (Plücker) algebra primitives.

Conventions (chosen to match MuJoCo so the engine can be validated against it):
  - quaternions are (w, x, y, z), unit norm;
  - spatial motion/force vectors are 6-D, ordered [angular(3); linear(3)],
    expressed in the world frame, with moments taken about the world origin.

Everything is shape-polymorphic over leading batch dimensions and dtype
preserving, so the same code runs f32 on TPU and f64 in CPU oracle tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# quaternions
# ----------------------------------------------------------------------------


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product u ⊗ v, (w,x,y,z) convention."""
  w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
  w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-1,
  )


def quat_conj(q: jax.Array) -> jax.Array:
  return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (active rotation, body→world)."""
  w, u = q[..., :1], q[..., 1:]
  c1 = jnp.cross(u, v)
  c2 = jnp.cross(u, c1 + w * v)
  return v + 2.0 * c2


def quat_rot_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  return quat_rot(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """3x3 rotation matrix of quaternion q."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  r = jnp.stack(
      [
          1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
          2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
          2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
      ],
      axis=-1,
  )
  return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
  """Rotation matrix → quaternion (w,x,y,z); branch-free Shepperd variant."""
  tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
  # four candidate constructions, pick the numerically best
  q0 = jnp.stack(
      [1.0 + tr,
       m[..., 2, 1] - m[..., 1, 2],
       m[..., 0, 2] - m[..., 2, 0],
       m[..., 1, 0] - m[..., 0, 1]], axis=-1)
  q1 = jnp.stack(
      [m[..., 2, 1] - m[..., 1, 2],
       1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
       m[..., 0, 1] + m[..., 1, 0],
       m[..., 0, 2] + m[..., 2, 0]], axis=-1)
  q2 = jnp.stack(
      [m[..., 0, 2] - m[..., 2, 0],
       m[..., 0, 1] + m[..., 1, 0],
       1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
       m[..., 1, 2] + m[..., 2, 1]], axis=-1)
  q3 = jnp.stack(
      [m[..., 1, 0] - m[..., 0, 1],
       m[..., 0, 2] + m[..., 2, 0],
       m[..., 1, 2] + m[..., 2, 1],
       1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2]], axis=-1)
  cands = jnp.stack([q0, q1, q2, q3], axis=-2)
  norms = jnp.sum(cands * cands, axis=-1)
  best = jnp.argmax(norms, axis=-1)
  q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32),
                          axis=-2)[..., 0, :]
  q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
  # canonical sign: w >= 0
  return q * jnp.where(q[..., :1] < 0, -1.0, 1.0).astype(q.dtype)


def axis_angle_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Quaternion for rotation of `angle` about unit `axis`."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def safe_norm(v: jax.Array, eps: float = 1e-12):
  """(norm, unit) with NaN-free gradients at v = 0 (double-where trick)."""
  sq = jnp.sum(v * v, axis=-1, keepdims=True)
  small = sq < eps * eps
  safe_sq = jnp.where(small, 1.0, sq)
  n = jnp.where(small, 0.0, jnp.sqrt(safe_sq))
  unit = v / jnp.where(small, 1.0, jnp.sqrt(safe_sq))
  return n, unit


def quat_integrate(q: jax.Array, omega_local: jax.Array,
                   dt: jax.Array) -> jax.Array:
  """Integrate unit quaternion by body-frame angular velocity for dt.

  Uses the exact exponential map (like MuJoCo's mju_quatIntegrate), with
  NaN-free gradients at ω = 0 (the rollout starts there — the reference
  never differentiates this path, the gradient planner does).
  """
  theta, axis = safe_norm(omega_local)
  dq = axis_angle_quat(axis, (theta * dt)[..., 0])
  small = theta < 1e-12
  dq = jnp.where(small, jnp.asarray([1.0, 0, 0, 0], dtype=q.dtype), dq)
  out = quat_mul(q, dq)
  return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """3-D velocity that takes qb to qa in unit time (local frame).

  Matches MuJoCo's mju_subQuat: the rotation vector of qb⁻¹ ⊗ qa.
  """
  dq = quat_mul(quat_conj(qb), qa)
  # log map (NaN-free gradient at identity)
  sin_half, unit = safe_norm(dq[..., 1:])
  angle = 2.0 * jnp.arctan2(sin_half[..., 0], dq[..., 0])[..., None]
  # wrap to [-pi, pi]
  angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
  return jnp.where(sin_half < 1e-12, dq[..., 1:] * 2.0, unit * angle)


# ----------------------------------------------------------------------------
# spatial algebra — 6-vectors [angular; linear] about world origin
# ----------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
  """Spatial cross product of motion vectors: v ×ₘ m."""
  ang = jnp.cross(v[..., :3], m[..., :3])
  lin = jnp.cross(v[..., :3], m[..., 3:]) + jnp.cross(v[..., 3:], m[..., :3])
  return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial cross product motion × force: v ×ₘ* f."""
  ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
  lin = jnp.cross(v[..., :3], f[..., 3:])
  return jnp.concatenate([ang, lin], axis=-1)


def skew(v: jax.Array) -> jax.Array:
  """3x3 skew-symmetric matrix [v]× with [v]× u = v × u."""
  z = jnp.zeros_like(v[..., 0])
  m = jnp.stack(
      [z, -v[..., 2], v[..., 1],
       v[..., 2], z, -v[..., 0],
       -v[..., 1], v[..., 0], z], axis=-1)
  return m.reshape(v.shape[:-1] + (3, 3))


def spatial_inertia(mass: jax.Array, inertia_com: jax.Array,
                    com: jax.Array) -> jax.Array:
  """6x6 spatial inertia about the world origin.

  Args:
    mass: scalar mass.
    inertia_com: (3,3) world-frame rotational inertia about the CoM.
    com: (3,) world CoM position.

  Returns (6,6):  [[I_c + m·CCᵀ, m·C], [m·Cᵀ, m·1]]  with C = skew(com).
  """
  c = skew(com)
  eye = jnp.eye(3, dtype=com.dtype)
  m_cct = mass[..., None, None] * (c @ c.swapaxes(-1, -2))
  top = jnp.concatenate([inertia_com + m_cct, mass[..., None, None] * c],
                        axis=-1)
  bot = jnp.concatenate(
      [mass[..., None, None] * c.swapaxes(-1, -2),
       mass[..., None, None] * eye], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


def normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
  # sqrt(max(Σv², ε²)), NOT max(‖v‖, ε): ‖·‖'s gradient at v = 0 is 0/0
  # and reverse-mode AD through a degenerate (zero) vector NaNs — e.g.
  # the contact-frame tangents of a far-apart collision pair
  s = jnp.sum(v * v, axis=-1, keepdims=True)
  return v / jnp.sqrt(jnp.maximum(s, eps * eps))
