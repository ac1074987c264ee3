"""Convex norms with analytic gradients and Hessians.

The eight norms of the reference (mjpc/norm.cc:61-200, enum mjpc/norm.h:24),
re-implemented as vectorized jnp functions. `norm_value` maps a residual
block to a scalar; `norm_grad_hess` returns the closed-form derivatives used
by Gauss-Newton cost expansions (gradient/iLQG planners, direct optimizer).
Autodiff works through everything as well — the closed forms just avoid
materializing per-term jacobians in the hot Riccati path.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp


class NormType(enum.IntEnum):
  """Values match the reference XML convention (sensor user[0]),
  including the gap at 4 the reference keeps for backward compatibility
  (mjpc/norm.h:24-36) — reference task XMLs parse unchanged."""
  NULL = -1
  QUADRATIC = 0
  L22 = 1
  L2 = 2
  COSH = 3
  POWER_LOSS = 5
  SMOOTH_ABS = 6
  SMOOTH_ABS2 = 7
  RECTIFY = 8


def num_norm_params(norm: NormType) -> int:
  """Parameter count per norm (reference NormParameterDimension)."""
  return {
      NormType.NULL: 0, NormType.QUADRATIC: 0, NormType.L22: 2,
      NormType.L2: 1, NormType.COSH: 1, NormType.POWER_LOSS: 1,
      NormType.SMOOTH_ABS: 1, NormType.SMOOTH_ABS2: 2, NormType.RECTIFY: 1,
  }[NormType(norm)]


def norm_value(x: jax.Array, norm: NormType, p: float = 0.0,
               q: float = 0.0) -> jax.Array:
  """Scalar norm of residual block x (last axis reduced)."""
  norm = NormType(norm)
  if norm == NormType.NULL:
    return x[..., 0]
  if norm == NormType.QUADRATIC:
    return 0.5 * jnp.sum(x * x, axis=-1)
  if norm == NormType.L22:
    c = jnp.sum(x * x, axis=-1)
    s = jnp.power(jnp.power(c, q / 2) + p ** q, 1.0 / q)
    return s - p
  if norm == NormType.L2:
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + p * p) - p
  if norm == NormType.COSH:
    return jnp.sum(p * p * (jnp.cosh(x / p) - 1.0), axis=-1)
  if norm == NormType.POWER_LOSS:
    return jnp.sum(jnp.power(jnp.abs(x), p), axis=-1)
  if norm == NormType.SMOOTH_ABS:
    return jnp.sum(jnp.sqrt(x * x + p * p) - p, axis=-1)
  if norm == NormType.SMOOTH_ABS2:
    return jnp.sum(
        jnp.power(jnp.power(jnp.abs(x), q) + p ** q, 1.0 / q) - p, axis=-1)
  if norm == NormType.RECTIFY:
    # trace-safe p (runtime-tunable): softplus when p>0, relu otherwise
    p_arr = jnp.asarray(p)
    safe_p = jnp.maximum(p_arr, 1e-10)
    soft = jnp.sum(safe_p * jnp.log1p(jnp.exp(x / safe_p)), axis=-1)
    hard = jnp.sum(jnp.maximum(x, 0.0), axis=-1)
    return jnp.where(p_arr > 0, soft, hard)
  raise ValueError(f"unknown norm {norm}")


def norm_grad_hess(x: jax.Array, norm: NormType, p: float = 0.0,
                   q: float = 0.0) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """(value, gradient (n,), Gauss-Newton Hessian (n,n)) of a norm."""
  norm = NormType(norm)
  n = x.shape[-1]
  eye = jnp.eye(n, dtype=x.dtype)
  if norm == NormType.NULL:
    return x[..., 0], jnp.ones_like(x), jnp.zeros((n, n), dtype=x.dtype)
  if norm == NormType.QUADRATIC:
    return 0.5 * jnp.sum(x * x, axis=-1), x, eye
  if norm == NormType.L22:
    c = jnp.sum(x * x, axis=-1)
    d = jnp.power(jnp.maximum(c, 1e-15), q / 2 - 1)
    a = jnp.power(jnp.maximum(c, 1e-15), q / 2) + p ** q
    s = jnp.power(a, 1.0 / q)
    b = s / a * d
    g = b * x
    cc = (1 - q) * d / a + (q - 2) / jnp.maximum(c, 1e-15)
    h = b * (eye + jnp.outer(x, x) * cc)
    return s - p, g, h
  if norm == NormType.L2:
    s = jnp.sqrt(jnp.sum(x * x, axis=-1) + p * p)
    safe = jnp.maximum(s, 1e-15)
    g = x / safe
    h = (eye - jnp.outer(g, g)) / safe
    return s - p, g, h
  if norm == NormType.COSH:
    v = jnp.sum(p * p * (jnp.cosh(x / p) - 1.0), axis=-1)
    return v, p * jnp.sinh(x / p), jnp.diag(jnp.cosh(x / p))
  if norm == NormType.POWER_LOSS:
    s = jnp.abs(x)
    v = jnp.sum(jnp.power(s, p), axis=-1)
    g = jnp.sign(x) * p * jnp.power(s, p - 1)
    h = jnp.diag((p - 1) * p * jnp.power(s, p - 2))
    return v, g, h
  if norm == NormType.SMOOTH_ABS:
    s = jnp.sqrt(x * x + p * p)
    g = x / jnp.maximum(s, 1e-15)
    h = jnp.diag((1 - g * g) / jnp.maximum(s, 1e-15))
    return jnp.sum(s - p, axis=-1), g, h
  if norm == NormType.SMOOTH_ABS2:
    a = jnp.abs(x)
    dd = jnp.power(a, q)
    e = dd + p ** q
    s = jnp.power(e, 1.0 / q)
    c = s * jnp.power(jnp.maximum(a, 1e-15), q - 2) / e
    g = c * x
    h = jnp.diag(c * (q - 1) * (1 - dd / e))
    return jnp.sum(s - p, axis=-1), g, h
  if norm == NormType.RECTIFY:
    # branch-free on p (runtime-tunable → traced under jit; an `if p>0`
    # raised TracerBoolConversionError in the iLQG cost expansion), with
    # the overflow-stable softplus/sigmoid forms
    p_arr = jnp.asarray(p)
    safe_p = jnp.maximum(p_arr, 1e-10)
    z = x / safe_p
    v_soft = jnp.sum(
        safe_p * (jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(z)))),
        axis=-1)
    sig = jax.nn.sigmoid(z)
    g_soft = sig
    h_soft = jnp.diag(sig * (1.0 - sig) / safe_p)
    v_hard = jnp.sum(jnp.maximum(x, 0.0), axis=-1)
    g_hard = (x > 0).astype(x.dtype)
    use_soft = p_arr > 0
    return (jnp.where(use_soft, v_soft, v_hard),
            jnp.where(use_soft, g_soft, g_hard),
            jnp.where(use_soft, h_soft, jnp.zeros((n, n), dtype=x.dtype)))
  raise ValueError(f"unknown norm {norm}")
