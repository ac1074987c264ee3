"""Fixed-size time splines for control policies.

Device-friendly equivalent of the reference's TimeSpline ring buffer
(mjpc/spline/spline.h:30, spline.cc:103-160): a policy is (times (k,),
values (k, dim)) arrays of static size; sampling is a vectorized
searchsorted + gather, differentiable w.r.t. values (the gradient planner
backpropagates through it) and vmappable over batches of policies.

Interpolation semantics match the reference: clamp outside the node range;
ZERO holds the lower node; LINEAR lerps; CUBIC is a Hermite spline with
finite-difference slopes (one-sided at the ends).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class Interp(enum.IntEnum):
  ZERO = 0
  LINEAR = 1
  CUBIC = 2


def sample(times: jax.Array, values: jax.Array, t: jax.Array,
           interp: Interp) -> jax.Array:
  """Sample the spline at scalar time t → (dim,)."""
  k = times.shape[0]
  if k == 1:
    return values[0]
  # lower index of the bracketing interval, clamped to [0, k-2]
  upper = jnp.searchsorted(times, t, side="right")
  lo = jnp.clip(upper - 1, 0, k - 2)
  t0, t1 = times[lo], times[lo + 1]
  p0, p1 = values[lo], values[lo + 1]
  # clamp to range (reference returns boundary node values outside)
  below = t <= times[0]
  above = t >= times[k - 1]

  if interp == Interp.ZERO:
    out = p0
  elif interp == Interp.LINEAR:
    s = (t - t0) / jnp.maximum(t1 - t0, 1e-10)
    s = jnp.clip(s, 0.0, 1.0)
    out = p0 * (1 - s) + p1 * s
  else:  # CUBIC Hermite, finite-difference slopes
    def slope(i):
      im1 = jnp.clip(i - 1, 0, k - 1)
      ip1 = jnp.clip(i + 1, 0, k - 1)
      left = (values[i] - values[im1]) / jnp.maximum(
          times[i] - times[im1], 1e-10)
      right = (values[ip1] - values[i]) / jnp.maximum(
          times[ip1] - times[i], 1e-10)
      # interior: average of one-sided slopes; ends: the one-sided slope
      w_l = jnp.where(i > 0, 0.5, 0.0)
      w_r = jnp.where(i < k - 1, 0.5, 0.0)
      tot = jnp.maximum(w_l + w_r, 0.5)
      return (w_l * left + w_r * right) / tot

    m0, m1 = slope(lo), slope(lo + 1)
    h = t1 - t0
    s = jnp.clip((t - t0) / jnp.maximum(h, 1e-10), 0.0, 1.0)
    s2, s3 = s * s, s * s * s
    out = ((2 * s3 - 3 * s2 + 1) * p0 + (s3 - 2 * s2 + s) * h * m0 +
           (-2 * s3 + 3 * s2) * p1 + (s3 - s2) * h * m1)

  out = jnp.where(below, values[0], out)
  out = jnp.where(above, values[k - 1], out)
  return out


def sample_many(times: jax.Array, values: jax.Array, ts: jax.Array,
                interp: Interp) -> jax.Array:
  """Sample at a vector of times → (len(ts), dim)."""
  return jax.vmap(lambda t: sample(times, values, t, interp))(ts)


def resample(times: jax.Array, values: jax.Array, new_times: jax.Array,
             interp: Interp) -> jax.Array:
  """Re-express the spline on a new time grid (UpdateNominalPolicy,
  reference mjpc/planners/sampling/planner.cc:240-323)."""
  return sample_many(times, values, new_times, interp)
