"""Blocked band Cholesky for block-pentadiagonal SPD systems.

The Direct optimizer's Gauss-Newton Hessian over configurations q_{0:T}
couples each timestep to its two neighbours on each side (3-configuration
residual stencils overlapping by two) — a symmetric block-pentadiagonal
matrix. The reference factors this with a scalar band Cholesky
(mju_cholFactorBand, mjpc/direct/direct.cc:2342-2372). Here the
factorization is *blocked*: an O(T) lax.scan over block rows whose inner
ops are nv×nv matmuls/triangular solves — MXU-friendly tiles instead of
scalar loops, O(T·nv²) memory instead of the dense (T·nv)² assembly.

Band layout (block bandwidth 2):
  diag[t]  = A[t, t]     (n, n), SPD after regularization
  off1[t]  = A[t, t-1]   (n, n), off1[0] ignored
  off2[t]  = A[t, t-2]   (n, n), off2[0:2] ignored

Factorization L (same layout, diag lower-triangular):
  L2[t] Ld[t-2]ᵀ = A2[t]
  L1[t] Ld[t-1]ᵀ = A1[t] − L2[t] L1[t-1]ᵀ
  Ld[t] Ld[t]ᵀ   = A0[t] − L1[t] L1[t]ᵀ − L2[t] L2[t]ᵀ
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class BandFactor(NamedTuple):
  diag: jax.Array  # (T, n, n) lower-triangular Cholesky blocks
  off1: jax.Array  # (T, n, n)
  off2: jax.Array  # (T, n, n)


def factor(diag: jax.Array, off1: jax.Array, off2: jax.Array) -> BandFactor:
  """Blocked Cholesky of a symmetric block-pentadiagonal matrix."""
  n = diag.shape[-1]
  eye = jnp.eye(n, dtype=diag.dtype)

  def body(carry, inp):
    ld1, ld2, l1_prev = carry  # Ld[t-1], Ld[t-2], L1[t-1]
    a0, a1, a2 = inp
    # L2[t] = A2[t] Ld[t-2]⁻ᵀ
    l2 = solve_triangular(ld2, a2.T, lower=True).T
    # L1[t] = (A1[t] − L2 L1[t-1]ᵀ) Ld[t-1]⁻ᵀ
    l1 = solve_triangular(ld1, (a1 - l2 @ l1_prev.T).T, lower=True).T
    s = a0 - l1 @ l1.T - l2 @ l2.T
    ld = jnp.linalg.cholesky(0.5 * (s + s.T))
    return (ld, ld1, l1), (ld, l1, l2)

  # t = 0, 1 handled by zero off-blocks and identity "previous" diagonals
  # (their solves produce zeros because a1/a2 are zeroed there)
  off1 = off1.at[0].set(0.0)
  off2 = off2.at[:2].set(0.0)
  init = (eye, eye, jnp.zeros((n, n), dtype=diag.dtype))
  _, (ld, l1, l2) = jax.lax.scan(body, init, (diag, off1, off2))
  return BandFactor(ld, l1, l2)


def solve(f: BandFactor, b: jax.Array) -> jax.Array:
  """Solve A x = b given the band factor. b: (T, n) or (T, n, k)."""
  squeeze = b.ndim == 2
  if squeeze:
    b = b[..., None]
  n, k = b.shape[-2], b.shape[-1]
  zero = jnp.zeros((n, k), dtype=b.dtype)

  # forward: L y = b
  def fwd(carry, inp):
    y1, y2 = carry  # y[t-1], y[t-2]
    ld, l1, l2, bt = inp
    y = solve_triangular(ld, bt - l1 @ y1 - l2 @ y2, lower=True)
    return (y, y1), y

  _, ys = jax.lax.scan(fwd, (zero, zero), (f.diag, f.off1, f.off2, b))

  # backward: Lᵀ x = y  (reverse scan; needs L1[t+1], L2[t+2])
  l1_next = jnp.concatenate([f.off1[1:], jnp.zeros_like(f.off1[:1])])
  l2_next2 = jnp.concatenate([f.off2[2:], jnp.zeros_like(f.off2[:2])])

  def bwd(carry, inp):
    x1, x2 = carry  # x[t+1], x[t+2]
    ld, l1n, l2n, yt = inp
    x = solve_triangular(ld.T, yt - l1n.T @ x1 - l2n.T @ x2, lower=False)
    return (x, x1), x

  _, xs = jax.lax.scan(bwd, (zero, zero), (f.diag, l1_next, l2_next2, ys),
                       reverse=True)
  return xs[..., 0] if squeeze else xs


def assemble_from_stencils(jtj: jax.Array, T: int):
  """Band blocks from per-stencil 3×3 block outer products.

  jtj: (T-2, 3n, 3n) where stencil t couples configurations (t, t+1, t+2).
  Returns (diag, off1, off2) each (T, n, n)."""
  n = jtj.shape[-1] // 3
  ts = jnp.arange(jtj.shape[0])
  blk = jtj.reshape(-1, 3, n, 3, n).transpose(0, 1, 3, 2, 4)  # (T-2,3,3,n,n)
  zero = jnp.zeros((T, n, n), dtype=jtj.dtype)
  diag = (zero.at[ts].add(blk[:, 0, 0])
          .at[ts + 1].add(blk[:, 1, 1])
          .at[ts + 2].add(blk[:, 2, 2]))
  off1 = (zero.at[ts + 1].add(blk[:, 1, 0])
          .at[ts + 2].add(blk[:, 2, 1]))
  off2 = zero.at[ts + 2].add(blk[:, 2, 0])
  return diag, off1, off2


def scatter_grad(jtr: jax.Array, T: int) -> jax.Array:
  """Gradient (T, n) from per-stencil (T-2, 3n) contributions."""
  n = jtr.shape[-1] // 3
  ts = jnp.arange(jtr.shape[0])
  g = jnp.zeros((T, n), dtype=jtr.dtype)
  blk = jtr.reshape(-1, 3, n)
  return (g.at[ts].add(blk[:, 0])
          .at[ts + 1].add(blk[:, 1])
          .at[ts + 2].add(blk[:, 2]))
