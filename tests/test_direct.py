"""Direct optimizer: blocked band Cholesky + model-parameter system ID.

Reference analogs: band factorization (direct.cc:2342-2372), parameter
estimation (test/direct/direct_parameter_test.cc), ModelParameters plug-ins
(direct/model_parameters.h:26-52).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu import physics
from mujoco_mpc_tpu.estimators.direct import (Direct, DirectConfig,
                                              body_mass_parameter,
                                              dof_damping_parameter)
from mujoco_mpc_tpu.ops import band
from tests import models as tm
from tests.test_estimators import _simulate


@pytest.fixture(scope="module")
def pendulum():
  return physics.load_model(tm.PENDULUM, dtype=jnp.float64)


def _random_band_system(T, n, seed=0):
  rng = np.random.RandomState(seed)
  jac = rng.randn(T - 2, 2 * n, 3 * n)  # random stencil Jacobians
  jtj = jnp.asarray(np.einsum("tri,trj->tij", jac, jac))
  diag, off1, off2 = band.assemble_from_stencils(jtj, T)
  diag = diag + 0.5 * jnp.eye(n)  # make SPD
  dense = np.zeros((T * n, T * n))
  for t in range(T):
    dense[t * n:(t + 1) * n, t * n:(t + 1) * n] = np.asarray(diag[t])
    if t >= 1:
      dense[t * n:(t + 1) * n, (t - 1) * n:t * n] = np.asarray(off1[t])
      dense[(t - 1) * n:t * n, t * n:(t + 1) * n] = np.asarray(off1[t]).T
    if t >= 2:
      dense[t * n:(t + 1) * n, (t - 2) * n:(t - 1) * n] = np.asarray(off2[t])
      dense[(t - 2) * n:(t - 1) * n, t * n:(t + 1) * n] = \
          np.asarray(off2[t]).T
  return (diag, off1, off2), dense


def test_band_solve_matches_dense():
  T, n = 9, 4
  (diag, off1, off2), dense = _random_band_system(T, n)
  rng = np.random.RandomState(1)
  b = rng.randn(T, n)
  f = band.factor(diag, off1, off2)
  x_band = np.asarray(band.solve(f, jnp.asarray(b))).ravel()
  x_dense = np.linalg.solve(dense, b.ravel())
  np.testing.assert_allclose(x_band, x_dense, rtol=1e-8, atol=1e-9)


def test_band_solve_multiple_rhs():
  T, n, k = 7, 3, 5
  (diag, off1, off2), dense = _random_band_system(T, n, seed=3)
  rng = np.random.RandomState(2)
  B = rng.randn(T, n, k)
  f = band.factor(diag, off1, off2)
  X = np.asarray(band.solve(f, jnp.asarray(B)))
  X_dense = np.linalg.solve(dense, B.reshape(T * n, k))
  np.testing.assert_allclose(X.reshape(T * n, k), X_dense,
                             rtol=1e-8, atol=1e-9)


def test_direct_band_matches_dense_path(pendulum):
  """The O(T) band path must agree with the dense fallback."""
  m = pendulum
  T = 12
  ctrls, sensors, qs, _ = _simulate(m, T, ctrl_scale=0.5)
  sensors = jnp.stack(sensors)
  ctrls = jnp.stack(ctrls)
  rng = np.random.RandomState(11)
  q_noisy = jnp.asarray(qs + rng.normal(0, 0.04, qs.shape))

  res_b = jax.jit(Direct(m, DirectConfig(
      horizon=T, max_iterations=4, solver="band")).optimize)(
          q_noisy, sensors, ctrls)
  res_d = jax.jit(Direct(m, DirectConfig(
      horizon=T, max_iterations=4, solver="dense")).optimize)(
          q_noisy, sensors, ctrls)
  np.testing.assert_allclose(np.asarray(res_b.qpos), np.asarray(res_d.qpos),
                             rtol=1e-6, atol=1e-8)


def test_direct_identifies_damping_and_mass(pendulum):
  """Two-parameter system ID through the arrowhead Gauss-Newton
  (VERDICT r1 #6 done-criterion; reference direct_parameter_test.cc)."""
  m_true = pendulum
  true_damping = float(np.asarray(m_true.dof_damping[0]))
  true_mass = float(np.asarray(m_true.body_mass[1]))

  T = 24
  ctrls, sensors, qs, _ = _simulate(m_true, T, ctrl_scale=0.8)
  sensors = jnp.stack(sensors)
  ctrls = jnp.stack(ctrls)

  direct = Direct(
      m_true, DirectConfig(horizon=T, max_iterations=12,
                           force_weight=10.0),
      parameters=[
          dof_damping_parameter([0], prior=[true_damping * 3.0],
                                prior_weight=1e-6),
          body_mass_parameter([1], prior=[true_mass * 0.5],
                              prior_weight=1e-6),
      ])
  theta0 = direct.default_parameters()
  res = jax.jit(direct.optimize)(jnp.asarray(qs), sensors, ctrls,
                                 params_init=theta0)
  assert res.parameters is not None
  damping, mass = float(res.parameters[0]), float(res.parameters[1])
  # damping is weakly identified at this window/noise (sensor σ=1e-3):
  # require ≥75% of the 3× prior error removed; mass is sharply identified
  assert abs(damping - true_damping) < 0.25 * abs(
      3.0 * true_damping - true_damping), (damping, true_damping)
  assert abs(mass - true_mass) < 0.1 * true_mass, (mass, true_mass)
  assert float(res.cost) < 0.01 * float(res.cost_initial)
