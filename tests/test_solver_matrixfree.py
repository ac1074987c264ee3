"""Matrix-free vs dense Delassus in the general-path solver.

solver.py keeps two regimes behind tilestep.amat_is_dense(nrow):
materialize A = J M⁻¹ Jᵀ (small nrow) or apply it as J·(M⁻¹Jᵀ·x)
(big nrow — materializing A is HBM-bound: the Rubik plant's nrow=344 A
is 473 KB/candidate re-read every APGD matvec). Both compute the same
operator; the branches differ only in the step-size rule (Gershgorin vs
power iteration), so converged outputs must agree to solver tolerance.
Reference semantics: one solver, mjpc relies on MuJoCo's (no such split
exists there) — this pins OUR two paths to each other.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics import tilestep
from mujoco_mpc_tpu.physics.step import step

# three stacked boxes on a plane: 3 free bodies x multi-point manifolds
# + a limited hinge arm -> nrow comfortably above the dense threshold
STACK = """
<mujoco model="stack">
  <compiler angle="radian"/>
  <option timestep="0.005"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body pos="0 0 0.06">
      <freejoint/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3"/>
    </body>
    <body pos="0.02 0.01 0.17">
      <freejoint/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3"/>
    </body>
    <body pos="-0.01 0.02 0.28">
      <freejoint/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3"/>
    </body>
    <body pos="0.3 0 0.1">
      <joint type="hinge" axis="0 1 0" range="-0.5 0.5"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""


def _rollout(model, n=40):
  d = phys_io.make_data(model)
  stepper = jax.jit(step)
  for _ in range(n):
    d = stepper(model, d)
  return d


def test_matrixfree_matches_dense(monkeypatch):
  model = phys_io.load_model(STACK)
  nrow_seen = []
  orig = tilestep.amat_is_dense

  def spy(nrow):
    nrow_seen.append(nrow)
    return orig(nrow)

  monkeypatch.setattr(tilestep, "amat_is_dense", spy)
  d_mf = _rollout(model)
  assert nrow_seen and max(nrow_seen) > 32, (
      "stack model must exceed the dense threshold to test the "
      "matrix-free branch")

  monkeypatch.setattr(tilestep, "amat_is_dense", lambda nrow: True)
  d_dense = _rollout(model)

  # both settle onto the same contact manifold
  np.testing.assert_allclose(np.asarray(d_mf.qpos),
                             np.asarray(d_dense.qpos), atol=2e-3)
  np.testing.assert_allclose(np.asarray(d_mf.qvel),
                             np.asarray(d_dense.qvel), atol=2e-2)
  assert np.all(np.isfinite(np.asarray(d_mf.qfrc_constraint)))
  # boxes rest near their stacked heights (solver actually did work)
  z = np.asarray(d_mf.qpos)[[2, 9, 16]]
  assert z[0] > 0.04 and z[2] > z[1] > z[0]


def test_matrixfree_gradients_finite():
  """Reverse-mode AD through the matrix-free solve stays finite (the
  gradient/iLQG planners differentiate through it)."""
  model = phys_io.load_model(STACK)
  d0 = phys_io.make_data(model)

  def loss(qvel):
    d = d0.replace(qvel=qvel)
    d = step(model, d)
    return jnp.sum(d.qpos ** 2)

  g = jax.jit(jax.grad(loss))(d0.qvel)
  assert np.all(np.isfinite(np.asarray(g)))
