"""Fixed tendons + equality constraints vs the MuJoCo C oracle.

MuJoCo features the reference gets for free (SURVEY §1 L0) that real
Shadow/ALOHA models use: tendon-coupled fingers (fixed tendons), tendon
limits/springs, and connect/weld/joint equality (VERDICT r2 missing #4).
Smooth paths (tendon kinematics, transmission, springs) are exact-parity
at f64; constraint rows go through this engine's deliberately different
soft APGD solver and are validated for constraint satisfaction +
trajectory closeness.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import dynamics as pdyn
from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics import tilestep
from mujoco_mpc_tpu.physics.step import forward, step


_TENDON_XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.005"/>
  <default><geom contype="0" conaffinity="0"/></default>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0 0 -0.3" mass="1"/>
      <body name="b" pos="0 0 -0.3">
        <joint name="j2" type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0 0 -0.3" mass="1"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1" {attr}>
      <joint joint="j1" coef="1.0"/>
      <joint joint="j2" coef="-0.7"/>
    </fixed>
  </tendon>
  {extra}
</mujoco>
"""


def _load(xml):
  mj = mujoco.MjModel.from_xml_string(xml)
  m = phys_io.from_mjmodel(mj, dtype=jnp.float64)
  return mj, m


def test_tendon_length_velocity_oracle():
  mj, m = _load(_TENDON_XML.format(attr="", extra=""))
  d = phys_io.make_data(m).replace(
      qpos=jnp.asarray([0.3, -0.5]), qvel=jnp.asarray([0.7, 0.2]))
  ln, vl = pdyn.tendon_lengths(m, d)
  md = mujoco.MjData(mj)
  md.qpos[:] = [0.3, -0.5]
  md.qvel[:] = [0.7, 0.2]
  mujoco.mj_forward(mj, md)
  np.testing.assert_allclose(np.asarray(ln), md.ten_length, atol=1e-12)
  np.testing.assert_allclose(np.asarray(vl), md.ten_velocity, atol=1e-12)


def test_tendon_actuation_oracle():
  """Motor on a tendon: qfrc_actuator matches mj_transmission exactly."""
  mj, m = _load(_TENDON_XML.format(
      attr="", extra='<actuator><motor tendon="t1" gear="2.5"/></actuator>'))
  d = phys_io.make_data(m).replace(ctrl=jnp.asarray([0.4]))
  df = jax.jit(forward)(m, d)
  md = mujoco.MjData(mj)
  md.ctrl[:] = [0.4]
  mujoco.mj_forward(mj, md)
  np.testing.assert_allclose(np.asarray(df.qfrc_actuator),
                             md.qfrc_actuator, atol=1e-12)
  np.testing.assert_allclose(np.asarray(df.actuator_force),
                             md.actuator_force, atol=1e-12)


def test_tendon_position_servo_trajectory_parity():
  """Position actuator on a tendon (Shadow-style): f64 trajectory parity
  on the smooth path (no limits engaged)."""
  extra = ('<actuator><position tendon="t1" kp="8" gear="1" '
           'ctrlrange="-1 1"/></actuator>')
  mj, m = _load(_TENDON_XML.format(attr="", extra=extra))
  d = phys_io.make_data(m).replace(ctrl=jnp.asarray([0.5]))
  md = mujoco.MjData(mj)
  md.ctrl[:] = [0.5]
  s = jax.jit(step)
  for _ in range(100):
    d = s(m, d)
    mujoco.mj_step(mj, md)
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=5e-4)


def test_tendon_spring_damper_trajectory_parity():
  mj, m = _load(_TENDON_XML.format(
      attr='stiffness="5" damping="0.8" springlength="0.1 0.1"', extra=""))
  d = phys_io.make_data(m).replace(qvel=jnp.asarray([1.0, -0.5]))
  md = mujoco.MjData(mj)
  md.qvel[:] = [1.0, -0.5]
  s = jax.jit(step)
  for _ in range(200):
    d = s(m, d)
    mujoco.mj_step(mj, md)
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=2e-3)


def test_tendon_limit_engages():
  """Limited tendon: a constant motor pull cannot stretch past the range
  (soft limit, small overshoot allowed)."""
  mj, m = _load(_TENDON_XML.format(
      attr='limited="true" range="-0.25 0.25"',
      extra='<actuator><motor tendon="t1" gear="1" '
            'ctrlrange="-10 10"/></actuator>'))
  d = phys_io.make_data(m).replace(ctrl=jnp.asarray([6.0]))
  s = jax.jit(step)
  for _ in range(400):
    d = s(m, d)
  ln, _ = pdyn.tendon_lengths(m, d)
  assert float(ln[0]) < 0.30  # soft limit holds (range hi = 0.25)
  assert bool(jnp.all(jnp.isfinite(d.qpos)))


_CHAIN_XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <default><geom contype="0" conaffinity="0"/></default>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="1"/>
      <body name="tip_a" pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.5"/>
      </body>
    </body>
    <body name="c" pos="0.5 0 1">
      <joint name="j3" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0 0 -0.2" mass="0.5"/>
    </body>
  </worldbody>
  <equality>{eq}</equality>
</mujoco>
"""


def test_connect_equality_closes_chain():
  """Closed kinematic chain: anchors stay coincident through the swing and
  the trajectory tracks MuJoCo."""
  mj, m = _load(_CHAIN_XML.format(
      eq='<connect body1="tip_a" body2="c" anchor="0.2 0 0"/>'))
  d = phys_io.make_data(m)
  md = mujoco.MjData(mj)
  s = jax.jit(step)
  from mujoco_mpc_tpu.physics import math as pmath
  b1, b2 = m.body("tip_a"), m.body("c")
  for _ in range(500):
    d = s(m, d)
    mujoco.mj_step(mj, md)
  df = jax.jit(forward)(m, d)
  p1 = df.xpos[b1] + pmath.quat_rot(df.xquat[b1], m.eq_data[0, 0:3])
  p2 = df.xpos[b2] + pmath.quat_rot(df.xquat[b2], m.eq_data[0, 3:6])
  assert float(jnp.linalg.norm(p1 - p2)) < 5e-3  # soft anchor coincidence
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=0.05)


def test_weld_equality_locks_pose():
  mj, m = _load(_CHAIN_XML.format(eq='<weld body1="tip_a" body2="c"/>'))
  d = phys_io.make_data(m)
  md = mujoco.MjData(mj)
  s = jax.jit(step)
  for _ in range(500):
    d = s(m, d)
    mujoco.mj_step(mj, md)
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=0.05)
  # relative orientation of the welded pair stays locked
  df = jax.jit(forward)(m, d)
  from mujoco_mpc_tpu.physics import math as pmath
  rel = pmath.quat_sub(df.xquat[m.body("tip_a")], df.xquat[m.body("c")])
  assert float(jnp.linalg.norm(rel)) < 0.05


def test_joint_equality_polynomial_coupling():
  mj, m = _load(_TENDON_XML.format(
      attr="", extra='<equality><joint joint1="j1" joint2="j2" '
                     'polycoef="0 0.5 0 0 0"/></equality>'))
  d = phys_io.make_data(m).replace(qvel=jnp.asarray([0.5, -0.2]))
  s = jax.jit(step)
  md = mujoco.MjData(mj)
  md.qvel[:] = [0.5, -0.2]
  for _ in range(300):
    d = s(m, d)
    mujoco.mj_step(mj, md)
  # coupling q1 = 0.5 q2 holds softly and tracks the oracle
  assert abs(float(d.qpos[0] - 0.5 * d.qpos[1])) < 5e-3
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=0.02)


def test_tendon_equality_models_join_megakernel_class():
  """Round 4: tendons/equality are IN the tile kernel class (row-class
  extension, tests/test_tilestep_classes.py pins path equivalence)."""
  _, m = _load(_TENDON_XML.format(
      attr='limited="true" range="-0.25 0.25"',
      extra='<equality><joint joint1="j1" joint2="j2" '
            'polycoef="0 0.5 0 0 0"/></equality>'))
  tm = tilestep.extract(m)
  assert tm.nlim == 2 and tm.neq_rows == 1


def test_gradients_flow_through_tendon_equality_step():
  """The derivative planners need NaN-free gradients through the new
  constraint rows."""
  _, m = _load(_TENDON_XML.format(
      attr='limited="true" range="-0.25 0.25" stiffness="2"',
      extra='<equality><joint joint1="j1" joint2="j2" '
            'polycoef="0 0.5 0 0 0"/></equality>'))
  d0 = phys_io.make_data(m)

  def loss(qvel0):
    d = d0.replace(qvel=qvel0)
    for _ in range(5):
      d = step(m, d)
    return jnp.sum(d.qpos ** 2)

  g = jax.grad(loss)(jnp.asarray([0.4, -0.1]))
  assert bool(jnp.all(jnp.isfinite(g)))
  assert float(jnp.linalg.norm(g)) > 0
