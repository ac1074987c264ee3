"""Torsional (condim 4) and rolling (condim 6) contact friction.

MuJoCo's contact dimensionality beyond 3 adds angular friction rows
(engine_core_constraint.c contact rows 4-6): a torsional row about the
contact normal capped at friction[1]·fn, and two rolling rows about the
tangents capped at friction[2]·fn (both coefficients have length units).
The reference's manipulation tasks rely on these — e.g. the bimanual
handover object is condim-6 so a pinch grasp is torsionally stable
(/root/reference/mjpc/tasks/bimanual/handover/task.xml).

This engine implements them as extra APGD rows with static layout
(physics/collision.py angular_points, physics/solver.py _angular_rows);
validated here qualitatively (decay vs condim-3 control) and against the
MuJoCo C oracle loosely (soft APGD vs exact Newton on a capped row).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics import tilestep
from mujoco_mpc_tpu.physics.step import step


_SPHERE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"
          friction="1 {tor} {roll}" condim="{condim}"/>
    <body pos="0 0 0.1">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1"
            friction="1 {tor} {roll}" condim="{condim}"/>
    </body>
  </worldbody>
</mujoco>
"""


def _load(xml):
  mj = mujoco.MjModel.from_xml_string(xml)
  m = phys_io.from_mjmodel(mj, dtype=jnp.float64)
  return mj, m


def _run(m, qvel0, n=300):
  d = phys_io.make_data(m).replace(qvel=jnp.asarray(qvel0, jnp.float64))
  s = jax.jit(step)
  for _ in range(n):
    d = s(m, d)
  return d


def test_torsional_friction_decays_spin():
  """condim 4: a sphere spinning about the vertical axis on a plane is
  decelerated by torsional friction; the condim-3 control spins freely."""
  spin = [0, 0, 0, 0, 0, 8.0]
  _, m4 = _load(_SPHERE_XML.format(condim=4, tor=0.05, roll=0))
  d4 = _run(m4, spin)
  _, m3 = _load(_SPHERE_XML.format(condim=3, tor=0.05, roll=0))
  d3 = _run(m3, spin)
  wz4, wz3 = float(d4.qvel[5]), float(d3.qvel[5])
  assert abs(wz3) > 7.5  # control: no torsional row, spin persists
  assert abs(wz4) < 0.7 * abs(wz3)  # torsional row dissipates spin


def test_torsional_friction_oracle_decay_rate():
  """Spin-down rate tracks the MuJoCo oracle (loose: soft APGD row vs
  exact Newton on the capped torsional cone)."""
  spin = [0, 0, 0, 0, 0, 8.0]
  mj, m = _load(_SPHERE_XML.format(condim=4, tor=0.05, roll=0))
  d = _run(m, spin, n=200)
  md = mujoco.MjData(mj)
  md.qvel[:] = spin
  for _ in range(200):
    mujoco.mj_step(mj, md)
  assert abs(float(d.qvel[5]) - md.qvel[5]) < 0.25 * 8.0


def test_rolling_friction_decelerates_ball():
  """condim 6: a rolling ball is decelerated by rolling resistance; the
  condim-3 control keeps rolling at ~constant speed."""
  # rolling without slipping: vx = ω_y · r
  v0 = [1.0, 0, 0, 0, 10.0, 0]
  _, m6 = _load(_SPHERE_XML.format(condim=6, tor=0.0, roll=0.02))
  d6 = _run(m6, v0, n=400)
  _, m3 = _load(_SPHERE_XML.format(condim=3, tor=0.0, roll=0.02))
  d3 = _run(m3, v0, n=400)
  assert float(d3.qvel[0]) > 0.9  # control: rolls on
  assert float(d6.qvel[0]) < 0.75 * float(d3.qvel[0])


def test_condim6_pairs_join_megakernel_class():
  """condim > 3 pairs are IN the tile class since round 4 (torsional +
  rolling rows; tests/test_tilestep_classes.py pins path equivalence)."""
  _, m = _load(_SPHERE_XML.format(condim=6, tor=0.01, roll=0.01))
  tm = tilestep.extract(m)
  tor_pts = [ci for ci, cp in enumerate(tm.con_points) if cp.condim >= 4]
  roll_pts = [ci for ci, cp in enumerate(tm.con_points) if cp.condim == 6]
  assert tor_pts and roll_pts
  # nrow carries the extra angular rows: 3 per point + 1 torsional per
  # condim≥4 point + 2 rolling per condim-6 point
  from mujoco_mpc_tpu.physics import solver
  assert tm.nrow == solver.nrow_static(m)


def test_condim3_layout_unchanged():
  """condim-3 models carry no angular rows: nrow_static == 3·ncon + rest
  (the warm-start buffer layout is unchanged for every existing model)."""
  from mujoco_mpc_tpu.physics import collision, solver

  _, m = _load(_SPHERE_XML.format(condim=3, tor=0.0, roll=0.0))
  assert collision.angular_points(m) == ((), ())
  assert solver.nrow_static(m) == 3 * collision.npoints(m)
