"""Locomotion + bimanual task parity tests.

Quadruped: gait FSM semantics (reference quadruped.cc:229-345) as pure
userdata functions — auto gait switching from filtered CoM speed, phase
continuity across cadence changes, mode gating, gait-dependent weights.
Humanoid: walk.cc-parity residual structure. Bimanual: handover residual +
success/fall/timeout FSM (handover.cc:134-185).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import forward as phys_forward
from mujoco_mpc_tpu.tasks import base as task_base
from mujoco_mpc_tpu.tasks import quadruped as Q
from mujoco_mpc_tpu.tasks import registry


def _home_data(task):
  d = phys_io.make_data(task.model)
  qpos, _, _ = task.model.keyframe("home")
  d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype))
  return phys_forward(task.model, d)


# ----------------------------------------------------------------- quadruped
def test_quadruped_residual_structure():
  task = registry.get_task("Quadruped Flat")
  d = _home_data(task)
  r = task.residual(task.model, d, task.params.residual_params)
  assert r.shape == (task.spec.nresidual,) == (42,)
  assert bool(jnp.all(jnp.isfinite(r)))
  assert task.mode_names == ("Quadruped", "Biped", "Walk", "Scramble",
                             "Flip")


def test_quadruped_auto_gait_switches_with_speed():
  task = registry.get_task("Quadruped Flat")
  d = _home_data(task)
  trans = jax.jit(task.run_transition)

  # standing still → gait settles at stand
  d1 = trans(d.replace(time=d.time + 2.0))
  assert int(d1.userdata[0]) == Q.GAIT_STAND

  # moderate forward motion → filtered speed lands in the trot band
  # (0.02 < v ≤ 0.6, reference kGaitAuto)
  d_fast = d1.replace(
      qvel=d1.qvel.at[0].set(0.3),
      time=d1.time + 2.0)  # exceed kAutoGaitMinTime since last switch
  d_fast = phys_forward(task.model, d_fast)
  for _ in range(6):  # let the EMA speed filter converge
    d_fast = trans(d_fast.replace(time=d_fast.time + 1.2))
  assert int(d_fast.userdata[0]) == Q.GAIT_TROT

  # galloping speed
  d_gallop = d_fast.replace(qvel=d_fast.qvel.at[0].set(3.0))
  d_gallop = phys_forward(task.model, d_gallop)
  for _ in range(6):
    d_gallop = trans(d_gallop.replace(time=d_gallop.time + 1.2))
  assert int(d_gallop.userdata[0]) == Q.GAIT_GALLOP


def test_quadruped_phase_continuity_across_gait_switch():
  task = registry.get_task("Quadruped Flat")
  d = _home_data(task)
  trans = jax.jit(task.run_transition)
  d = trans(d.replace(time=d.time + 0.5))
  phase_before = Q._get_phase(d.userdata, d.time)
  # force a cadence change: trot (2 Hz) → stand had 1 Hz at init
  d2 = trans(d.replace(qvel=d.qvel.at[0].set(1.5), time=d.time + 1.5))
  phase_at_switch = Q._get_phase(d2.userdata, d2.time)
  # phase clock stays finite and monotone (no jump back below pre-switch)
  assert float(phase_at_switch) >= float(phase_before) - 1e-6


def test_quadruped_mode_gating_and_weight_mod():
  task = registry.get_task("Quadruped Flat")
  d = _home_data(task)
  trans = jax.jit(task.run_transition)
  # Walk can only be entered from Quadruped: set Scramble, then ask Walk
  d = task.set_mode(d, Q.MODE_SCRAMBLE)
  d = trans(d.replace(time=d.time + 0.1))
  assert int(d.userdata[16]) == Q.MODE_SCRAMBLE
  d = task.set_mode(d, Q.MODE_WALK)
  d = trans(d.replace(time=d.time + 0.1))
  assert int(d.userdata[16]) == Q.MODE_QUADRUPED  # gated

  # weight_mod: stand zeroes the balance weight, trot enables it
  d_stand = d.replace(userdata=d.userdata.at[0].set(float(Q.GAIT_STAND)))
  scale = task.weight_mod(task.model, d_stand, task.params.residual_params)
  assert float(scale[Q._T_BALANCE]) == 0.0
  d_trot = d.replace(userdata=d.userdata.at[0].set(float(Q.GAIT_TROT)))
  scale = task.weight_mod(task.model, d_trot, task.params.residual_params)
  assert abs(float(scale[Q._T_BALANCE]) - 0.2) < 1e-6


def test_quadruped_walk_mode_moves_goal():
  task = registry.get_task("Quadruped Flat")
  d = _home_data(task)
  trans = jax.jit(task.run_transition)
  d = task.set_mode(d, Q.MODE_WALK)
  d = trans(d.replace(time=d.time + 0.1))
  assert int(d.userdata[16]) == Q.MODE_WALK
  goal0 = np.asarray(d.mocap_pos[0])
  d2 = trans(d.replace(time=d.time + 1.0))
  goal1 = np.asarray(d2.mocap_pos[0])
  # straight walk at 1 m/s moves the goal ~1 m along the heading
  assert np.linalg.norm(goal1[:2] - goal0[:2]) > 0.5


# ------------------------------------------------------------------ humanoid
def test_humanoid_walk_residual_structure():
  task = registry.get_task("Humanoid Walk")
  d = _home_data(task)
  r = task.residual(task.model, d, task.params.residual_params)
  assert r.shape == (task.spec.nresidual,) == (57,)  # full-DOF humanoid
  assert bool(jnp.all(jnp.isfinite(r)))
  # standing at home: capture point inside the support segment → balance ≈ 0
  assert float(jnp.linalg.norm(r[2:4])) < 0.1
  # cost spec names match the reference walk task
  assert task.spec.names == ("Height", "Pelvis/Feet", "Balance", "Upright",
                             "Posture", "Walk", "Velocity", "Control")


def test_humanoid_standing_gate_kills_terms_when_fallen():
  task = registry.get_task("Humanoid Walk")
  d = _home_data(task)
  # lay the torso at the floor: standing ≈ 0 → balance/feet terms gated off
  qpos = d.qpos.at[2].set(0.2)
  d_f = phys_forward(task.model, d.replace(qpos=qpos))
  r = task.residual(task.model, d_f, task.params.residual_params)
  standing = 0.2 / np.sqrt(0.2 ** 2 + 0.45 ** 2) - 0.4
  assert standing < 0.01
  assert float(jnp.linalg.norm(r[2:4])) < 0.3  # balance scaled by ~0


# ------------------------------------------------------------------ bimanual
def test_bimanual_residual_and_grasp_term():
  task = registry.get_task("Bimanual Handover")
  d = _home_data(task)
  r = task.residual(task.model, d, task.params.residual_params)
  assert r.shape == (task.spec.nresidual,) == (22,)
  # no contact at home → grasp term is exactly 1 (handover.cc:100-116)
  assert abs(float(r[6]) - 1.0) < 1e-6
  assert bool(jnp.all(jnp.isfinite(r)))


def test_bimanual_transition_fsm():
  task = registry.get_task("Bimanual Handover")
  m = task.model
  d = _home_data(task)
  trans = jax.jit(task.run_transition)

  # success: box at target → target relocates, counter increments
  box_body = m.body("box")
  target = np.asarray(d.xpos[box_body])
  d1 = d.replace(mocap_pos=d.mocap_pos.at[0].set(jnp.asarray(
      target, dtype=d.qpos.dtype)), time=d.time + 1.0)
  d1 = phys_forward(m, d1)
  d2 = trans(d1)
  assert float(d2.userdata[0]) == 1.0
  assert not np.allclose(np.asarray(d2.mocap_pos[0]), target)

  # fall: box below the table → reset to keyframe
  qfall = d.qpos.at[14].set(-0.5)
  d3 = trans(phys_forward(m, d.replace(qpos=qfall)))
  key_qpos = np.asarray(m.keyframe("home")[0])
  np.testing.assert_allclose(np.asarray(d3.qpos[12:19]), key_qpos[12:19],
                             atol=1e-6)

  # timeout: no solve for >30 s → arms reset to keyframe
  qarm = d.qpos.at[0].set(1.0)
  d4 = trans(phys_forward(m, d.replace(qpos=qarm, time=d.time + 40.0)))
  np.testing.assert_allclose(np.asarray(d4.qpos[:12]), key_qpos[:12],
                             atol=1e-6)


def test_quadruped_hill_hfield_contacts():
  """Heightfield narrowphase: the quadruped rests on procedural terrain
  and the gait residual tracks ground height (reference task_hill.xml)."""
  task = registry.get_task("Quadruped Hill")
  m = task.model
  assert m.hfield_nrow == 64 and m.hfield_ncol == 64
  d = _home_data(task)
  r = task.residual(m, d, task.params.residual_params)
  assert bool(jnp.all(jnp.isfinite(r)))
  step = jax.jit(__import__("mujoco_mpc_tpu.physics", fromlist=["x"]).step)
  for _ in range(150):
    d = step(m, d)
  # settles upright on the terrain, does not fall through the hfield
  assert 0.2 < float(d.qpos[2]) < 0.6
  assert bool(jnp.all(jnp.isfinite(d.qpos)))
  # ground query: uphill point is higher than the start pad
  pts = jnp.asarray([[0.0, 0.0, 0.0], [4.0, 0.0, 0.0]], dtype=d.qpos.dtype)
  g = Q._ground_under(m, d, pts)
  assert float(g[1]) > float(g[0]) + 0.1


def test_pickandplace_residual_and_fsm():
  """PickAndPlace (Panda bring): 6-DoF pose bring + two-phase FSM
  (reference manipulation.cc:31-101)."""
  task = registry.get_task("PickAndPlace")
  d = _home_data(task)
  r = task.residual(task.model, d, task.params.residual_params)
  assert r.shape == (task.spec.nresidual,) == (20,)
  assert bool(jnp.all(jnp.isfinite(r)))
  # phase 0: reach weight on, away weight off
  scale = task.weight_mod(task.model, d, task.params.residual_params)
  assert float(scale[0]) == 1.0 and float(scale[3]) == 0.0
  # teleport object onto the target → transition flips to away phase
  obj_q = d.qpos.at[7:10].set(d.mocap_pos[0]).at[10:14].set(
      d.mocap_quat[0])
  d2 = phys_forward(task.model, d.replace(qpos=obj_q, time=d.time + 0.1))
  d2 = task.run_transition(d2)
  assert float(d2.userdata[0]) == 1.0
  scale2 = task.weight_mod(task.model, d2, task.params.residual_params)
  assert float(scale2[0]) == 0.0 and float(scale2[3]) == 1.0


def test_mode_register_roundtrip():
  task = registry.get_task("Quadruped Flat")
  d = phys_io.make_data(task.model)
  d = task.set_mode(d, 2)
  assert int(task.get_mode(d)) == 2
  assert task_base.MODE_SLOT == 15


# ------------------------------------------------------------ quadruped flip
def test_flip_choreography_curves():
  """FlipHeight/FlipQuat closed forms (reference quadruped.cc:682-720):
  continuous, start/end at stand height, monotonic 0→2π rotation."""
  ts = np.linspace(0.0, Q._FLIP_TOTAL_TIME, 400)
  h = np.asarray(jax.vmap(Q._flip_height)(jnp.asarray(ts)))
  a = np.asarray(jax.vmap(Q._flip_angle)(jnp.asarray(ts)))
  assert abs(h[0] - Q._HEIGHT_QUADRUPED) < 1e-6
  assert abs(h[-1] - Q._HEIGHT_QUADRUPED) < 5e-2  # land decel ends at stand
  assert h.max() > 0.9 * Q._MAX_HEIGHT  # apex reaches the leap target
  assert h.min() > 0.9 * Q._CROUCH_HEIGHT - 1e-6  # crouch floor
  assert abs(a[0]) < 1e-6 and abs(a[-1] - 2 * np.pi) < 5e-2
  # monotonic rotation (tiny end-of-land decel overshoot allowed — the
  # reference's closed form has the same ±0.01 rad wiggle at touchdown)
  assert np.all(np.diff(a) >= -0.01)
  # piecewise segments are continuous (no jumps > small step bound)
  assert np.max(np.abs(np.diff(h))) < 0.05
  assert np.max(np.abs(np.diff(a))) < 0.15


def test_flip_mode_fsm_and_residual():
  """Entering Flip saves orientation/ground/start-time in userdata; the
  residual tracks the choreography; the FSM exits back to Quadruped after
  the total flip time (reference quadruped.cc:350-390)."""
  task = registry.get_task("Quadruped Flat")
  d = _home_data(task)
  d = task.set_mode(d, Q.MODE_FLIP)
  d = d.replace(time=d.time + 0.01)
  d2 = task.run_transition(d)
  u = np.asarray(d2.userdata)
  assert int(u[16]) == Q.MODE_FLIP
  assert abs(u[8] - float(d.time)) < 1e-6  # mode start time saved
  np.testing.assert_allclose(u[17:21], np.asarray(d.xquat[
      task.model.body("trunk")]), atol=1e-6)  # orientation saved

  # residual at flip start: upright tracks q_start (≈0), height ≈ stand
  r = task.residual(task.model, d2, task.params.residual_params)
  assert bool(jnp.all(jnp.isfinite(r)))
  np.testing.assert_allclose(np.asarray(r[:3]), 0.0, atol=0.05)

  # weight_mod: flip overrides (Position/Gait/Balance → 0)
  w = np.asarray(task.weight_mod(task.model, d2,
                                 task.params.residual_params))
  assert w[2] == 0.0 and w[3] == 0.0 and w[4] == 0.0
  assert w[1] > 1.0  # height dominates

  # after the choreography completes the FSM returns to Quadruped
  d3 = d2.replace(time=d2.time + Q._FLIP_TOTAL_TIME + 0.1)
  d4 = task.run_transition(d3)
  assert int(np.asarray(d4.userdata)[16]) == Q.MODE_QUADRUPED


def test_flip_only_from_quadruped():
  """Forbidden transition: Biped → Flip is rejected (quadruped.cc:240-248
  gating extended to the stateful modes)."""
  task = registry.get_task("Quadruped Flat")
  d = _home_data(task)
  d = task.set_mode(d, Q.MODE_BIPED)
  d = d.replace(time=d.time + 0.01)
  d = task.run_transition(d)
  assert int(np.asarray(d.userdata)[16]) == Q.MODE_BIPED
  d = task.set_mode(d, Q.MODE_FLIP)
  d = d.replace(time=d.time + 0.01)
  d = task.run_transition(d)
  assert int(np.asarray(d.userdata)[16]) == Q.MODE_QUADRUPED


def test_humanoid_track_recorded_clip():
  """The recorded-from-sim marker clip (assets/clips/strider.npz, made by
  tools/record_clip.py) loads as a Track mode with finite residuals —
  the shippable analogue of the reference's CMU keyframe data
  (tracking.cc:28-141)."""
  task = registry.get_task("Humanoid Track")
  assert "Strider" in task.mode_names
  d = phys_io.make_data(task.model)
  d = task.set_mode(d, task.mode_names.index("Strider"))
  d = task.run_transition(d)
  d = phys_forward(task.model, d)
  r = task.residual(task.model, d, task.params.residual_params)
  assert bool(jnp.all(jnp.isfinite(r)))
  # the clip's average marker stays within the walk envelope
  from mujoco_mpc_tpu.tasks import humanoid_track as HT
  clip = HT._CLIPS[task.mode_names.index("Strider")]
  assert clip.shape[1] == HT._NM
  assert clip[:, 0, 2].min() > 0.4  # pelvis never below 0.4 m (no fall)
