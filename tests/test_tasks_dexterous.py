"""Dexterous-family tasks: Shadow hand-reorient + Rubik solve FSM.

Driven end-to-end on TPU (goals reached / scramble solved — see commit
logs); here the FSM semantics and residual structure are pinned cheaply
on CPU, plus short physics sanity rollouts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics import math as pmath
from mujoco_mpc_tpu.physics.step import step as phys_step
from mujoco_mpc_tpu.tasks import registry
from mujoco_mpc_tpu.tasks import rubik as RK


def test_shadow_registered_and_cube_rests_in_hand():
  task = registry.get_task("Shadow")
  m = task.model
  # r4 model: 24 hand joints (2 wrist + FF/MF/RF 4 + LF 5 + TH 5) +
  # free cube (7 qpos), 20 actuators w/ tendon-coupled distal pairs
  assert m.nu == 20 and m.nq == 31
  # residual: 3 pos + 3 ori + 3 vel + 20 act + 24 grasp + 24 jointvel
  assert task.spec.nresidual == 77
  d = phys_io.make_data(m)
  qpos, _, _ = m.keyframe("home")
  d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype))
  step = jax.jit(phys_step)
  for _ in range(400):
    d = step(m, d)
  qadr = m.jnt_qposadr[m.body_jntadr[m.body("cube")]]
  # cube rests on the palm (box-box contact), not on the floor
  assert 0.27 < float(d.qpos[qadr + 2]) < 0.32
  r = task.residual(m, d, task.params.residual_params)
  assert r.shape == (task.spec.nresidual,)
  assert bool(jnp.all(jnp.isfinite(r)))


def test_shadow_transition_advances_goal_and_resets_drop():
  task = registry.get_task("Shadow")
  m = task.model
  d = phys_io.make_data(m)
  qpos, _, _ = m.keyframe("home")
  d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype))
  trans = jax.jit(task.run_transition)
  qadr = m.jnt_qposadr[m.body_jntadr[m.body("cube")]]

  # cube quat == goal quat → reached → counter advances, goal changes
  d1 = d.replace(mocap_quat=d.mocap_quat.at[0].set(
      d.qpos[qadr + 3:qadr + 7]))
  d2 = trans(d1)
  assert float(d2.userdata[0]) == float(d1.userdata[0]) + 1
  assert not np.allclose(np.asarray(d2.mocap_quat[0]),
                         np.asarray(d1.mocap_quat[0]))

  # dropped cube → reset into the hand
  qdrop = d.qpos.at[qadr + 2].set(0.05)
  d3 = trans(d.replace(
      qpos=qdrop, qvel=d.qvel.at[qadr].set(1.0),
      mocap_quat=d.mocap_quat.at[0].set(
          jnp.asarray([0.0, 1.0, 0.0, 0.0], dtype=d.qpos.dtype))))
  assert abs(float(d3.qpos[qadr + 2]) - 0.285) < 1e-6
  assert float(jnp.abs(d3.qvel[qadr:qadr + 6]).max()) == 0.0


def test_rubik_plant_and_residual_dims():
  """The real plant (VERDICT r4 #6): free cube + face hinges held by the
  24-joint Shadow hand; residual layout matches solve.cc:59-133 / the
  reference task.xml:51-63 cost spec (84 dims at our hand's counts)."""
  task = registry.get_task("Rubik")
  m = task.model
  assert m.nu == 20 and m.nq == 37 and m.nv == 36
  assert task.spec.nresidual == 84
  assert task.spec.names[-1] == "Remaining"
  d = phys_io.make_data(m)
  qpos, _, ctrl = m.keyframe("home")
  d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype),
                ctrl=jnp.asarray(ctrl, dtype=d.qpos.dtype))
  step = jax.jit(phys_step)
  for _ in range(200):
    d = step(m, d)
  # cube rests in the palm, faces stay near home
  assert 0.25 < float(d.qpos[RK._QCUBE + 2]) < 0.32
  r = task.residual(m, d, task.params.residual_params)
  assert r.shape == (task.spec.nresidual,)
  assert bool(jnp.all(jnp.isfinite(r)))


def test_rubik_fsm_scramble_then_solve():
  """Feed the FSM perfectly-reached states: the scramble teleports the
  face stack (reference solve.cc:193-198), then the goal index unwinds
  move-by-move back to zero and ends in WAIT (solve.cc:212-223)."""
  task = registry.get_task("Rubik")
  m = task.model
  d = phys_io.make_data(m)
  qpos, _, _ = m.keyframe("home")
  d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype))
  trans = jax.jit(task.run_transition)
  n_moves = int(task.params.residual_params[0])

  d = trans(d)  # scramble fires
  assert int(d.userdata[0]) == RK.MODE_SOLVE
  assert int(d.userdata[1]) == n_moves - 1
  scrambled = np.asarray(d.qpos[RK._QFACE:RK._QFACE + 6])
  assert np.abs(scrambled).max() >= np.pi / 2 - 1e-5

  for g in range(n_moves - 1, -1, -1):
    # teleport the faces onto stage-g targets (a perfect solve step)
    tgt = RK._face_targets(jnp.asarray(float(g)), d.qpos.dtype)
    d = d.replace(qpos=jax.lax.dynamic_update_slice(
        d.qpos, tgt.astype(d.qpos.dtype), (RK._QFACE,)))
    d = trans(d)
  assert int(d.userdata[0]) == RK.MODE_WAIT
  assert int(d.userdata[1]) == 0
  # solved: face-goal residual rows are zero
  r = task.residual(m, d, task.params.residual_params)
  np.testing.assert_allclose(np.asarray(r[29:35]), np.zeros(6), atol=1e-5)


def test_rubik_faces_track_targets_under_planning():
  """One quarter-turn tracked by the sampling planner (short CPU run) on
  the directly-actuated face mechanism (the reference's transition
  model, kept as the 'Rubik Faces' task)."""
  from mujoco_mpc_tpu.planners import sampling
  task = registry.get_task("Rubik Faces")
  m = task.model
  cfg = sampling.SamplingConfig(num_trajectories=32, spline_points=4,
                                horizon=25)
  planner = sampling.SamplingPlanner(cfg)
  policy = planner.init(task)
  d = phys_io.make_data(m)
  d = jax.jit(task.run_transition)(d)  # applies move 0
  tgt = np.asarray(d.userdata[2:8])
  assert np.abs(tgt).max() > 1.0  # a quarter-turn target exists
  opt = jax.jit(planner.optimize)
  act = jax.jit(planner.action)
  step = jax.jit(phys_step)
  rng = jax.random.PRNGKey(0)
  err0 = float(jnp.max(jnp.abs(d.qpos[:6] - d.userdata[2:8])))
  for i in range(60):
    if i % 2 == 0:
      rng, k = jax.random.split(rng)
      policy, _ = opt(task, policy, d, k)
    d = step(m, d.replace(ctrl=act(task, policy, d)))
  err = float(jnp.max(jnp.abs(d.qpos[:6] - d.userdata[2:8])))
  assert err < err0 * 0.75, (err0, err)
