"""Narrowphase collision: static candidate pairs → dense contact set.

Broadphase runs on the host at model-load time (io.py: contype/conaffinity +
body filters), so on device every candidate pair is evaluated every step and
inactive contacts simply carry positive distance — static shapes, no
data-dependent control flow, ideal for lax.scan/vmap on TPU.

Each pair kind expands to a fixed number of contact points (e.g. a capsule
on a plane always yields 2 candidate points, a box on a plane all 8
corners). Signed distances are exact for the supported primitive pairs.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math
from mujoco_mpc_tpu.physics.types import Contact, Data, GeomType, Model


def _frame_from_normal(n: jax.Array) -> jax.Array:
  """(3,3) rows [normal, tangent1, tangent2] from a unit normal."""
  # pick the axis least aligned with n
  ref = jnp.where(jnp.abs(n[0]) < 0.5,
                  jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype),
                  jnp.asarray([0.0, 1.0, 0.0], dtype=n.dtype))
  t1 = math.normalize(jnp.cross(n, ref))
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2])


# each primitive-pair function returns a list of
# (dist, pos, normal) tuples; normal points from geom1 into geom2.


def _plane_sphere(pp, pm, sp, sm, psize, ssize):
  n = pm[:, 2]
  r = ssize[0]
  dist = jnp.dot(n, sp - pp) - r
  pos = sp - n * (r + 0.5 * dist)
  return [(dist, pos, n)]


def _plane_capsule(pp, pm, cp, cm, psize, csize):
  n = pm[:, 2]
  axis = cm[:, 2]
  r, half = csize[0], csize[1]
  out = []
  for sgn in (-1.0, 1.0):
    end = cp + sgn * half * axis
    dist = jnp.dot(n, end - pp) - r
    pos = end - n * (r + 0.5 * dist)
    out.append((dist, pos, n))
  return out


def _plane_box(pp, pm, bp, bm, psize, bsize):
  n = pm[:, 2]
  out = []
  for sx in (-1.0, 1.0):
    for sy in (-1.0, 1.0):
      for sz in (-1.0, 1.0):
        corner = bp + bm @ (bsize * jnp.asarray([sx, sy, sz],
                                                dtype=bsize.dtype))
        dist = jnp.dot(n, corner - pp)
        pos = corner - n * 0.5 * dist
        out.append((dist, pos, n))
  return out


def _plane_ellipsoid(pp, pm, ep, em, psize, esize):
  n = pm[:, 2]
  # support point of ellipsoid in direction -n
  nl = em.T @ n  # normal in ellipsoid frame
  denom = jnp.linalg.norm(esize * nl) + 1e-12
  sp_local = -(esize * esize * nl) / denom
  support = ep + em @ sp_local
  dist = jnp.dot(n, support - pp)
  pos = support - n * 0.5 * dist
  return [(dist, pos, n)]


def _sphere_sphere(p1, m1, p2, m2, s1, s2):
  delta = p2 - p1
  # math.safe_norm, not linalg.norm: d‖v‖/dv = v/‖v‖ is 0/0 at
  # coincident points and NaNs reverse-mode AD (gradient planners)
  dn, n = math.safe_norm(delta)
  dn = dn[0]
  dist = dn - (s1[0] + s2[0])
  pos = p1 + n * (s1[0] + 0.5 * dist)
  return [(dist, pos, n)]


def _closest_on_segment(p, a, axis, half):
  t = jnp.clip(jnp.dot(p - a, axis), -half, half)
  return a + t * axis


def _sphere_capsule(p1, m1, p2, m2, s1, s2):
  seg = _closest_on_segment(p1, p2, m2[:, 2], s2[1])
  delta = seg - p1
  dn, n = math.safe_norm(delta)  # NaN-free gradient at delta = 0
  dn = dn[0]
  dist = dn - (s1[0] + s2[0])
  pos = p1 + n * (s1[0] + 0.5 * dist)
  return [(dist, pos, n)]


def _capsule_capsule(p1, m1, p2, m2, s1, s2):
  # closest points between two segments (clamped, smooth approximation)
  a1, u1, h1 = p1, m1[:, 2], s1[1]
  a2, u2, h2 = p2, m2[:, 2], s2[1]
  r = a2 - a1
  uu = jnp.dot(u1, u2)
  ru1 = jnp.dot(r, u1)
  ru2 = jnp.dot(r, u2)
  det = 1.0 - uu * uu
  safe_det = jnp.maximum(det, 1e-9)
  t1 = jnp.clip((ru1 - uu * ru2) / safe_det, -h1, h1)
  t2 = jnp.clip(jnp.dot(a1 + t1 * u1 - a2, u2), -h2, h2)
  t1 = jnp.clip(jnp.dot(a2 + t2 * u2 - a1, u1), -h1, h1)
  c1 = a1 + t1 * u1
  c2 = a2 + t2 * u2
  delta = c2 - c1
  dn, n = math.safe_norm(delta)  # NaN-free gradient at delta = 0
  dn = dn[0]
  dist = dn - (s1[0] + s2[0])
  pos = c1 + n * (s1[0] + 0.5 * dist)
  return [(dist, pos, n)]


def _sphere_box_point(center, radius, bp, bm, bsize):
  local = bm.T @ (center - bp)
  clamped = jnp.clip(local, -bsize, bsize)
  inside = jnp.all(jnp.abs(local) < bsize)
  # outside: closest point on box surface; inside: push to nearest face
  face_dist = bsize - jnp.abs(local)
  k = jnp.argmin(face_dist)
  push = jnp.zeros(3, dtype=local.dtype).at[k].set(
      jnp.sign(local[k]) * bsize[k])
  surf_inside = jnp.where(
      jax.lax.broadcasted_iota(jnp.int32, (3,), 0) == k, push, local)
  surf = jnp.where(inside, surf_inside, clamped)
  world = bp + bm @ surf
  delta = center - world
  # NaN-free gradient at delta = 0 (sphere center exactly on the box
  # surface — both dist branches consume dn, so linalg.norm NaNs AD)
  dn, unit = math.safe_norm(delta)
  dn = dn[0]
  n_out = -unit  # from sphere into box
  n_in = bm @ jnp.zeros(3, dtype=local.dtype).at[k].set(-jnp.sign(local[k]))
  n = jnp.where(inside, n_in, n_out)
  dist = jnp.where(inside, -dn - radius, dn - radius)
  pos = world + 0.5 * dist * (-n)
  return dist, pos, n


def _sphere_box(p1, m1, p2, m2, s1, s2):
  dist, pos, n = _sphere_box_point(p1, s1[0], p2, m2, s2)
  return [(dist, pos, n)]


def _capsule_box(p1, m1, p2, m2, s1, s2):
  out = []
  for sgn in (-1.0, 1.0):
    end = p1 + sgn * s1[1] * m1[:, 2]
    dist, pos, n = _sphere_box_point(end, s1[0], p2, m2, s2)
    out.append((dist, pos, n))
  return out


def _box_box(p1, m1, p2, m2, s1, s2):
  """Face-SAT box-box: one shared manifold normal + 16 corner points.

  The separating axis is chosen among the 6 face axes (edge-edge axes
  omitted, as adequate for resting/stacking/manipulation scenes; the
  reference gets MuJoCo's full mjc_BoxBox for free). All contact points
  share that single normal — per-corner face queries (the round-1 scheme)
  produce conflicting side-face normals at face edges, which laterally
  eject stacked boxes. Corners laterally outside the other box are
  deactivated through a lateral-overhang guard so slab distance alone
  cannot create phantom contacts.
  """
  dtype = s1.dtype
  t = p2 - p1
  axes = jnp.concatenate([m1.T, m2.T])  # (6, 3) rows = candidate normals
  # support radii of each box along every axis
  r1 = jnp.sum(jnp.abs(axes @ m1) * s1[None, :], axis=-1)  # (6,)
  r2 = jnp.sum(jnp.abs(axes @ m2) * s2[None, :], axis=-1)
  proj = axes @ t
  sep = jnp.abs(proj) - (r1 + r2)  # (6,) negative = overlapping
  k = jnp.argmax(sep)  # least-penetrating face axis
  n = axes[k] * jnp.sign(proj[k])  # points box1 → box2

  sup1 = jnp.sum(jnp.abs(n @ m1) * s1)
  sup2 = jnp.sum(jnp.abs(n @ m2) * s2)
  big = 4.0 * (jnp.max(s1) + jnp.max(s2))

  def corner_points(pc, mc, sc, po, mo, so, sup_o, sgn):
    """Corners of the 'c' box against the 'o' box's slab along n."""
    pts = []
    n_loc = jnp.abs(mo.T @ n)  # alignment of o's axes with the normal
    # slack keeps boundary corners load-bearing (a corner exactly at the
    # face edge must still carry, or offset stacks tip over); phantom
    # contacts are confined to this small fringe around the face
    slack = 0.05 * jnp.min(so)
    for sx in (-1.0, 1.0):
      for sy in (-1.0, 1.0):
        for sz in (-1.0, 1.0):
          c = pc + mc @ (sc * jnp.asarray([sx, sy, sz], dtype=dtype))
          dist = sgn * jnp.dot(c - po, n) - sup_o
          # lateral guard: corner must overlap o's cross-section normal
          # to n; axes aligned with n are excluded via a large penalty
          local = mo.T @ (c - po)
          overhang = jnp.max(jnp.abs(local) - so - big * n_loc) - slack
          d_eff = jnp.maximum(dist, overhang)
          pos = c - 0.5 * d_eff * sgn * n
          pts.append((d_eff, pos, n))
    return pts

  # corners of box2 vs box1 (distance measured along +n past box1's slab)
  out = corner_points(p2, m2, s2, p1, m1, s1, sup1, 1.0)
  # corners of box1 vs box2 (along −n past box2's slab)
  out += corner_points(p1, m1, s1, p2, m2, s2, sup2, -1.0)
  return out


_DISPATCH = {
    (GeomType.PLANE, GeomType.SPHERE): _plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): _plane_capsule,
    (GeomType.PLANE, GeomType.BOX): _plane_box,
    (GeomType.PLANE, GeomType.ELLIPSOID): _plane_ellipsoid,
    (GeomType.PLANE, GeomType.CYLINDER): _plane_capsule,  # approx
    (GeomType.SPHERE, GeomType.SPHERE): _sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): _sphere_capsule,
    (GeomType.SPHERE, GeomType.BOX): _sphere_box,
    (GeomType.CAPSULE, GeomType.CAPSULE): _capsule_capsule,
    (GeomType.CAPSULE, GeomType.BOX): _capsule_box,
    (GeomType.BOX, GeomType.BOX): _box_box,
}


# ---------------------------------------------------------------------------
# convex mesh narrowphase: support-function SAT
#
# Each mesh is a hull-vertex cloud (support-exact for the convex hull) plus
# deduped face normals (io.py). Candidate separating axes = face normals of
# both hulls + the center-difference direction + a small fixed sphere set
# (bounds the error of the skipped edge-edge axes). For every axis a
# (oriented hull1 → hull2): separation s(a) = lo2(a) − hi1(a); contact
# distance = max_a s(a) (negative = penetration, the least-penetrating
# axis — standard SAT), normal = argmax axis, and the manifold is the k
# deepest hull2 vertices along −normal with their individual face gaps.
# Branch-free, static shapes, smooth in the vertices — built for soft-
# contact MPC, not exact impulse resolution (MuJoCo uses libccd here).
# ---------------------------------------------------------------------------

_MESH_EXTRA_AXES = 13  # half-sphere fixed axes appended to the SAT set


def _mesh_axes_fixed(dtype):
  import numpy as np
  i = np.arange(_MESH_EXTRA_AXES, dtype=np.float64)
  phi = np.pi * (3.0 - np.sqrt(5.0)) * i
  z = (i + 0.5) / _MESH_EXTRA_AXES  # upper half-sphere (axes are signless)
  r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
  return jnp.asarray(
      np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1), dtype=dtype)


def _mesh_world_verts(m: Model, d, g: int):
  """(VCAP, 3) world-frame hull vertices + (NCAP, 3) world face normals."""
  mid = m.geom_dataid[g]
  v = m.mesh_hullvert[mid] @ d.geom_xmat[g].T + d.geom_xpos[g]
  n = m.mesh_facenorm[mid] @ d.geom_xmat[g].T
  return v, n


def _sat_contacts(v1, axes1, v2, axes2, c1, c2, k: int, inflate1=0.0):
  """SAT contacts between vertex clouds v1, v2 (k deepest points of v2).

  inflate1: radius inflation of hull1 (sphere/capsule support bodies).
  Returns list of (dist, pos, normal) with normal oriented hull1 → hull2.
  """
  dtype = v1.dtype
  _, cdir = math.safe_norm(c2 - c1)  # NaN-free grad at coincident hulls
  axes = jnp.concatenate(
      [axes1, axes2, cdir[None], _mesh_axes_fixed(dtype)])  # (K, 3)
  # orient every axis hull1 → hull2
  sgn = jnp.where(axes @ cdir >= 0, 1.0, -1.0)
  axes = axes * sgn[:, None]
  p1 = v1 @ axes.T  # (V1, K)
  p2 = v2 @ axes.T  # (V2, K)
  sep = jnp.min(p2, axis=0) - jnp.max(p1, axis=0) - inflate1  # (K,)
  best = jnp.argmax(sep)
  axis = axes[best]
  hi1 = jnp.max(v1 @ axis) + inflate1
  # k deepest vertices of hull2 along the contact normal
  depth2 = v2 @ axis  # (V2,)
  _, idx = jax.lax.top_k(-depth2, k)
  out = []
  for j in range(k):
    p = v2[idx[j]]
    dist = depth2[idx[j]] - hi1
    out.append((dist, p - 0.5 * jnp.minimum(dist, 0.0) * axis, axis))
  return out


def _plane_mesh(m, d, g1, g2):
  """Mesh on plane: the 4 deepest hull vertices below the surface."""
  pp, pm = d.geom_xpos[g1], d.geom_xmat[g1]
  n = pm[:, 2]
  v, _ = _mesh_world_verts(m, d, g2)
  h = (v - pp) @ n  # (VCAP,) height above plane
  _, idx = jax.lax.top_k(-h, 4)
  return [(h[idx[j]], v[idx[j]] - 0.5 * jnp.minimum(h[idx[j]], 0.0) * n, n)
          for j in range(4)]


def _sphere_mesh(m, d, g1, g2):
  c = d.geom_xpos[g1]
  r = m.geom_size[g1, 0]
  v2, n2 = _mesh_world_verts(m, d, g2)
  return _sat_contacts(c[None], jnp.zeros((0, 3), c.dtype), v2, n2,
                       c, jnp.mean(v2, axis=0), k=1, inflate1=r)


def _capsule_mesh(m, d, g1, g2):
  p, mat = d.geom_xpos[g1], d.geom_xmat[g1]
  r, hl = m.geom_size[g1, 0], m.geom_size[g1, 1]
  axis = mat[:, 2]
  ends = jnp.stack([p + hl * axis, p - hl * axis])
  v2, n2 = _mesh_world_verts(m, d, g2)
  return _sat_contacts(ends, jnp.zeros((0, 3), p.dtype), v2, n2,
                       p, jnp.mean(v2, axis=0), k=2, inflate1=r)


def _box_mesh(m, d, g1, g2):
  p, mat = d.geom_xpos[g1], d.geom_xmat[g1]
  s = m.geom_size[g1]
  import numpy as np
  corners_l = jnp.asarray(
      np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                for sz in (-1, 1)], dtype=np.float64), dtype=p.dtype)
  corners = (corners_l * s) @ mat.T + p
  v2, n2 = _mesh_world_verts(m, d, g2)
  return _sat_contacts(corners, mat.T, v2, n2, p, jnp.mean(v2, axis=0), k=4)


def _mesh_mesh(m, d, g1, g2):
  v1, n1 = _mesh_world_verts(m, d, g1)
  v2, n2 = _mesh_world_verts(m, d, g2)
  return _sat_contacts(v1, n1, v2, n2, jnp.mean(v1, axis=0),
                       jnp.mean(v2, axis=0), k=4)


_MESH_DISPATCH = {
    GeomType.PLANE: _plane_mesh,
    GeomType.SPHERE: _sphere_mesh,
    GeomType.CAPSULE: _capsule_mesh,
    GeomType.BOX: _box_mesh,
    GeomType.MESH: _mesh_mesh,
}

_MESH_COUNTS = {
    GeomType.PLANE: 4, GeomType.SPHERE: 1, GeomType.CAPSULE: 2,
    GeomType.BOX: 4, GeomType.MESH: 4,
}


def npoints(m: Model) -> int:
  """Total static contact-point count for the model's candidate pairs."""
  slots = pair_slots(m)
  return slots[-1][0] + slots[-1][1] if slots else 0


def _hfield_sample(m: Model, x, y):
  """Bilinear height + gradient of hfield 0 at local (x, y)."""
  rx, ry = m.hfield_size[0], m.hfield_size[1]
  nr, nc = m.hfield_nrow, m.hfield_ncol
  fx = jnp.clip((x + rx) / (2.0 * rx) * (nc - 1), 0.0, nc - 1 - 1e-6)
  fy = jnp.clip((y + ry) / (2.0 * ry) * (nr - 1), 0.0, nr - 1 - 1e-6)
  ix = jnp.floor(fx).astype(jnp.int32)
  iy = jnp.floor(fy).astype(jnp.int32)
  tx, ty = fx - ix, fy - iy
  g = m.hfield_data
  h00 = g[iy, ix]
  h01 = g[iy, ix + 1]
  h10 = g[iy + 1, ix]
  h11 = g[iy + 1, ix + 1]
  h = (h00 * (1 - tx) * (1 - ty) + h01 * tx * (1 - ty) +
       h10 * (1 - tx) * ty + h11 * tx * ty)
  dhdx = ((h01 - h00) * (1 - ty) + (h11 - h10) * ty) * (nc - 1) / (2.0 * rx)
  dhdy = ((h10 - h00) * (1 - tx) + (h11 - h01) * tx) * (nr - 1) / (2.0 * ry)
  return h, dhdx, dhdy


def _hfield_point(m, hp, hm, point, radius):
  """Contact of a sphere (point, radius) against hfield 0 (local-plane
  approximation from the bilinear surface gradient)."""
  local = hm.T @ (point - hp)
  h, gx, gy = _hfield_sample(m, local[0], local[1])
  n_local = jnp.stack([-gx, -gy, jnp.ones_like(gx)])
  n_local = n_local / jnp.linalg.norm(n_local)
  dist = (local[2] - h) * n_local[2] - radius
  n = hm @ n_local  # hfield → other geom (points "uphill")
  pos = point - n * (radius + 0.5 * dist)
  return dist, pos, n


def _hfield_sphere(m, hp, hm, sp, sm, ssize):
  return [_hfield_point(m, hp, hm, sp, ssize[0])]


def _hfield_capsule(m, hp, hm, cp, cm, csize):
  out = []
  for sgn in (-1.0, 1.0):
    end = cp + sgn * csize[1] * cm[:, 2]
    out.append(_hfield_point(m, hp, hm, end, csize[0]))
  return out


def _hfield_box(m, hp, hm, bp, bm, bsize):
  out = []
  for sx in (-1.0, 1.0):
    for sy in (-1.0, 1.0):
      for sz in (-1.0, 1.0):
        corner = bp + bm @ (jnp.asarray([sx, sy, sz],
                                        dtype=bsize.dtype) * bsize)
        out.append(_hfield_point(m, hp, hm, corner, 0.0))
  return out


_HFIELD_DISPATCH = {
    GeomType.SPHERE: _hfield_sphere,
    GeomType.CAPSULE: _hfield_capsule,
    GeomType.BOX: _hfield_box,
}


def pair_slots(m: Model):
  """Static map pair-index → (slot_start, slot_count) into Contact arrays.

  Contact rows are laid out densely in `m.collision_pairs` order with a
  per-type-pair point count (see `npoints`); tasks use this to read the
  contact rows of a specific geom pair (e.g. finger↔object normals for the
  ALOHA grasp residual, reference mjpc/tasks/bimanual/handover/handover.cc:
  57-124 which scans mjData.contact instead)."""
  slots = []
  start = 0
  for g1, g2 in m.collision_pairs:
    t1, t2 = GeomType(m.geom_type[g1]), GeomType(m.geom_type[g2])
    if t1 in (GeomType.PLANE, GeomType.HFIELD) and t2 == GeomType.BOX:
      count = 8
    elif t1 == GeomType.BOX and t2 == GeomType.BOX:
      count = 16
    elif t1 in (GeomType.PLANE, GeomType.HFIELD) and t2 in (
        GeomType.CAPSULE, GeomType.CYLINDER):
      count = 2
    elif t1 == GeomType.CAPSULE and t2 == GeomType.BOX:
      count = 2
    elif t2 == GeomType.MESH:
      count = _MESH_COUNTS[t1]
    else:
      count = 1
    slots.append((start, count))
    start += count
  return tuple(slots)


def point_condims(m: Model):
  """Static tuple: condim of every candidate contact point (pair order).

  MuJoCo combination rule: condim = condim of the higher-priority geom,
  or max of the two at equal priority (we model the default equal-priority
  case). condim 1 = frictionless normal-only row (dm_control humanoid
  self-collision class); 3 = pyramidal/elliptic tangential friction;
  4/6 add torsional/rolling rows (see angular_points)."""
  out = []
  for (start, count), (g1, g2) in zip(pair_slots(m), m.collision_pairs):
    condim = max(m.geom_condim[g1], m.geom_condim[g2])
    out.extend([condim] * count)
  return tuple(out)


def angular_points(m: Model):
  """Static (torsion_pts, roll_pts): contact-point indices whose pair's
  condim (max of the two geoms', MuJoCo combination rule) enables
  torsional (condim ≥ 4) / rolling (condim 6) friction rows.

  physics/solver.py appends one torsional and two rolling rows per listed
  point after the 3·ncon translational rows; the lists are static so the
  constraint-row layout stays compile-time constant."""
  tor, rol = [], []
  for (start, count), (g1, g2) in zip(pair_slots(m), m.collision_pairs):
    condim = max(m.geom_condim[g1], m.geom_condim[g2])
    for i in range(start, start + count):
      if condim >= 4:
        tor.append(i)
      if condim >= 6:
        rol.append(i)
  return tuple(tor), tuple(rol)


def geom_pair_slots(m: Model, ga: int, gb: int):
  """(slot_start, slot_count, sign) for the candidate pair {ga, gb}.

  sign = +1 if contact normals point ga→gb (pair stored as (ga, gb)),
  -1 if stored flipped. Raises KeyError if the pair is not a candidate."""
  slots = pair_slots(m)
  for i, (g1, g2) in enumerate(m.collision_pairs):
    if (g1, g2) == (ga, gb):
      return slots[i] + (1.0,)
    if (g1, g2) == (gb, ga):
      return slots[i] + (-1.0,)
  raise KeyError(f"geom pair ({ga}, {gb}) is not a collision candidate")


def collide(m: Model, d: Data) -> Data:
  """Evaluate all candidate pairs; returns Data with dense Contact arrays."""
  dtype = d.qpos.dtype
  dists, poss, frames, frictions, solrefs, solimps, g1s, g2s = (
      [], [], [], [], [], [], [], [])
  torsions, rolls = [], []
  for g1, g2 in m.collision_pairs:
    t1, t2 = GeomType(m.geom_type[g1]), GeomType(m.geom_type[g2])
    if t2 == GeomType.MESH:
      pts = _MESH_DISPATCH[t1](m, d, g1, g2)
    elif t1 == GeomType.HFIELD:
      pts = _HFIELD_DISPATCH[t2](
          m, d.geom_xpos[g1], d.geom_xmat[g1], d.geom_xpos[g2],
          d.geom_xmat[g2], m.geom_size[g2])
    else:
      fn = _DISPATCH[(t1, t2)]
      pts = fn(d.geom_xpos[g1], d.geom_xmat[g1], d.geom_xpos[g2],
               d.geom_xmat[g2], m.geom_size[g1], m.geom_size[g2])
    fric = jnp.maximum(m.geom_friction[g1, 0], m.geom_friction[g2, 0])
    tor = jnp.maximum(m.geom_friction[g1, 1], m.geom_friction[g2, 1])
    rol = jnp.maximum(m.geom_friction[g1, 2], m.geom_friction[g2, 2])
    solref = 0.5 * (m.geom_solref[g1] + m.geom_solref[g2])
    solimp = 0.5 * (m.geom_solimp[g1] + m.geom_solimp[g2])
    margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
    for dist, pos, n in pts:
      dists.append(dist - margin)
      poss.append(pos)
      frames.append(_frame_from_normal(n))
      frictions.append(fric)
      torsions.append(tor)
      rolls.append(rol)
      solrefs.append(solref)
      solimps.append(solimp)
      g1s.append(g1)
      g2s.append(g2)

  if not dists:
    return d  # keep the (1,)-shaped inactive placeholder from make_data

  contact = Contact(
      dist=jnp.stack(dists),
      pos=jnp.stack(poss),
      frame=jnp.stack(frames),
      friction=jnp.stack(frictions),
      torsion=jnp.stack(torsions),
      roll=jnp.stack(rolls),
      solref=jnp.stack(solrefs),
      solimp=jnp.stack(solimps),
      geom1=jnp.asarray(g1s, dtype=jnp.int32),
      geom2=jnp.asarray(g2s, dtype=jnp.int32),
      force=jnp.zeros((len(dists), 3), dtype=dtype),
  )
  return d.replace(contact=contact)
