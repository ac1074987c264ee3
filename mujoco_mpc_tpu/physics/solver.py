"""Soft-constraint solver: contacts + joint limits.

MuJoCo-style compliant constraints (impedance from solimp, reference
acceleration from solref) solved with fixed-iteration *accelerated
projected gradient* (APGD) on the regularized dual over the contact-space
(Delassus) operator — branch-free, static shapes, fully row-parallel
(TPU-friendly, unlike sequential PGS sweeps), differentiable; the
iteration count is a compile-time constant so the whole solve fuses into
the jitted step. Friction is an elliptic (circular) cone projection.
Reference behavior being replaced: MuJoCo's PGS/Newton solvers invoked by
mj_step inside Trajectory::Rollout (mjpc/trajectory.cc:141-180).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import linalg
from mujoco_mpc_tpu.physics.types import Data, JointType, Model

_MINIMP, _MAXIMP = 1e-4, 0.9999
_DEFAULT_SOLREF = (0.02, 1.0)
_DEFAULT_SOLIMP = (0.9, 0.95, 0.001, 0.5, 2.0)
# APGD iteration budget. Rollouts warm-start from the previous step's dual
# forces (Data.efc_lambda), so 12 warm iterations match or beat the old 25
# cold ones after the first step or two; cold single-step calls fall back
# to the diagonal-preconditioned init. Perf: the matrix-free megakernels
# are solver-bound — this is the 73→107 Hz lever on the humanoid
# north-star config (measured, round 3).
_ITERATIONS = 12
_POWER_ITERS = 8  # λmax power-iteration steps (shared with tilestep)


def _impedance(pos: jax.Array, solimp: jax.Array) -> jax.Array:
  """MuJoCo impedance sigmoid d(pos) ∈ (0,1)."""
  d0, d1, width, mid, power = (solimp[..., 0], solimp[..., 1],
                               solimp[..., 2], solimp[..., 3],
                               solimp[..., 4])
  x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
  mid = jnp.clip(mid, 1e-4, 1 - 1e-4)
  power = jnp.maximum(power, 1.0)
  y_lo = jnp.power(x / mid, power) * mid
  y_hi = 1.0 - jnp.power((1 - x) / (1 - mid), power) * (1 - mid)
  y = jnp.where(x < mid, y_lo, y_hi)
  return jnp.clip(d0 + y * (d1 - d0), _MINIMP, _MAXIMP)


def _kb(solref: jax.Array, dmax: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """Stiffness/damping from solref, supporting the direct (negative) form."""
  timeconst = jnp.maximum(solref[..., 0], 1e-8)
  dampratio = jnp.maximum(solref[..., 1], 1e-8)
  k_std = 1.0 / (dmax * dmax * timeconst * timeconst *
                 dampratio * dampratio)
  b_std = 2.0 / (dmax * timeconst)
  k_dir = -solref[..., 0] / (dmax * dmax)
  b_dir = -solref[..., 1] / dmax
  direct = jnp.logical_and(solref[..., 0] <= 0, solref[..., 1] <= 0)
  return jnp.where(direct, k_dir, k_std), jnp.where(direct, b_dir, b_std)


def _contact_jacobian(m: Model, d: Data) -> jax.Array:
  """(npt, 3, nv): contact-frame relative velocity Jacobian per point."""
  con = d.contact
  b1 = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)[con.geom1]
  b2 = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)[con.geom2]

  # translational Jacobian of a world point p for all dofs:
  #   Jp(dof) = cdof_lin + cdof_ang × p, masked to dofs on each body's path
  mask1 = m.dof_body_mask.T[b1]  # (npt, nv)
  mask2 = m.dof_body_mask.T[b2]
  jac_all = (d.cdof[None, :, 3:] +
             jnp.cross(jnp.broadcast_to(d.cdof[None, :, :3],
                                        (con.pos.shape[0], m.nv, 3)),
                       con.pos[:, None, :]))  # (npt, nv, 3)
  jrel = (jnp.where(mask2[..., None], jac_all, 0.0) -
          jnp.where(mask1[..., None], jac_all, 0.0))  # (npt, nv, 3)
  # project into contact frame rows
  return jnp.einsum("prc,pnc->prn", con.frame, jrel)  # (npt, 3, nv)


def _angular_rows(m: Model, d: Data, pts, axes):
  """Relative angular-velocity Jacobian rows about contact-frame axes.

  pts: STATIC tuple of contact-point indices; axes: frame row indices
  (0 = normal → torsional friction, 1/2 = tangents → rolling). Returns
  (len(pts)·len(axes), nv), axis-major ([all axis0 rows, all axis1 ...]).
  MuJoCo condim-4/6 row semantics (engine_core_constraint.c contact
  friction dimensions beyond 3)."""
  idx = jnp.asarray(pts, dtype=jnp.int32)
  con = d.contact
  b1 = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)[con.geom1[idx]]
  b2 = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)[con.geom2[idx]]
  mask1 = m.dof_body_mask.T[b1]  # (k, nv)
  mask2 = m.dof_body_mask.T[b2]
  jang = d.cdof[:, :3]  # (nv, 3) angular part of each dof's spatial axis
  jrel = (jnp.where(mask2[..., None], jang[None], 0.0) -
          jnp.where(mask1[..., None], jang[None], 0.0))  # (k, nv, 3)
  rows = [jnp.sum(jrel * con.frame[idx, a, :][:, None, :], axis=-1)
          for a in axes]
  return jnp.concatenate(rows) if len(rows) > 1 else rows[0]


def _limit_rows(m: Model, d: Data):
  """Limit rows: two-sided for scalar joints, rotation-angle for ball.

  Scalar-joint Jacobian rows are compile-time constants (±e_vadr); ball
  joints get one row with the data-dependent Jacobian −axis(rotvec) on
  their 3 dofs (MuJoCo convention: range[1] bounds the rotation angle).
  """
  import numpy as np
  from mujoco_mpc_tpu.physics import math as pmath

  lim = [j for j in range(m.njnt)
         if m.jnt_limited[j] and
         m.jnt_type[j] in (JointType.HINGE, JointType.SLIDE)]
  ball = [j for j in range(m.njnt)
          if m.jnt_limited[j] and m.jnt_type[j] == JointType.BALL]
  if not lim and not ball:
    return None
  dtype = d.qpos.dtype
  jmats, poss, solrefs = [], [], []
  if lim:
    nl = len(lim)
    jmat_np = np.zeros((2 * nl, m.nv), dtype=np.float32)
    for i, j in enumerate(lim):
      jmat_np[2 * i, m.jnt_dofadr[j]] = 1.0
      jmat_np[2 * i + 1, m.jnt_dofadr[j]] = -1.0
    qadr = jnp.asarray([m.jnt_qposadr[j] for j in lim], dtype=jnp.int32)
    jidx = jnp.asarray(lim, dtype=jnp.int32)
    q = d.qpos[qadr]
    lo = m.jnt_range[jidx, 0]
    hi = m.jnt_range[jidx, 1]
    margin = m.jnt_margin[jidx]
    jmats.append(jnp.asarray(jmat_np, dtype=dtype))
    poss.append(jnp.stack([q - lo - margin, hi - q - margin],
                          axis=-1).reshape(-1))
    solrefs.append(jnp.repeat(m.jnt_solref[jidx], 2, axis=0))
  for j in ball:
    qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    quat = d.qpos[qadr:qadr + 4]
    rotvec = pmath.quat_sub(
        quat, jnp.asarray([1.0, 0, 0, 0], dtype=dtype))
    ang_k, axis = pmath.safe_norm(rotvec)  # NaN-free grad at identity
    ang = ang_k[0]
    row = jnp.zeros((m.nv,), dtype=dtype)
    row = jax.lax.dynamic_update_slice(row, -axis, (vadr,))
    jmats.append(row[None])
    poss.append((m.jnt_range[j, 1] - ang - m.jnt_margin[j])[None])
    solrefs.append(m.jnt_solref[j][None])
  return (jnp.concatenate(jmats), jnp.concatenate(poss),
          jnp.concatenate(solrefs))


def _tendon_limit_rows(m: Model, d: Data):
  """Two-sided limit rows for limited fixed tendons (constant Jacobians)."""
  from mujoco_mpc_tpu.physics import dynamics as pdyn

  lim = [t for t in range(m.ntendon) if m.tendon_limited[t]]
  if not lim:
    return None
  dtype = d.qpos.dtype
  jten = pdyn.tendon_jacobian_np(m)  # (ntendon, nv) numpy
  ln, _ = pdyn.tendon_lengths(m, d)
  jmats, poss, solrefs = [], [], []
  for t in lim:
    row = jnp.asarray(jten[t], dtype=dtype)
    lo, hi = m.tendon_range[t, 0], m.tendon_range[t, 1]
    mg = m.tendon_margin[t]
    jmats.append(jnp.stack([row, -row]))
    poss.append(jnp.stack([ln[t] - lo - mg, hi - ln[t] - mg]))
    solrefs.append(jnp.broadcast_to(m.tendon_solref_lim[t], (2, 2)))
  return (jnp.concatenate(jmats), jnp.concatenate(poss),
          jnp.concatenate(solrefs))


def _point_jacobian(m: Model, d: Data, body: int, point: jax.Array):
  """(3, nv) translational Jacobian of world `point` rigidly on `body`."""
  mask = m.dof_body_mask[:, body]  # (nv,)
  jac = (d.cdof[:, 3:] +
         jnp.cross(d.cdof[:, :3], jnp.broadcast_to(point, (m.nv, 3))))
  return jnp.where(mask[:, None], jac, 0.0).T  # (3, nv)


def _equality_rows(m: Model, d: Data):
  """Bilateral rows for connect/weld/joint equality constraints.

  MuJoCo semantics (mj_instantiateEquality): each active equality adds
  soft bilateral rows with its own solref/solimp; connect = 3 anchor-
  coincidence rows, weld = those + 3 orientation rows (relpose quat,
  torquescale), joint = 1 polynomial-coupling row. Row counts are static
  (eq set fixed at load); eq_active0 gates rows statically.
  """
  from mujoco_mpc_tpu.physics import math as pmath
  from mujoco_mpc_tpu.physics.types import EqType

  if not m.neq:
    return None
  dtype = d.qpos.dtype
  jmats, poss, solrefs, solimps = [], [], [], []
  for e in range(m.neq):
    if not m.eq_active0[e]:
      continue
    et, b1, b2 = m.eq_type[e], m.eq_obj1id[e], m.eq_obj2id[e]
    data = m.eq_data[e]
    if et == EqType.CONNECT:
      # anchor given in body1 local frame (data[0:3]); body2 anchor
      # (data[3:6]) precomputed by the MuJoCo compiler
      p1 = d.xpos[b1] + pmath.quat_rot(d.xquat[b1], data[0:3])
      p2 = d.xpos[b2] + pmath.quat_rot(d.xquat[b2], data[3:6])
      jrows = _point_jacobian(m, d, b1, p1) - _point_jacobian(m, d, b2, p2)
      jmats.append(jrows)
      poss.append(p1 - p2)
      solrefs.append(jnp.broadcast_to(m.eq_solref[e], (3, 2)))
      solimps.append(jnp.broadcast_to(m.eq_solimp[e], (3, 5)))
    elif et == EqType.WELD:
      # data: anchor2(0:3), anchor1(3:6), relpose quat(6:10),
      # torquescale(10)
      p1 = d.xpos[b1] + pmath.quat_rot(d.xquat[b1], data[3:6])
      p2 = d.xpos[b2] + pmath.quat_rot(d.xquat[b2], data[0:3])
      jtr = _point_jacobian(m, d, b1, p1) - _point_jacobian(m, d, b2, p2)
      # rotational rows: relative angular velocity Jacobian
      mask1 = m.dof_body_mask[:, b1]
      mask2 = m.dof_body_mask[:, b2]
      jrot = (jnp.where(mask1[:, None], d.cdof[:, :3], 0.0) -
              jnp.where(mask2[:, None], d.cdof[:, :3], 0.0)).T  # (3, nv)
      # orientation error: q1 ⊗ relpose vs q2 tangent difference
      q1r = pmath.quat_mul(d.xquat[b1], data[6:10])
      rot_err = pmath.quat_sub(q1r, d.xquat[b2])
      tq = jnp.maximum(data[10], 1e-8)
      jmats.append(jnp.concatenate([jtr, tq * jrot]))
      poss.append(jnp.concatenate([p1 - p2, tq * rot_err]))
      solrefs.append(jnp.broadcast_to(m.eq_solref[e], (6, 2)))
      solimps.append(jnp.broadcast_to(m.eq_solimp[e], (6, 5)))
    else:  # EqType.JOINT: qpos1 - qpos0_1 = poly(qpos2 - qpos0_2)
      j1, j2 = b1, b2
      q1 = d.qpos[m.jnt_qposadr[j1]] - m.qpos0[m.jnt_qposadr[j1]]
      row = jnp.zeros((m.nv,), dtype=dtype).at[m.jnt_dofadr[j1]].set(1.0)
      if j2 >= 0:
        dq = d.qpos[m.jnt_qposadr[j2]] - m.qpos0[m.jnt_qposadr[j2]]
        poly = (data[0] + data[1] * dq + data[2] * dq ** 2 +
                data[3] * dq ** 3 + data[4] * dq ** 4)
        dpoly = (data[1] + 2 * data[2] * dq + 3 * data[3] * dq ** 2 +
                 4 * data[4] * dq ** 3)
        row = row.at[m.jnt_dofadr[j2]].add(-dpoly)
        pos = q1 - poly
      else:
        pos = q1 - data[0]
      jmats.append(row[None])
      poss.append(pos[None])
      solrefs.append(m.eq_solref[e][None])
      solimps.append(m.eq_solimp[e][None])
  if not jmats:
    return None
  return (jnp.concatenate(jmats), jnp.concatenate(poss),
          jnp.concatenate(solrefs), jnp.concatenate(solimps))


def nrow_static(m: Model) -> int:
  """Total constraint-row count for the model (static; warm-start shape).

  Layout must mirror solve(): [contact rows (1 row per condim-1 point,
  3 per condim≥3 point, point order), angular friction rows (1 torsional
  per condim≥4 point + 2 rolling per condim-6 point), joint limits
  (2 per scalar + 1 per ball), tendon limits (2 each), equality rows]."""
  from mujoco_mpc_tpu.physics import collision
  from mujoco_mpc_tpu.physics.types import EqType

  ncon_rows = (sum(1 if c == 1 else 3 for c in collision.point_condims(m))
               if len(m.collision_pairs) else 0)
  tor_pts, roll_pts = (collision.angular_points(m)
                       if len(m.collision_pairs) else ((), ()))
  nang = len(tor_pts) + 2 * len(roll_pts)
  nlim = 0
  for j in range(m.njnt):
    if m.jnt_limited[j]:
      nlim += 2 if m.jnt_type[j] in (JointType.HINGE, JointType.SLIDE) \
          else 1
  nlim += 2 * sum(1 for t in range(m.ntendon) if m.tendon_limited[t])
  neq_rows = 0
  for e in range(m.neq):
    if m.eq_active0[e]:
      neq_rows += {EqType.CONNECT: 3, EqType.WELD: 6,
                   EqType.JOINT: 1}[m.eq_type[e]]
  return ncon_rows + nang + nlim + neq_rows


def solve(m: Model, d: Data, qacc_smooth: jax.Array,
          chol_factor) -> Data:
  """Compute qfrc_constraint from contacts and joint limits.

  Args:
    qacc_smooth: unconstrained acceleration (nv,).
    chol_factor: lower Cholesky factor (ops.linalg.chol_factor) of the
      (implicit-damping-augmented) inertia.
  """
  import numpy as np

  dtype = d.qpos.dtype
  ncon = d.contact.dist.shape[0]
  have_contacts = len(m.collision_pairs) > 0

  j_blocks, pos_list, solref_list, solimp_list = [], [], [], []
  tor_pts, roll_pts = (), ()
  ncrow = 0
  nrm_idx = t1_idx = t2_idx = fric_arr = None
  if have_contacts:
    from mujoco_mpc_tpu.physics import collision as collision_mod
    # variable rows per point: condim-1 points (frictionless, e.g. the
    # dm_control humanoid self-collision class) contribute only their
    # normal row; condim≥3 add the two tangential rows (MuJoCo
    # mj_instantiateContact row counts). All index maps are static.
    cd = collision_mod.point_condims(m)
    sel = (np.concatenate(
        [np.arange(3 * i, 3 * i + (1 if cd[i] == 1 else 3))
         for i in range(ncon)]).astype(np.int32)
        if ncon else np.zeros((0,), np.int32))
    ncrow = len(sel)
    # row index of each point's normal row; tangent rows follow it
    nrm_np = np.cumsum([0] + [1 if cd[i] == 1 else 3
                              for i in range(ncon)])[:-1].astype(np.int32)
    fric_pts = [i for i in range(ncon) if cd[i] >= 3]
    nrm_idx = jnp.asarray(nrm_np)
    fric_arr = jnp.asarray(np.asarray(fric_pts, np.int32))
    t1_idx = jnp.asarray(nrm_np[fric_pts] + 1) if fric_pts else None
    t2_idx = jnp.asarray(nrm_np[fric_pts] + 2) if fric_pts else None
    jc = _contact_jacobian(m, d)  # (npt, 3, nv)
    j_blocks.append(jc.reshape(-1, m.nv)[sel])
    # every row of a contact carries the contact distance (MuJoCo
    # mj_instantiateContact: shared efc_pos → shared impedance); the
    # POSITION TERM in aref is later masked to the normal row (norm_row)
    pos3 = jnp.stack([d.contact.dist] * 3, axis=-1)
    pos_list.append(pos3.reshape(-1)[sel])
    solref_list.append(jnp.repeat(d.contact.solref, 3, axis=0)[sel])
    solimp_list.append(jnp.repeat(d.contact.solimp, 3, axis=0)[sel])

    # angular friction rows for condim ≥ 4 pairs (static point lists):
    # one torsional row (about the normal) per condim≥4 point, two
    # rolling rows (about the tangents) per condim-6 point — what makes
    # pinch grasps torsionally stable (reference handover box condim=6)
    from mujoco_mpc_tpu.physics import collision as collision_mod
    tor_pts, roll_pts = collision_mod.angular_points(m)
    if tor_pts:
      j_blocks.append(_angular_rows(m, d, tor_pts, [0]))
      ti = jnp.asarray(tor_pts, dtype=jnp.int32)
      pos_list.append(d.contact.dist[ti])  # shared impedance (see above)
      solref_list.append(d.contact.solref[ti])
      solimp_list.append(d.contact.solimp[ti])
    if roll_pts:
      j_blocks.append(_angular_rows(m, d, roll_pts, [1, 2]))
      ri = jnp.asarray(roll_pts, dtype=jnp.int32)
      pos_list.append(jnp.tile(d.contact.dist[ri], 2))
      solref_list.append(jnp.tile(d.contact.solref[ri], (2, 1)))
      solimp_list.append(jnp.tile(d.contact.solimp[ri], (2, 1)))
  nang = len(tor_pts) + 2 * len(roll_pts)

  lim = _limit_rows(m, d)
  tlim = _tendon_limit_rows(m, d) if m.ntendon else None
  nlim = 0
  for block in (lim, tlim):
    if block is not None:
      jl, pl, sl = block
      nlim += jl.shape[0]
      j_blocks.append(jl)
      pos_list.append(pl)
      solref_list.append(sl)
      solimp_list.append(jnp.broadcast_to(
          jnp.asarray(_DEFAULT_SOLIMP, dtype=dtype), (jl.shape[0], 5)))

  eq = _equality_rows(m, d) if m.neq else None
  neq_rows = 0
  if eq is not None:
    je, pe, sre, sie = eq
    neq_rows = je.shape[0]
    j_blocks.append(je)
    pos_list.append(pe)
    solref_list.append(sre)
    solimp_list.append(sie)

  if not j_blocks:
    zero = jnp.zeros((m.nv,), dtype=dtype)
    return d.replace(qfrc_constraint=zero)

  jmat = jnp.concatenate(j_blocks)  # (nrow, nv)
  pos = jnp.concatenate(pos_list)  # (nrow,)
  solref = jnp.concatenate(solref_list)
  solimp = jnp.concatenate(solimp_list)
  nrow = jmat.shape[0]
  nuni = nrow - neq_rows  # unilateral rows (contacts + limits)

  # active rows: violated constraints (normal rows drive their friction
  # rows); equality rows are always active (bilateral soft constraints)
  eq_active = jnp.ones((neq_rows,), bool)
  if have_contacts:
    con_active = jnp.repeat(d.contact.dist < 0, 3)[sel]
    ang_active = []
    if tor_pts:
      ang_active.append(d.contact.dist[jnp.asarray(tor_pts)] < 0)
    if roll_pts:
      ang_active.append(
          jnp.tile(d.contact.dist[jnp.asarray(roll_pts)] < 0, 2))
    lim_active = (pos[ncrow + nang:nuni] < 0) if nlim \
        else jnp.zeros((0,), bool)
    active = jnp.concatenate(
        [con_active, *ang_active, lim_active, eq_active])
    # friction rows (tangential + angular) have no positional error
    nr_np = np.zeros((ncrow,), bool)
    nr_np[nrm_np] = True
    norm_row = jnp.concatenate([
        jnp.asarray(nr_np),
        jnp.zeros((nang,), bool),
        jnp.ones((nlim + neq_rows,), bool)])
  else:
    active = jnp.concatenate([pos[:nuni] < 0, eq_active])
    norm_row = jnp.ones((nrow,), bool)
  # bilateral rows keep the full signed position error
  bilat = jnp.concatenate([jnp.zeros((nuni,), bool),
                           jnp.ones((neq_rows,), bool)])

  imp = _impedance(pos, solimp)
  k, b = _kb(solref, solimp[..., 1])
  vel = jmat @ d.qvel
  pos_term = jnp.where(
      bilat, pos, jnp.where(norm_row, jnp.minimum(pos, 0.0), 0.0))
  aref = -imp * (k * pos_term + b * vel)

  # Delassus operator A = J M⁻¹ Jᵀ and smooth residual a0 = J qacc_smooth.
  # Two regimes sharing one iterate sequence (mirrors physics/tilestep.py
  # so the general and tile paths stay equivalence-testable):
  #  - dense: materialize A — best for small row counts;
  #  - matrix-free: A·x = J·(M⁻¹Jᵀ·x). Materializing A for a big-nrow
  #    model is HBM-bound, not FLOP-bound: the Rubik-in-hand plant has
  #    nrow=344, so A is 473 KB/candidate and each APGD matvec re-reads
  #    it — ~10 GB/step at 1024 candidates. The two skinny factors
  #    (nrow×nv each) are ~10× less traffic at equal math.
  from mujoco_mpc_tpu.physics.tilestep import amat_is_dense
  minv_jt = linalg.chol_solve(chol_factor, jmat.T)  # (nv, nrow)
  dense_amat = amat_is_dense(nrow)
  if dense_amat:
    amat = jmat @ minv_jt
    raw_diag = jnp.diag(amat)

    def amat_mul(x):
      return amat @ x
  else:
    raw_diag = jnp.einsum("rk,kr->r", jmat, minv_jt)

    def amat_mul(x):
      return jmat @ (minv_jt @ x)
  # Degenerate rows: A_rr ≈ 0 means no DOF can produce acceleration along
  # this row (e.g. the out-of-plane translation of a connect equality on a
  # planar hinge chain — J_row ≈ 0). The dual QP is near-singular there:
  # its "exact" solution carries an enormous null-direction force that
  # APGD never converges to, and a warm start *integrates* that component
  # across steps (observed: 0.003 → 0.10 rad drift on the closed-chain
  # oracle test). Force along such a row does no work on the system, so
  # deactivate it outright — MuJoCo's primal Newton solve never sees the
  # degenerate dual direction at all. Bilateral (equality) rows are
  # exempt: their regularizer below is floored by the compile-time
  # diagApprox, so a degenerate row's dual stays bounded (and its force
  # does no work since J_row ≈ 0) — matching MuJoCo, which keeps the row.
  active = active & ((raw_diag > 1e-8 * jnp.max(raw_diag)) | bilat)
  diag = jnp.clip(raw_diag, 1e-10, None)
  # Softness R: (1−d)/d · diagApprox. For unilateral rows the live
  # Delassus diagonal ≈ MuJoCo's approximation and tracks the true
  # conditioning; for equality rows use the compile-time invweight0
  # diagApprox (Model.eq_diagapprox) exactly as MuJoCo does — the live
  # A_rr vanishes when the row's Jacobian degenerates, which would send
  # the dual (aref−a0)/(A_rr+R) to infinity (observed: λ ≈ 1.3e4 vs
  # MuJoCo's 0.1 on the closed-chain connect test).
  reg_base = diag
  if neq_rows and len(m.eq_diagapprox) == neq_rows:
    reg_base = jnp.concatenate(
        [diag[:nuni], jnp.asarray(m.eq_diagapprox, dtype=dtype)])
  reg = (1.0 - imp) / imp * reg_base
  a0 = jmat @ qacc_smooth

  tor_idx = jnp.asarray(tor_pts, dtype=jnp.int32) if tor_pts else None
  roll_idx = jnp.asarray(roll_pts, dtype=jnp.int32) if roll_pts else None
  ntor = len(tor_pts)
  nroll = len(roll_pts)

  # ---- Jacobi preconditioning. Angular rows have Delassus diagonals
  # ~1/inertia vs the normal rows' ~1/mass — a condition number in the
  # thousands for any box-scale object (measured: λmax 192k vs the
  # normal-row modes' ~200 for a 5 cm box). Unpreconditioned, the APGD
  # step collapses to 1/λmax and the dual FREEZES at its warm start,
  # pumping energy (resting condim-4 box bounced to z = 0.2). Solve in
  # g = f/s with s = 1/sqrt(diag+reg): the scaled operator has unit
  # diagonal, κ drops to O(1). Scales are TIED within each tangent and
  # rolling pair so the friction cone stays circular — scaling then just
  # rescales μ (standard P-APGD contact treatment).
  dr = diag + reg
  dr_s = dr
  if t1_idx is not None:
    mt = 0.5 * (dr[t1_idx] + dr[t2_idx])
    dr_s = dr_s.at[t1_idx].set(mt).at[t2_idx].set(mt)
  if nroll:
    r1_idx = jnp.arange(ncrow + ntor, ncrow + ntor + nroll)
    r2_idx = r1_idx + nroll
    mr = 0.5 * (dr[r1_idx] + dr[r2_idx])
    dr_s = dr_s.at[r1_idx].set(mr).at[r2_idx].set(mr)
  s_pre = 1.0 / jnp.sqrt(jnp.clip(dr_s, 1e-12, None))  # (nrow,)
  # cone coefficients in scaled coordinates: μ̃ = μ·s_normal/s_friction
  if have_contacts:
    s_n = s_pre[nrm_idx]  # (ncon,)
    if t1_idx is not None:
      mu_t = (d.contact.friction[fric_arr] * s_n[fric_arr]
              / s_pre[t1_idx])
    if ntor:
      mu_tor = (d.contact.torsion[tor_idx] * s_n[tor_idx]
                / s_pre[ncrow + jnp.arange(ntor)])
    if nroll:
      mu_roll = (d.contact.roll[roll_idx] * s_n[roll_idx]
                 / s_pre[r1_idx])

  def project(g):
    """Projection in preconditioned coordinates (caps use scaled μ)."""
    if have_contacts:
      gn = jnp.maximum(g[nrm_idx], 0.0)  # (ncon,) point order
      blk = jnp.zeros((ncrow,), dtype).at[nrm_idx].set(gn)
      if t1_idx is not None:
        gt1, gt2 = g[t1_idx], g[t2_idx]
        tsq = gt1 * gt1 + gt2 * gt2
        tnorm = jnp.sqrt(jnp.where(tsq < 1e-24, 1.0, tsq))
        tnorm = jnp.where(tsq < 1e-24, 0.0, tnorm)
        cap = mu_t * gn[fric_arr]
        scale = jnp.where(tnorm > cap, cap / jnp.maximum(tnorm, 1e-12),
                          1.0)
        blk = blk.at[t1_idx].set(gt1 * scale).at[t2_idx].set(gt2 * scale)
      parts = [blk]
      if nang:
        # angular caps couple to the SAME point's normal force iterate
        # (separate interval/disc projections — a box approximation of
        # MuJoCo's coupled elliptic cone, fine for soft-contact MPC)
        ga = g[ncrow:ncrow + nang]
        if ntor:
          cap_t = mu_tor * gn[tor_idx]
          parts.append(jnp.clip(ga[:ntor], -cap_t, cap_t))
          ga = ga[ntor:]
        if nroll:
          r1, r2 = ga[:nroll], ga[nroll:]
          rsq = r1 * r1 + r2 * r2
          rnorm = jnp.sqrt(jnp.where(rsq < 1e-24, 1.0, rsq))
          rnorm = jnp.where(rsq < 1e-24, 0.0, rnorm)
          cap_r = mu_roll * gn[roll_idx]
          rs = jnp.where(rnorm > cap_r,
                         cap_r / jnp.maximum(rnorm, 1e-12), 1.0)
          parts.extend([r1 * rs, r2 * rs])
      fl = jnp.maximum(g[ncrow + nang:nuni], 0.0)
      g = jnp.concatenate(parts + [fl, g[nuni:]])
    else:
      # unilateral rows clamp to the nonnegative orthant; bilateral
      # (equality) rows are unconstrained in sign
      g = jnp.where(bilat, g, jnp.maximum(g, 0.0))
    return jnp.where(active, g, 0.0)

  # Accelerated projected gradient (APGD, the standard parallel scheme for
  # contact QPs) on MuJoCo's regularized dual:
  #   min_f ½ fᵀ(A + R) f + (a0 − aref)ᵀ f   s.t. f ∈ cone
  # where R = diag((1−d)/d · diag(A)) is the solimp softness — the
  # regularizer belongs in the *objective* (MuJoCo's soft constraint
  # semantics), not just the step size. Fully parallel per row (no PGS
  # sweeps → no sequential scan on TPU); the step uses the Gershgorin
  # bound λmax(A+R) ≤ max row abs-sum, and Nesterov momentum restarts on
  # non-monotone steps.
  b_vec = a0 - aref

  # Step size = 1/λmax(Ã) on the PRECONDITIONED operator
  # Ã = S(A+R)S, S = diag(s_pre). Rule matches the tile megakernel per
  # model (physics/tilestep.py) so general and tile paths share one
  # iterate sequence: Gershgorin row sums when the tile path materializes
  # A (cheap there), power iteration when the tile path is matrix-free.
  # The 1.25 factor covers the Rayleigh quotient's underestimate;
  # Nesterov restart absorbs the rest.
  # Step-size denominators are FLOORED AT 1: Ã has (near-)unit diagonal,
  # so λmax(Ã) ≥ ~1 whenever any row is active — the floor only binds
  # when every row is inactive, where the forward output is zero anyway
  # but an unfloored 1/1e-8 = 1e8 step NaNs the BACKWARD pass (the
  # gradient planners hit this on any state with no active constraints).
  if dense_amat:
    row_sum = s_pre * (jnp.abs(amat) @ s_pre) + s_pre * s_pre * reg
    step = 1.0 / jnp.maximum(
        jnp.max(jnp.where(active, row_sum, 0.0)), 1.0)
  else:
    def opmul(v):
      """Ã v restricted to active rows (inactive g pinned at 0)."""
      v = jnp.where(active, v, 0.0)
      sv = s_pre * v
      return jnp.where(active, s_pre * (amat_mul(sv) + reg * sv), 0.0)

    v = jnp.where(active, 1.0, 0.0).astype(dtype)
    for _ in range(_POWER_ITERS):
      w = opmul(v)
      # sqrt(max(·)) not max(sqrt(·)): at w = 0 (no active rows) the
      # gradient of sqrt is ∞ and 0·∞ NaNs reverse-mode AD
      v = w / jnp.sqrt(jnp.maximum(jnp.sum(w * w), 1e-30))
    lam = jnp.sum(v * opmul(v))
    step = 1.0 / jnp.maximum(1.25 * lam, 1.0)

  def grad(g):
    f = s_pre * g
    return s_pre * (amat_mul(f) + reg * f + b_vec)

  # Warm start: last step's converged duals (cold → diagonal-
  # preconditioned init; branch-free select keeps one trace). Bilateral
  # (equality) rows are excluded from the warm start: their duals are
  # unprojected (no cone), often stiff/near-decoupled (dual ~ 1/A_rr),
  # and the gradient loop's scalar step ~1/λmax cannot correct a stale
  # value along a tiny-eigenvalue direction — carrying it across steps
  # integrates a signed force bias (observed: 0.003 → 0.10 rad drift on
  # the closed-chain equality oracle). The per-row init (aref − a0)/D is
  # the exact solution for a decoupled row, so equality rows re-init
  # from it every step. Tile kernels never see bilateral rows, so the
  # tile mirror (physics/tilestep.py) is unchanged.
  # per-row exact init, in scaled coordinates: g_init = f_init / s
  g_init = project((aref - a0) / (diag + reg) / s_pre)
  lam0 = d.efc_lambda
  if lam0 is not None and lam0.shape[0] == nrow:
    cold = jnp.sum(jnp.abs(lam0)) == 0
    # angular (torsional/rolling) rows are ALSO excluded from the warm
    # start: a flat box-on-plane contact instantiates several corner
    # points whose angular rows share one Jacobian, so their duals are
    # non-unique — warm-starting a non-unique dual integrates drift
    # across steps. Same rationale as the bilateral exclusion below.
    nw_np = np.zeros((nrow,), bool)
    nw_np[ncrow:ncrow + nang] = True
    no_warm = jnp.asarray(nw_np) | bilat
    warm = jnp.where(no_warm, g_init, lam0.astype(dtype) / s_pre)
    g0 = project(jnp.where(cold, g_init, warm))
  else:
    g0 = g_init

  def body(_, carry):
    g, y, t = carry
    g_new = project(y - step * grad(y))
    t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
    beta = (t - 1.0) / t_new
    # restart momentum when the step reverses direction (Nesterov restart)
    dg = g_new - g
    reverse = jnp.sum(dg * (y - g_new)) > 0
    y_new = jnp.where(reverse, g_new, g_new + beta * dg)
    t_new = jnp.where(reverse, 1.0, t_new)
    return g_new, y_new, t_new

  # data-derived momentum init: under shard_map the loop carry must have
  # a consistent varying-axis type (a literal 1.0 is replicated while the
  # in-loop restart value is varying — the VMA checker rejects the mix)
  t_init = 1.0 + 0.0 * jnp.sum(g0)
  g, _, _ = jax.lax.fori_loop(0, _ITERATIONS, body, (g0, g0, t_init))
  f = s_pre * g  # back to physical dual forces

  qfrc = jmat.T @ f
  lam_out = (f.astype(d.efc_lambda.dtype)
             if d.efc_lambda is not None and d.efc_lambda.shape[0] == nrow
             else d.efc_lambda)
  if have_contacts:
    force = jnp.zeros((ncon, 3), dtype).at[:, 0].set(f[nrm_idx])
    if t1_idx is not None:
      force = force.at[fric_arr, 1].set(f[t1_idx])
      force = force.at[fric_arr, 2].set(f[t2_idx])
    contact = d.contact.replace(force=force)
    return d.replace(qfrc_constraint=qfrc, contact=contact,
                     efc_lambda=lam_out)
  return d.replace(qfrc_constraint=qfrc, efc_lambda=lam_out)
