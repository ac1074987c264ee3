"""Megakernel rollouts: the whole candidate-rollout loop as ONE Pallas call.

The sampling-family planners evaluate N open-loop action sequences through
T physics steps and keep the return — the framework's hot path (reference
fan-out: mjpc/planners/sampling/planner.cc:355-393). Under plain XLA each
step lowers to ~190 kernel launches (tiny per-candidate matrices → layout
copies + dispatch dominate, measured 0.37 ms/step at B=1024 on v5e). Here
the entire T-step rollout — kinematics, CRB/RNE, contact PGS, cost — runs
inside one Pallas kernel in tile layout (physics/tilestep.py): every
physical scalar is an (S,128) tile of candidates resident in VMEM, so the
VPU runs at full lane utilization with zero HBM round-trips between steps.

Built once per (task, horizon) from the concrete model (constants baked
in); runtime-tunable TaskParams stay kernel operands. Falls back cleanly:
planners keep the general vmap path whenever the model is outside
tilestep's supported class.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.ops import norms
from mujoco_mpc_tpu.ops.rollout import MAX_RETURN
from mujoco_mpc_tpu.physics import tilestep
from mujoco_mpc_tpu.tasks.base import CostSpec, Task, TaskParams

_RISK_TOL = 1e-6


# ---------------------------------------------------------------------------
# tile cost: norms reduce over the leading (residual) axis
# ---------------------------------------------------------------------------


def _norm_value_t(x, norm: norms.NormType, p, q):
  """Norm of residual block x (nres_k, *b), reduced over axis 0."""
  norm = norms.NormType(norm)
  if norm == norms.NormType.NULL:
    return x[0]
  if norm == norms.NormType.QUADRATIC:
    return 0.5 * jnp.sum(x * x, axis=0)
  if norm == norms.NormType.L22:
    c = jnp.sum(x * x, axis=0)
    return jnp.power(jnp.power(c, q / 2) + jnp.power(p, q), 1.0 / q) - p
  if norm == norms.NormType.L2:
    return jnp.sqrt(jnp.sum(x * x, axis=0) + p * p) - p
  if norm == norms.NormType.COSH:
    # explicit exponentials: Mosaic has no cosh lowering
    z = x / p
    return jnp.sum(p * p * (0.5 * (jnp.exp(z) + jnp.exp(-z)) - 1.0), axis=0)
  if norm == norms.NormType.POWER_LOSS:
    return jnp.sum(jnp.power(jnp.abs(x), p), axis=0)
  if norm == norms.NormType.SMOOTH_ABS:
    return jnp.sum(jnp.sqrt(x * x + p * p) - p, axis=0)
  if norm == norms.NormType.SMOOTH_ABS2:
    return jnp.sum(
        jnp.power(jnp.power(jnp.abs(x), q) + jnp.power(p, q), 1.0 / q) - p,
        axis=0)
  if norm == norms.NormType.RECTIFY:
    safe_p = jnp.maximum(p, 1e-10)
    soft = jnp.sum(safe_p * jnp.log1p(jnp.exp(x / safe_p)), axis=0)
    hard = jnp.sum(jnp.maximum(x, 0.0), axis=0)
    return jnp.where(p > 0, soft, hard)
  raise ValueError(f"unknown norm {norm}")


def cost_value_t(spec: CostSpec, weights, norm_params, risk, res,
                 scale=None):
  """Tile analogue of tasks.base.cost_value; res (nres, *b).

  weights (nterm,1,1), norm_params (nterm,2,1,1)-like, risk (1,1): shaped
  so scalar slices broadcast against (*b) tiles. `scale` is the optional
  state-dependent (nterm,)-leading multiplier from Task.weight_mod.
  """
  total = None
  shift = 0
  for k in range(spec.nterm):
    block = res[shift:shift + spec.dims[k]]
    val = _norm_value_t(block, spec.norm_types[k],
                        norm_params[k, 0], norm_params[k, 1])
    term = weights[k] * val
    if scale is not None:
      term = term * scale[k]
    total = term if total is None else total + term
    shift += spec.dims[k]
  risky = (jnp.exp(risk * total) - 1.0) / jnp.where(
      jnp.abs(risk) < _RISK_TOL, 1.0, risk)
  return jnp.where(jnp.abs(risk) < _RISK_TOL, total, risky)


# ---------------------------------------------------------------------------
# the rollout body (shared by the Pallas kernel and the XLA test path)
# ---------------------------------------------------------------------------


def _rollout_body(tm, task, horizon, qpos0, qvel0, action_fn, b, dtype,
                  weights, norm_params, risk, res_params, t0,
                  mocap_pos=None, mocap_quat=None, userdata=None):
  """Full rollout in tile layout.

  action_fn(i) -> (nu, *b) controls for step i (a dynamic ref read inside
  the Pallas kernel; a dynamic_index_in_dim on the XLA path).
  mocap_pos/mocap_quat (nmocap, 3/4)-leading and userdata
  (nuserdata,)-leading are rollout-constant (broadcastable over *b).
  Returns mean per-step cost (*b) with nan→MAX_RETURN divergence guard.
  """
  def bcast(x, lead):
    """(lead,) → (lead,)+b one axis at a time (Mosaic cannot broadcast
    sublanes and lanes in a single op)."""
    out = x.reshape((lead,) + (1,) * len(b)).astype(dtype)
    shape = [lead] + [1] * len(b)
    for ax in range(len(b), 0, -1):  # lane axis first, then sublanes
      shape[ax] = b[ax - 1]
      out = jnp.broadcast_to(out, tuple(shape))
    return out

  qpos = bcast(qpos0, tm.nq)
  qvel = bcast(qvel0, tm.nv)
  total0 = qpos[0] * 0.0  # input-derived zero (Pallas constant rule)
  # APGD warm-start carry: zeros = cold first step (solver.py semantics)
  lam0 = jnp.zeros((max(tm.nrow, 1),) + b, dtype=dtype) + total0[None]

  def body(i, carry):
    qpos, qvel, lam, total = carry
    u = action_fn(i)
    qpos, qvel, view = tilestep.step_tb(
        tm, qpos, qvel, u, mocap_pos=mocap_pos, mocap_quat=mocap_quat,
        userdata=userdata, efc_lambda=lam)
    view.time = t0 + (i + 1) * tm.timestep
    res = task.residual(task.model, view, res_params)
    scale = (task.weight_mod(task.model, view, res_params)
             if task.weight_mod is not None else None)
    c = cost_value_t(task.spec, weights, norm_params, risk, res, scale)
    return qpos, qvel, view.efc_lambda, total + c

  _, _, _, total = jax.lax.fori_loop(
      0, horizon, body, (qpos, qvel, lam0, total0))
  total = total / horizon
  return jnp.where(jnp.isfinite(total), total, MAX_RETURN)


class MegaRollout:
  """Whole-rollout Pallas kernel for a concrete (task, horizon).

  Build OUTSIDE jit (bakes model constants); call `returns` inside jit.
  Raises tilestep.UnsupportedModel when the model is out of class, or
  UnsupportedModel when the task residual touches fields tilestep does not
  provide (probed at build time by tracing).
  """

  def __init__(self, task: Task, horizon: int, block: int = 0,
               interpret: bool = False):
    self.tm = tilestep.extract(task.model)
    # numpy-ify the model: under jit, even ops on CONCRETE jnp arrays are
    # staged onto the innermost trace (omnistaging) — inside the kernel
    # trace they would become captured array constants, which Pallas
    # rejects. numpy stays eager under any trace, so model reads in
    # residuals fold to inline scalar literals.
    model_np = jax.tree_util.tree_map(np.asarray, task.model)
    self.task = task.replace(model=model_np)
    self.acts_hbm = False  # _pick_block may switch actions to HBM + DMA
    self.horizon = horizon
    self.block = block or self._pick_block(horizon)
    self.interpret = interpret
    # probe: residual + cost must trace in tile layout
    nmc, nud = max(self.tm.nmocap, 1), max(self.tm.nuserdata, 1)
    jax.eval_shape(
        lambda q, v, a, w, npar, r, rp, t, mp, mq, ud: _rollout_body(
            self.tm, task, 2, q, v,
            lambda i: jax.lax.dynamic_index_in_dim(a, i, 0, False),
            a.shape[2:], a.dtype, w, npar, r, rp, t,
            mocap_pos=mp, mocap_quat=mq, userdata=ud),
        jax.ShapeDtypeStruct((self.tm.nq,), jnp.float32),
        jax.ShapeDtypeStruct((self.tm.nv,), jnp.float32),
        jax.ShapeDtypeStruct((2, self.tm.nu, 4, 128), jnp.float32),
        jax.ShapeDtypeStruct((task.spec.nterm, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((task.spec.nterm, 2, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((len(task.param_names), 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((nmc, 3, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((nmc, 4, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((nud, 1, 1), jnp.float32),
    )

  def _pick_block(self, horizon: int) -> int:
    """Candidate block = the full (8, 128) f32 tile (1024 candidates).

    Every stacked scalar occupies one (≤8, 128) f32 tile = 4 KB covering
    the whole (sub, 128) candidate block — VMEM use is a TILE COUNT,
    independent of sub, so a bigger block is the same memory at
    proportionally more lanes. Only the action buffer scales with the
    block; when it does not fit next to the fixed working set, it stays
    in HBM and the kernel DMAs one (nu, sub, 128) slab per step
    (self.acts_hbm).
    """
    tm = self.tm
    dense = tilestep.amat_is_dense(tm.nrow)
    # peak ≈ solver phase: support-sparse J blocks (built progressively,
    # no 2x at a stacking moment) + amat/X on the dense path + APGD
    # vectors + the Cholesky factor + transient scratch. The view/residual
    # phase after the solve is strictly smaller (solver arrays dead).
    tiles = (tilestep.jacobian_tiles(tm)          # support-sparse J blocks
             + (tm.nrow ** 2 + tm.nrow * tm.nv    # amat + X (dense)
                if dense else 10 * tm.nv)         # block scratch (freed)
             + 6 * tm.nrow                        # APGD vectors
             + tm.nv * tm.nv                      # Cholesky factor
             + 20 * tm.nbody + 300)               # kinematics live set
    fixed = tiles * 4096
    # 15.5 MB of the 16 MB VMEM: the estimate above over-counts transient
    # liveness (verified empirically: the dm_control humanoid's ~14.5 MB
    # estimate compiles and runs at block=1024 on v5e)
    budget = 15872 * 1024
    act_bytes = 4 * horizon * tm.nu * 1024
    self.acts_hbm = fixed + act_bytes > budget
    if fixed > budget:
      raise tilestep.UnsupportedModel(
          f"constraint working set ~{fixed >> 20} MB exceeds VMEM")
    return 1024

  def _aux_operands(self, mocap_pos, mocap_quat, userdata, nb):
    """Mocap/userdata operands shaped (lead...,) + (1,)*nb, never empty."""
    tm = self.tm
    f32 = jnp.float32
    nmc, nud = max(tm.nmocap, 1), max(tm.nuserdata, 1)
    one = (1,) * nb

    def none_if_empty(x):
      return None if x is None or jnp.asarray(x).size == 0 else x

    mocap_pos = none_if_empty(mocap_pos)
    mocap_quat = none_if_empty(mocap_quat)
    userdata = none_if_empty(userdata)
    mp = (jnp.zeros((nmc, 3), f32) if mocap_pos is None
          else jnp.asarray(mocap_pos, f32).reshape(nmc, 3))
    default_q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], f32), (nmc, 1))
    mq = (default_q if mocap_quat is None
          else jnp.asarray(mocap_quat, f32).reshape(nmc, 4))
    ud = (jnp.zeros((nud,), f32) if userdata is None
          else jnp.asarray(userdata, f32).reshape(nud))
    return (mp.reshape((nmc, 3) + one), mq.reshape((nmc, 4) + one),
            ud.reshape((nud,) + one))

  # ------------------------------------------------------------------ pallas
  def returns(self, qpos0, qvel0, actions, params: TaskParams, t0,
              mocap_pos=None, mocap_quat=None, userdata=None, vma=None):
    """Candidate returns (N,) for actions (N, T, nu); qpos0/qvel0 (nq,/nv,).

    N must be a multiple of 128. One grid program per `block` candidates.
    `vma`: mesh axis names the output varies over — required when the
    kernel runs inside a VMA-checked shard_map (pallas_call cannot infer
    output vma; jax insists it be explicit on the out ShapeDtypeStruct).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tm, T = self.tm, self.horizon
    n = actions.shape[0]
    if n % 128:
      raise ValueError(f"candidate count {n} must be a multiple of 128")
    blk = min(self.block, n)
    while n % blk:  # largest 128-multiple block that tiles n evenly
      blk -= 128
    sub = blk // 128
    grid = n // blk
    nterm = self.task.spec.nterm
    nrp = max(len(self.task.param_names), 1)

    f32 = jnp.float32
    bshape = (sub, 128)
    # (N, T, nu) → (G, T, nu, S, 128): candidate n = (g, s, l)
    acts = actions.astype(f32).transpose(1, 2, 0).reshape(
        (T, tm.nu, grid) + bshape)
    acts = jnp.moveaxis(acts, 2, 0)  # (G, T, nu, S, 128)
    w = params.weights.astype(f32).reshape(nterm, 1, 1)
    npar = params.norm_params.astype(f32).reshape(nterm, 2, 1, 1)
    risk = params.risk.astype(f32).reshape(1, 1)
    rp = jnp.zeros((nrp,), f32)
    if len(self.task.param_names):
      rp = params.residual_params.astype(f32)
    rp = rp.reshape(nrp, 1, 1)
    t0a = jnp.asarray(t0, f32).reshape(1, 1)
    qp = qpos0.astype(f32).reshape(tm.nq, 1)
    qv = qvel0.astype(f32).reshape(max(tm.nv, 1), 1)
    mp, mq, ud = self._aux_operands(mocap_pos, mocap_quat, userdata, 2)
    acts_hbm = self.acts_hbm and not self.interpret

    def kernel(qp_ref, qv_ref, act_ref, w_ref, npar_ref, risk_ref, rp_ref,
               t0_ref, mp_ref, mq_ref, ud_ref, out_ref, *scratch):
      from jax.experimental import pallas as pl  # noqa: shadows outer import
      if acts_hbm:
        act_vmem, sem = scratch
        g = pl.program_id(0)

        def action_fn(i):
          # actions live in HBM (the fixed working set fills VMEM);
          # DMA one (nu, S, 128) slab per step — ~µs against the step's
          # constraint solve
          cp = pltpu.make_async_copy(act_ref.at[g, i], act_vmem, sem)
          cp.start()
          cp.wait()
          return act_vmem[:]
      else:
        action_fn = lambda i: act_ref[0, pl.ds(i, 1)][0]  # noqa: E731
      out_ref[0] = _rollout_body(
          tm, self.task, T,
          qp_ref[:, 0], qv_ref[:, 0], action_fn, bshape, jnp.float32,
          w_ref[:], npar_ref[:], risk_ref[0, 0], rp_ref[:],
          t0_ref[0, 0], mocap_pos=mp_ref[:], mocap_quat=mq_ref[:],
          userdata=ud_ref[:])

    vm = pltpu.VMEM

    def spec(shape, blocked_first=False):
      if blocked_first:
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=vm)
      return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                          memory_space=vm)

    if acts_hbm:
      act_spec = pl.BlockSpec(memory_space=pltpu.ANY)
      scratch_shapes = [pltpu.VMEM((tm.nu,) + bshape, f32),
                        pltpu.SemaphoreType.DMA]
    else:
      act_spec = spec((1, T, tm.nu) + bshape, blocked_first=True)
      scratch_shapes = []
    if vma is None:
      out_sds = jax.ShapeDtypeStruct((grid,) + bshape, f32)
    else:
      out_sds = jax.ShapeDtypeStruct((grid,) + bshape, f32,
                                     vma=frozenset(vma))
    out = pl.pallas_call(
        kernel,
        out_shape=out_sds,
        grid=(grid,),
        in_specs=[
            spec((tm.nq, 1)),
            spec((max(tm.nv, 1), 1)),
            act_spec,
            spec((nterm, 1, 1)),
            spec((nterm, 2, 1, 1)),
            spec((1, 1)),
            spec((nrp, 1, 1)),
            spec((1, 1)),
            spec(mp.shape),
            spec(mq.shape),
            spec(ud.shape),
        ],
        out_specs=spec((1,) + bshape, blocked_first=True),
        scratch_shapes=scratch_shapes,
        interpret=self.interpret,
    )(qp, qv, acts, w, npar, risk, rp, t0a, mp, mq, ud)
    return out.reshape(n)

  # --------------------------------------------------------------- xla path
  def returns_xla(self, qpos0, qvel0, actions, params: TaskParams, t0,
                  mocap_pos=None, mocap_quat=None, userdata=None):
    """Same math as `returns` under plain XLA (1-D trailing batch) — used
    for correctness tests and as a CPU fallback."""
    tm, T = self.tm, self.horizon
    n = actions.shape[0]
    nterm = self.task.spec.nterm
    nrp = max(len(self.task.param_names), 1)
    f32 = jnp.float32
    acts = actions.astype(f32).transpose(1, 2, 0)  # (T, nu, N)
    w = params.weights.astype(f32).reshape(nterm, 1)
    npar = params.norm_params.astype(f32).reshape(nterm, 2, 1)
    risk = params.risk.astype(f32)
    rp = jnp.zeros((nrp,), f32)
    if len(self.task.param_names):
      rp = params.residual_params.astype(f32)
    rp = rp.reshape(nrp, 1)
    action_fn = lambda i: jax.lax.dynamic_index_in_dim(acts, i, 0, False)
    mp, mq, ud = self._aux_operands(mocap_pos, mocap_quat, userdata, 1)
    return _rollout_body(tm, self.task, T, qpos0.astype(f32),
                         qvel0.astype(f32), action_fn, (n,), f32,
                         w, npar, risk, rp, jnp.asarray(t0, f32),
                         mocap_pos=mp, mocap_quat=mq, userdata=ud)


def try_build(task: Task, horizon: int, **kw) -> Optional[MegaRollout]:
  """MegaRollout or None when the model/task is outside the supported
  class (planners fall back to the general vmap rollout)."""
  try:
    return MegaRollout(task, horizon, **kw)
  except tilestep.UnsupportedModel:
    return None
  except Exception:  # residual incompatible with the tile view
    return None
