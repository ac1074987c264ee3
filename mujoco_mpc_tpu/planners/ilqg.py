"""iLQG planner: autodiff linearization, Riccati scan, boxQP control limits.

Reference (mjpc/planners/ilqg/): FD model Jacobians (mjd_transitionFD via
model_derivatives.cc) → Riccati backward pass with regularization
(backward_pass.cc:65-253) → boxQP for control limits (boxqp.h:28) →
parallel line search → time-indexed affine feedback policy
u = ū + α·k + K(x−x̄) (ilqg/policy.cc:82-140).

TPU design decisions:
  - dynamics Jacobians via one vmapped jax.jacfwd over the whole horizon
    (T·(nx+nu) batched step evaluations on the MXU/VPU) instead of the
    reference's per-timestep FD threads;
  - cost expansion is Gauss-Newton from residual Jacobians + closed-form
    norm derivatives (PSD by construction, as in cost_derivatives.cc);
  - the Riccati recursion is a lax.scan (sequential by nature, small
    matrices) with fixed Levenberg regularization;
  - boxQP is a fixed-iteration masked projected Newton (no data-dependent
    loop exit, jit/vmap-friendly);
  - line search over α is a vmap of rollouts, winner by total return.

Quaternion models (nq > nv) are handled in the tangent space: the policy
state is x = (qpos, qvel) but all derivatives/feedback act on the 2·nv
tangent δx = (qpos ⊖ q̄pos, qvel − q̄vel) via manifold retraction/log-map —
the exact-AD analogue of the reference's quaternion-aware finite
differencing (mjpc/planners/model_derivatives.cc:91-96, mjd_transitionFD).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators.base import local_diff, retract
from mujoco_mpc_tpu.ops import linalg, norms
from mujoco_mpc_tpu.ops.rollout import MAX_RETURN
from mujoco_mpc_tpu.physics.step import step as phys_step
from mujoco_mpc_tpu.planners.base import PlanInfo
from mujoco_mpc_tpu.physics.types import Data
from mujoco_mpc_tpu.tasks.base import Task, TaskParams


@struct.dataclass
class ILQGPolicy:
  """Time-indexed affine feedback policy."""
  xs: jax.Array  # (T+1, nq+nv) nominal states (qpos ‖ qvel)
  us: jax.Array  # (T, nu) nominal actions
  gains: jax.Array  # (T, nu, 2·nv) tangent-space feedback K
  t0: jax.Array  # () time of step 0
  feedback_scale: jax.Array  # ()
  reg: jax.Array  # () adaptive Levenberg regularization


@dataclasses.dataclass(frozen=True)
class ILQGConfig:
  horizon: int = 100
  num_alphas: int = 8  # parallel line-search scales
  reg: float = 1e-5  # initial Levenberg regularization on V_xx
  reg_min: float = 1e-6
  reg_max: float = 1e2
  feedback_scale: float = 1.0
  interp: str = "linear"  # feedback interpolation: "zero" | "linear"
  # (reference ilqg/policy.cc kZero/kLinear representations)

  @classmethod
  def from_task(cls, task: Task, horizon_steps: Optional[int] = None):
    m = task.model
    dt = float(m.custom("agent_timestep", float(m.opt.timestep)))
    hor = horizon_steps or int(
        round(float(m.custom("agent_horizon", 1.0)) / dt))
    return cls(horizon=hor)


def boxqp(quu: jax.Array, qu: jax.Array, lo: jax.Array, hi: jax.Array,
          iters: int = 8) -> Tuple[jax.Array, jax.Array]:
  """min ½δᵀQδ + qᵀδ  s.t. lo ≤ δ ≤ hi  via masked projected Newton.

  Reference boxqp.h:28 (Tassa's projected-Newton boxQP), with a fixed
  iteration count and mask algebra instead of dynamic free-set resizing.
  Returns (δ*, free mask).
  """
  n = qu.shape[0]
  eye = jnp.eye(n, dtype=qu.dtype)

  def body(_, carry):
    delta, _ = carry
    grad = qu + quu @ delta
    at_lo = jnp.logical_and(delta <= lo + 1e-9, grad > 0)
    at_hi = jnp.logical_and(delta >= hi - 1e-9, grad < 0)
    clamped = jnp.logical_or(at_lo, at_hi)
    free = jnp.logical_not(clamped).astype(qu.dtype)
    fmask = jnp.outer(free, free)
    mat = quu * fmask + eye * (1.0 - free) + 1e-8 * eye
    rhs = -(grad * free)
    step = linalg.solve_sym(mat, rhs)  # PSD by construction
    delta = jnp.clip(delta + step * free, lo, hi)
    return delta, free

  delta0 = jnp.clip(jnp.zeros_like(qu), lo, hi)
  delta, free = jax.lax.fori_loop(0, iters, body,
                                  (delta0, jnp.ones_like(qu)))
  return delta, free


class ILQGPlanner:
  def __init__(self, config: ILQGConfig):
    self.config = config

  # --------------------------------------------------------------- helpers
  def _state(self, d: Data) -> jax.Array:
    return jnp.concatenate([d.qpos, d.qvel])

  def _tangent(self, m, x: jax.Array, x_ref: jax.Array) -> jax.Array:
    """x ⊖ x_ref → (2·nv,) tangent (quaternion-aware log map)."""
    nq = m.nq
    return jnp.concatenate([
        local_diff(m, x[:nq], x_ref[:nq]), x[nq:] - x_ref[nq:]])

  def _apply_tangent(self, m, x_ref: jax.Array, dx: jax.Array) -> jax.Array:
    """x_ref ⊕ dx → (nq+nv,) full state (manifold retraction)."""
    nq, nv = m.nq, m.nv
    return jnp.concatenate([
        retract(m, x_ref[:nq], dx[:nv]), x_ref[nq:] + dx[nv:]])

  def _step_xu(self, task: Task, d0: Data, x: jax.Array, u: jax.Array,
               t: jax.Array) -> jax.Array:
    """x' = f(x, u) through the full physics step. x = (qpos ‖ qvel)."""
    m = task.model
    nq = m.nq
    d = d0.replace(qpos=x[:nq], qvel=x[nq:], ctrl=u, time=t)
    d = phys_step(m, d)
    return jnp.concatenate([d.qpos, d.qvel])

  def _cost_expansion(self, task: Task, tp: TaskParams, d0: Data,
                      x: jax.Array, u: jax.Array, t: jax.Array):
    """Gauss-Newton expansion of the per-step cost in the tangent at (x, u)."""
    m = task.model
    nq, nv = m.nq, m.nv

    def res_fn(dxu):
      xf = self._apply_tangent(m, x, dxu[:2 * nv])
      d = d0.replace(qpos=xf[:nq], qvel=xf[nq:], ctrl=u + dxu[2 * nv:],
                     time=t)
      # residuals read kinematic quantities: recompute them
      from mujoco_mpc_tpu.physics import kinematics, dynamics
      d = kinematics.kinematics(m, d)
      d = dynamics.com_pos(m, d)
      d, _ = dynamics.com_vel(m, d)
      return task.residual(m, d, tp.residual_params)

    nxu = 2 * nv + m.nu
    dxu0 = jnp.zeros(nxu, dtype=x.dtype)
    r = res_fn(dxu0)
    jr = jax.jacfwd(res_fn)(dxu0)  # (nres, 2nv+nu)

    grad = jnp.zeros(nxu, dtype=x.dtype)
    hess = jnp.zeros((nxu, nxu), dtype=x.dtype)
    shift = 0
    for k in range(task.spec.nterm):
      dim = task.spec.dims[k]
      blk = r[shift:shift + dim]
      jb = jr[shift:shift + dim]
      _, g, h = norms.norm_grad_hess(
          blk, norms.NormType(task.spec.norm_types[k]),
          tp.norm_params[k, 0], tp.norm_params[k, 1])
      w = tp.weights[k]
      grad = grad + w * (jb.T @ g)
      hess = hess + w * (jb.T @ h @ jb)
      shift += dim
    return grad, hess

  # ------------------------------------------------------------------- API
  def init(self, task: Task) -> ILQGPolicy:
    m = task.model
    T = self.config.horizon
    dtype = m.qpos0.dtype
    mid = task.default_ctrl()
    # nominal qpos must be a valid manifold point (unit quaternions) for
    # the tangent log-map — seed with the model's reference configuration
    x0 = jnp.concatenate([m.qpos0, jnp.zeros(m.nv, dtype=dtype)])
    return ILQGPolicy(
        xs=jnp.tile(x0, (T + 1, 1)),
        us=jnp.tile(mid, (T, 1)),
        gains=jnp.zeros((T, m.nu, 2 * m.nv), dtype=dtype),
        t0=jnp.zeros((), dtype=dtype),
        feedback_scale=jnp.asarray(self.config.feedback_scale, dtype=dtype),
        reg=jnp.asarray(self.config.reg, dtype=dtype))

  def action(self, task: Task, policy: ILQGPolicy, data: Data) -> jax.Array:
    """u = ū_t + K_t (x − x̄_t) with linear interpolation of the feedback
    terms between time nodes (reference ilqg/policy.cc:82-140 representation
    kLinear; set config.interp="zero" for zero-order hold).

    Interpolation is done on the *evaluated* feedback u_i + K_i (x ⊖ x̄_i)
    of the two bracketing nodes — well-defined on quaternion manifolds,
    where interpolating x̄ itself is not."""
    m = task.model
    dt = m.opt.timestep
    T = self.config.horizon
    x = self._state(data)
    rel = (data.time - policy.t0) / dt
    idx = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, T - 1)

    def feedback(i):
      dx = self._tangent(m, x, policy.xs[i])
      return policy.us[i] + policy.feedback_scale * (policy.gains[i] @ dx)

    if self.config.interp == "zero":
      u = feedback(idx)
    else:
      idx1 = jnp.minimum(idx + 1, T - 1)
      frac = jnp.clip(rel - idx, 0.0, 1.0)
      u = (1.0 - frac) * feedback(idx) + frac * feedback(idx1)
    return jnp.where(m.actuator_ctrllimited,
                     jnp.clip(u, m.actuator_ctrlrange[:, 0],
                              m.actuator_ctrlrange[:, 1]), u)

  def _rollout_feedback(self, task: Task, tp: TaskParams, data: Data,
                        xs_ref, us_ref, gains, alpha, k_ff):
    """Forward pass with u_t = ū_t + α·k_t + K_t (x ⊖ x̄_t)."""
    m = task.model
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]

    from mujoco_mpc_tpu.tasks.base import cost_value

    def body(carry, inp):
      qpos, qvel, act, t, lam = carry  # slim carry + APGD warm start
      x_ref, u_ref, gain, kf = inp
      dx = self._tangent(m, jnp.concatenate([qpos, qvel]), x_ref)
      u = u_ref + alpha * kf + gain @ dx
      u = jnp.where(m.actuator_ctrllimited, jnp.clip(u, lo, hi), u)
      d = data.replace(qpos=qpos, qvel=qvel, act=act, time=t, ctrl=u,
                       efc_lambda=lam)
      d = phys_step(m, d)
      res = task.residual(m, d, tp.residual_params)
      c = cost_value(task.spec, tp, res)
      return ((d.qpos, d.qvel, d.act, d.time, d.efc_lambda),
              (c, jnp.concatenate([d.qpos, d.qvel]), u))

    _, (costs, xs, us) = jax.lax.scan(
        body, (data.qpos, data.qvel, data.act, data.time,
               data.efc_lambda),
        (xs_ref[:-1], us_ref, gains, k_ff))
    costs = jnp.nan_to_num(costs, nan=MAX_RETURN, posinf=MAX_RETURN,
                           neginf=MAX_RETURN)
    x0 = jnp.concatenate([data.qpos, data.qvel])
    xs_full = jnp.concatenate([x0[None], xs])
    return jnp.mean(costs), xs_full, us

  def optimize(self, task: Task, policy: ILQGPolicy, data: Data,
               rng: jax.Array, params: Optional[TaskParams] = None
               ) -> Tuple[ILQGPolicy, PlanInfo]:
    # TPU MXU default (bf16) destroys the 60-step Riccati recursion —
    # finite on CPU, NaN gains on TPU. Force f32 matmuls here.
    with jax.default_matmul_precision("highest"):
      return self._optimize(task, policy, data, rng, params)

  def _optimize(self, task: Task, policy: ILQGPolicy, data: Data,
                rng: jax.Array, params: Optional[TaskParams] = None
                ) -> Tuple[ILQGPolicy, PlanInfo]:
    del rng
    cfg = self.config
    m = task.model
    tp = params if params is not None else task.params
    T = cfg.horizon
    nv, nu = m.nv, m.nu
    nx = 2 * nv
    dt = m.opt.timestep

    # ---- nominal rollout with current feedback policy (Iteration,
    #      ilqg/planner.cc:377) — also re-anchors the time index
    ret0, xs, us = self._rollout_feedback(
        task, tp, data, policy.xs, policy.us, policy.gains,
        jnp.zeros((), dtype=data.qpos.dtype),
        jnp.zeros_like(policy.us))

    # ---- derivatives along the nominal (model_derivatives.cc:45 → one
    #      vmapped jacfwd over time)
    ts = data.time + dt * jnp.arange(T, dtype=data.qpos.dtype)

    def dyn_jac(x, x_next, u, t):
      # tangent-space transition Jacobian: δx' = A δx + B δu where
      # δx' = f(x ⊕ δx, u+δu) ⊖ x_next (exact-AD mjd_transitionFD analogue)
      def f(dxu):
        xf = self._apply_tangent(m, x, dxu[:nx])
        x2 = self._step_xu(task, data, xf, u + dxu[nx:], t)
        return self._tangent(m, x2, x_next)
      j = jax.jacfwd(f)(jnp.zeros(nx + nu, dtype=xs.dtype))
      return j[:, :nx], j[:, nx:]

    A, B = jax.vmap(dyn_jac)(xs[:-1], xs[1:], us, ts)  # (T,nx,nx), (T,nx,nu)
    cg, ch = jax.vmap(
        lambda x, u, t: self._cost_expansion(task, tp, data, x, u, t)
    )(xs[:-1], us, ts)  # (T, nx+nu), (T, nx+nu, nx+nu)

    cx, cu = cg[:, :nx], cg[:, nx:]
    cxx = ch[:, :nx, :nx]
    cuu = ch[:, nx:, nx:]
    cux = ch[:, nx:, :nx]

    lo = m.actuator_ctrlrange[:, 0]
    hi = m.actuator_ctrlrange[:, 1]
    eye = jnp.eye(nx, dtype=xs.dtype)
    reg = policy.reg  # adaptive (reference regularization ladder,
    # backward_pass.cc regularization types)

    # ---- Riccati backward scan with boxQP (backward_pass.cc:65-253)
    def riccati(carry, inp):
      vx, vxx = carry
      a, b, cx_t, cu_t, cxx_t, cuu_t, cux_t, u_t = inp
      # regularized Q terms drive the gains; UNregularized terms propagate
      # the value function (Tassa's scheme — leaking reg into V compounds
      # over the horizon and blows up, reference backward_pass.cc reg types)
      vxx_reg = vxx + reg * eye
      qx = cx_t + a.T @ vx
      qu = cu_t + b.T @ vx
      qxx = cxx_t + a.T @ vxx @ a
      eps_u = 1e-6 * jnp.eye(nu, dtype=xs.dtype)
      quu = cuu_t + b.T @ vxx @ b + eps_u
      qux = cux_t + b.T @ vxx @ a
      quu_r = cuu_t + b.T @ vxx_reg @ b + eps_u
      qux_r = cux_t + b.T @ vxx_reg @ a
      dlo = jnp.where(m.actuator_ctrllimited, lo - u_t,
                      jnp.full_like(u_t, -1e9))
      dhi = jnp.where(m.actuator_ctrllimited, hi - u_t,
                      jnp.full_like(u_t, 1e9))
      k_ff, free = boxqp(quu_r, qu, dlo, dhi)
      # gains on the free subspace: K = -Quu⁻¹ Qux, clamped rows zeroed
      fmask = jnp.outer(free, free)
      quu_f = quu_r * fmask + jnp.eye(nu, dtype=xs.dtype) * (1.0 - free)
      kmat = -linalg.solve_sym(quu_f, qux_r * free[:, None])
      vx_new = (qx + kmat.T @ quu @ k_ff + kmat.T @ qu + qux.T @ k_ff)
      vxx_new = (qxx + kmat.T @ quu @ kmat + kmat.T @ qux + qux.T @ kmat)
      vxx_new = 0.5 * (vxx_new + vxx_new.T)
      return (vx_new, vxx_new), (k_ff, kmat)

    v0 = (jnp.zeros(nx, dtype=xs.dtype), jnp.zeros((nx, nx), dtype=xs.dtype))
    _, (k_ffs, gains) = jax.lax.scan(
        riccati, v0, (A, B, cx, cu, cxx, cuu, cux, us), reverse=True)

    # ---- parallel line search over feedforward scale (planner.h:120-124)
    alphas = jnp.concatenate([
        jnp.zeros((1,), dtype=xs.dtype),
        jnp.exp(jnp.linspace(jnp.log(1e-3), jnp.log(1.0),
                             cfg.num_alphas - 1)).astype(xs.dtype)])

    def try_alpha(alpha):
      ret, xs_a, us_a = self._rollout_feedback(
          task, tp, data, xs, us, gains, alpha, k_ffs)
      return ret, xs_a, us_a

    rets, xs_all, us_all = jax.vmap(try_alpha)(alphas)
    best = jnp.argmin(rets)
    # regularization ladder: decrease on improvement, increase when even
    # the best feedforward fails to beat the zero-step rollout
    improved = rets[best] < rets[0] - 1e-8
    new_reg = jnp.clip(
        jnp.where(improved, policy.reg * 0.5, policy.reg * 10.0),
        cfg.reg_min, cfg.reg_max)
    new_policy = policy.replace(
        xs=xs_all[best], us=us_all[best], gains=gains, t0=data.time,
        reg=new_reg)
    info = PlanInfo(costs=rets, winner=best, best_return=rets[best])
    return new_policy, info
