"""Direct trajectory optimizer: Gauss-Newton over configurations q_{0:T}
and (optionally) model parameters θ — smoothing + system identification.

Reference (mjpc/direct/direct.{h,cc}, math in docs/DIRECT.md:12-60):
decision variables are configurations; velocities/accelerations come from
finite differences of q; the cost is sensor-residual norms plus a quadratic
inverse-dynamics force residual plus a parameter prior; per-timestep
mjd_inverseFD Jacobians are assembled into a banded Hessian factored with
mju_cholFactorBand (direct.cc:2342-2372) under a line/curve search
(Optimize, direct.cc:2109-2338). Pluggable model-parameter setters live in
mjpc/direct/model_parameters.h:26-52.

TPU re-design:
  - inverse dynamics is exact and differentiable (physics.step.inverse), so
    the per-timestep Jacobian blocks are one vmapped jacfwd over the window
    — no FD threads (direct.cc:1678-1781 fan-out);
  - residual r_t couples (q_{t-1}, q_t, q_{t+1}); the Gauss-Newton Hessian
    is block-pentadiagonal and is factored with a *blocked* band Cholesky
    (ops/band.py): an O(T) scan of nv×nv MXU tiles — O(T·nv²) memory at
    the reference's 64-step windows on humanoid-class nv. A dense
    (T·nv)² path remains as a fallback (config.solver="dense");
  - model parameters enter every stencil → arrowhead Hessian
    [band B, C; Cᵀ, D]; solved by a Schur complement on θ (nθ small)
    using band solves for B⁻¹C and B⁻¹gq;
  - tangent-space retractions make quaternion configurations exact;
  - sensor_weight may be per-sensor (the reference's noise weighting,
    direct.h:59-214).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.ops import band
from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import forward as phys_forward
from mujoco_mpc_tpu.physics.step import inverse as phys_inverse
from mujoco_mpc_tpu.physics.types import Model


@dataclasses.dataclass(frozen=True)
class ParameterSpec:
  """One pluggable model-parameter block (reference ModelParameters::Set,
  mjpc/direct/model_parameters.h:26-52): `apply` writes the θ slice into a
  Model pytree; the prior adds 0.5·w·‖θ − prior‖² to the cost."""
  name: str
  dim: int
  apply: Callable[[Model, jax.Array], Model]
  prior: Tuple[float, ...] = ()
  prior_weight: float = 1e-3


def dof_damping_parameter(indices: Sequence[int], prior=None,
                          prior_weight: float = 1e-3) -> ParameterSpec:
  """θ = damping of the given DoFs (reference Particle1DDampedParameters)."""
  idx = tuple(int(i) for i in indices)

  def apply(m: Model, theta: jax.Array) -> Model:
    return m.replace(dof_damping=m.dof_damping.at[jnp.asarray(idx)].set(
        theta.astype(m.dof_damping.dtype)))

  return ParameterSpec("dof_damping", len(idx), apply,
                       tuple(prior or [0.0] * len(idx)), prior_weight)


def body_mass_parameter(indices: Sequence[int], prior=None,
                        prior_weight: float = 1e-3) -> ParameterSpec:
  """θ = mass of the given bodies (inertia box scaled implicitly)."""
  idx = tuple(int(i) for i in indices)

  def apply(m: Model, theta: jax.Array) -> Model:
    th = theta.astype(m.body_mass.dtype)
    ratio = th / jnp.maximum(m.body_mass[jnp.asarray(idx)], 1e-9)
    # scale the inertia box with the mass (constant density assumption)
    inertia = m.body_inertia.at[jnp.asarray(idx)].mul(
        ratio[:, None], unique_indices=True)
    return m.replace(body_mass=m.body_mass.at[jnp.asarray(idx)].set(th),
                     body_inertia=inertia)

  return ParameterSpec("body_mass", len(idx), apply,
                       tuple(prior or [1.0] * len(idx)), prior_weight)


def site_pos_parameter(site_ids: Sequence[int], prior=None,
                       prior_weight: float = 1e-3) -> ParameterSpec:
  """θ = 3D positions of the given sites (reference
  Particle1DFramePosParameters)."""
  idx = tuple(int(i) for i in site_ids)

  def apply(m: Model, theta: jax.Array) -> Model:
    pos = theta.reshape(len(idx), 3).astype(m.site_pos.dtype)
    return m.replace(site_pos=m.site_pos.at[jnp.asarray(idx)].set(pos))

  return ParameterSpec("site_pos", 3 * len(idx), apply,
                       tuple(prior or [0.0] * (3 * len(idx))), prior_weight)


@dataclasses.dataclass(frozen=True)
class DirectConfig:
  horizon: int  # number of configurations T (window length)
  max_iterations: int = 10
  num_steps: int = 6  # backtracking line-search candidates
  sensor_weight: float = 1.0  # scalar, or per-sensor (ns,) via noise_weights
  force_weight: float = 1.0
  regularization: float = 1e-8
  solver: str = "band"  # "band" (O(T) blocked Cholesky) | "dense"


class DirectResult(NamedTuple):
  qpos: jax.Array  # (T, nq) optimized configurations
  cost: jax.Array  # () final cost
  cost_initial: jax.Array
  iterations: int
  parameters: Optional[jax.Array] = None  # (nθ,) identified parameters


class Direct:
  """Batched Gauss-Newton smoother / system-ID optimizer."""

  def __init__(self, model: Model, config: DirectConfig,
               sensor_start: int = 0, nsensordata: Optional[int] = None,
               parameters: Sequence[ParameterSpec] = (),
               noise_weights=None):
    self.model = model
    self.config = config
    self.sensor_start = sensor_start
    self.ns = (nsensordata if nsensordata is not None
               else model.nsensordata - sensor_start)
    self.parameters = tuple(parameters)
    self.ntheta = sum(p.dim for p in self.parameters)
    # per-sensor noise weighting (reference noise_sensor, direct.h)
    w = (jnp.full((self.ns,), config.sensor_weight)
         if noise_weights is None else jnp.asarray(noise_weights))
    self._sensor_w = w
    self._template = phys_io.make_data(model)

  # --------------------------------------------------------- parameter glue
  def _apply_params(self, theta: jax.Array) -> Model:
    m = self.model
    off = 0
    for p in self.parameters:
      m = p.apply(m, theta[off:off + p.dim])
      off += p.dim
    return m

  def default_parameters(self) -> jax.Array:
    if not self.parameters:
      return jnp.zeros((0,))
    return jnp.concatenate(
        [jnp.asarray(p.prior, dtype=jnp.result_type(float))
         for p in self.parameters])

  def _prior_cost(self, theta: jax.Array) -> jax.Array:
    c = jnp.zeros(())
    off = 0
    for p in self.parameters:
      d = theta[off:off + p.dim] - jnp.asarray(p.prior, dtype=theta.dtype)
      c = c + 0.5 * p.prior_weight * jnp.sum(d * d)
      off += p.dim
    return c

  def _prior_weight_vec(self, dtype) -> jax.Array:
    if not self.parameters:
      return jnp.zeros((0,), dtype=dtype)
    return jnp.concatenate([
        jnp.full((p.dim,), p.prior_weight, dtype=dtype)
        for p in self.parameters])

  # ------------------------------------------------------------- residuals
  def _window_residual(self, model, q_prev, q_cur, q_next, sensor_target,
                       ctrl):
    """Residual at one interior timestep from its 3-configuration stencil.

    [sensor residual; force residual], with v/a from finite differences of
    the configurations (reference direct.cc configuration evaluation).

    Convention: ctrls[t] is the control applied during the step that
    *produced* qpos[t]; the stencil centered at q_t therefore pairs with
    ctrls[t+1] (the acceleration (v_{t+1}−v_t)/h comes from that step).
    With this pairing + the implicit-damping correction below, the force
    residual is exactly zero on a noiseless simulated trajectory.
    """
    m = model
    h = m.opt.timestep
    v_cur = base.local_diff(m, q_cur, q_prev) / h
    v_next = base.local_diff(m, q_next, q_cur) / h
    acc = (v_next - v_cur) / h

    d = self._template.replace(qpos=q_cur, qvel=v_cur, qacc=acc, ctrl=ctrl)
    # sensor prediction (position/velocity stages)
    df = phys_forward(m, d)
    y = df.sensordata[self.sensor_start:self.sensor_start + self.ns]
    r_sensor = y - sensor_target
    # inverse dynamics: applied generalized force consistent with (q, v, a).
    # The engine integrates joint damping implicitly (damping at v_{t+1},
    # physics/step.py:22-28), so the *discrete-consistent* inverse needs the
    # D·(v_next − v_cur) = D·h·acc correction — the analog of MuJoCo's
    # mjENBL_INVDISCRETE; without it damping identification is biased.
    f = phys_inverse(m, d) + m.dof_damping * h * acc
    f = f - df.qfrc_actuator  # explained by known actuation
    cfg = self.config
    return jnp.concatenate([
        jnp.sqrt(self._sensor_w).astype(y.dtype) * r_sensor,
        jnp.sqrt(cfg.force_weight) * f,
    ])

  def _total_cost(self, qs, theta, sensors, ctrls):
    model = self._apply_params(theta) if self.ntheta else self.model

    def one(q3, s, u):
      r = self._window_residual(model, q3[0], q3[1], q3[2], s, u)
      return 0.5 * jnp.sum(r * r)

    stencil = jnp.stack([qs[:-2], qs[1:-1], qs[2:]], axis=1)
    costs = jax.vmap(one)(stencil, sensors[1:-1], ctrls[2:])
    return jnp.sum(costs) + self._prior_cost(theta)

  # --------------------------------------------------------------- GN step
  def _stencil_blocks(self, qs, theta, sensors, ctrls):
    """Per-stencil residuals and Jacobians w.r.t. [3·nv tangents; nθ]."""
    m = self.model
    nv = m.nv
    nt = self.ntheta

    def res_of_vars(q3, s, u, z):
      dz, dth = z[:3 * nv], z[3 * nv:]
      model = (self._apply_params(theta + dth) if nt else self.model)
      qp = base.retract(m, q3[0], dz[:nv])
      qc = base.retract(m, q3[1], dz[nv:2 * nv])
      qn = base.retract(m, q3[2], dz[2 * nv:])
      return self._window_residual(model, qp, qc, qn, s, u)

    stencil = jnp.stack([qs[:-2], qs[1:-1], qs[2:]], axis=1)
    z0 = jnp.zeros((3 * nv + nt,), dtype=qs.dtype)

    def blocks(q3, s, u):
      r = res_of_vars(q3, s, u, z0)
      jac = jax.jacfwd(lambda z: res_of_vars(q3, s, u, z))(z0)
      return r, jac  # (nr,), (nr, 3nv+nθ)

    return jax.vmap(blocks)(stencil, sensors[1:-1], ctrls[2:])

  def _gauss_newton_step(self, qs, theta, sensors, ctrls):
    m = self.model
    T = self.config.horizon
    nv = m.nv
    nt = self.ntheta
    reg = self.config.regularization

    rs, jacs = self._stencil_blocks(qs, theta, sensors, ctrls)
    jq = jacs[..., :3 * nv]
    jtj = jnp.einsum("tri,trj->tij", jq, jq)  # (T-2, 3nv, 3nv)
    jtr = jnp.einsum("tri,tr->ti", jq, rs)  # (T-2, 3nv)

    if self.config.solver == "dense" and nt == 0:
      delta = self._dense_solve(jtj, jtr, T, nv, qs.dtype)
      return delta.reshape(T, nv), jnp.zeros((0,), dtype=qs.dtype)

    diag, off1, off2 = band.assemble_from_stencils(jtj, T)
    # Levenberg-style SCALE-RELATIVE damping: JᵀJ spans ~1e9 for stiff
    # force residuals, so an absolute reg drowns in f32 roundoff and the
    # blocked Cholesky sees an indefinite matrix (nan factor)
    scale = jnp.max(jnp.abs(jnp.diagonal(diag, axis1=-2, axis2=-1)))
    diag = diag + (reg + 1e-6 * scale) * jnp.eye(nv, dtype=qs.dtype)
    gq = band.scatter_grad(jtr, T)  # (T, nv)
    fB = band.factor(diag, off1, off2)

    if nt == 0:
      dq = -band.solve(fB, gq)
      return dq, jnp.zeros((0,), dtype=qs.dtype)

    # arrowhead system: [B C; Cᵀ D][δq; δθ] = −[gq; gθ]
    jth = jacs[..., 3 * nv:]  # (T-2, nr, nθ)
    cth = jnp.einsum("tri,trj->tij", jq, jth)  # (T-2, 3nv, nθ)
    # scatter C into (T, nv, nθ) rows
    ts = jnp.arange(T - 2)
    blk = cth.reshape(-1, 3, nv, nt)
    C = (jnp.zeros((T, nv, nt), dtype=qs.dtype)
         .at[ts].add(blk[:, 0]).at[ts + 1].add(blk[:, 1])
         .at[ts + 2].add(blk[:, 2]))
    pw = self._prior_weight_vec(qs.dtype)
    D = (jnp.einsum("tri,trj->ij", jth, jth) + jnp.diag(pw) +
         reg * jnp.eye(nt, dtype=qs.dtype))
    prior = jnp.concatenate([
        jnp.asarray(p.prior, dtype=qs.dtype) for p in self.parameters])
    gth = jnp.einsum("tri,tr->i", jth, rs) + pw * (theta - prior)

    X = band.solve(fB, C)  # B⁻¹C, (T, nv, nθ)
    y = band.solve(fB, gq)  # B⁻¹gq, (T, nv)
    S = D - jnp.einsum("tik,til->kl", C, X)
    dth = jnp.linalg.solve(S, -(gth - jnp.einsum("tik,ti->k", C, y)))
    dq = -band.solve(fB, gq + jnp.einsum("tik,k->ti", C, dth))
    return dq, dth

  def _dense_solve(self, jtj, jtr, T, nv, dtype):
    """Dense fallback: assemble (T·nv)² and jnp.linalg.solve."""
    ntot = T * nv
    hess = jnp.zeros((ntot, ntot), dtype=dtype)
    grad = jnp.zeros((ntot,), dtype=dtype)

    def scatter(carry, inp):
      hess, grad = carry
      t, blk, gb = inp
      hess = jax.lax.dynamic_update_slice(
          hess, jax.lax.dynamic_slice(
              hess, (t * nv, t * nv), (3 * nv, 3 * nv)) + blk,
          (t * nv, t * nv))
      grad = jax.lax.dynamic_update_slice(
          grad, jax.lax.dynamic_slice(grad, (t * nv,), (3 * nv,)) + gb,
          (t * nv,))
      return (hess, grad), None

    ts = jnp.arange(T - 2)
    (hess, grad), _ = jax.lax.scan(scatter, (hess, grad), (ts, jtj, jtr))
    # same scale-relative damping as the band path (keeps them one
    # iterate sequence and f32-safe on stiff force residuals)
    scale = jnp.max(jnp.abs(jnp.diagonal(hess)))
    hess = hess + (self.config.regularization +
                   1e-6 * scale) * jnp.eye(ntot, dtype=dtype)
    return -jnp.linalg.solve(hess, grad)

  # ------------------------------------------------------------------- API
  def optimize(self, qpos_init: jax.Array, sensors: jax.Array,
               ctrls: Optional[jax.Array] = None,
               params_init: Optional[jax.Array] = None) -> DirectResult:
    """Smooth the window (and identify parameters when configured):
    qpos_init (T, nq), sensors (T, ns) → optimum."""
    with jax.default_matmul_precision("highest"):
      return self._optimize_impl(qpos_init, sensors, ctrls, params_init)

  def _optimize_impl(self, qpos_init, sensors, ctrls, params_init):
    m = self.model
    cfg = self.config
    T = cfg.horizon
    if ctrls is None:
      ctrls = jnp.zeros((T, m.nu), dtype=qpos_init.dtype)
    theta0 = (params_init if params_init is not None
              else self.default_parameters().astype(qpos_init.dtype))

    cost0 = self._total_cost(qpos_init, theta0, sensors, ctrls)

    def iteration(carry, _):
      qs, theta = carry
      dq, dth = self._gauss_newton_step(qs, theta, sensors, ctrls)
      steps = 2.0 ** -jnp.arange(cfg.num_steps, dtype=qs.dtype)

      def try_step(a):
        qs_a = jax.vmap(lambda q, d: base.retract(m, q, a * d))(qs, dq)
        th_a = theta + a * dth if self.ntheta else theta
        return self._total_cost(qs_a, th_a, sensors, ctrls), (qs_a, th_a)

      costs, cands = jax.vmap(try_step)(steps)
      cur = self._total_cost(qs, theta, sensors, ctrls)
      # nan costs (diverged GN trial steps) must not win NOR leak into
      # the reported cost: nan < cur is False, and the report must be the
      # kept iterate's cost, not min() (min(nan, x) is nan)
      best = jnp.argmin(jnp.where(jnp.isnan(costs), jnp.inf, costs))
      improved = costs[best] < cur
      new = jax.tree.map(
          lambda a, b: jnp.where(improved, a[best], b), cands, (qs, theta))
      return new, jnp.where(improved, costs[best], cur)

    (qs, theta), costs = jax.lax.scan(
        iteration, (qpos_init, theta0), None, length=cfg.max_iterations)
    return DirectResult(qpos=qs, cost=costs[-1], cost_initial=cost0,
                        iterations=cfg.max_iterations,
                        parameters=theta if self.ntheta else None)
