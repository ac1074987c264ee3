"""Task system: cost specs from MJCF, pure residual/transition functions.

Keeps the reference's task conventions (SURVEY §2.4, mjpc/task.h:78-173):
  - cost terms are `<user>` sensors with user="norm weight lo hi params…"
    parsed into a CostSpec (mjpc/task.cc:203-241);
  - residual parameters come from `<custom><numeric name="residual_*">`;
  - risk transform ρ(l,R) = (e^{R·l}−1)/R (mjpc/task.h, BaseResidualFn);
  - Transition is the task mode/goal FSM — but here it is a *pure jit-safe
    function* carrying its state in data.userdata / mocap, instead of the
    reference's host-locked mutation (mjpc/task.cc:141, TransitionLocked),
    so it runs inside scanned rollouts on device.

Runtime-tunable quantities (weights, norm params, risk, residual params)
live in the TaskParams pytree → GUI/RPC SetCostWeights-style mutation never
recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import norms
from mujoco_mpc_tpu.physics.types import Data, Model, SensorType

_RISK_TOL = 1e-6

# userdata slot holding the task *mode* (reference Task::mode, selected via
# GUI/RPC and gated by Transition, mjpc/task.h:141). Keeping it in userdata
# makes mode switching jit-pure: SetMode writes the slot, Transition reads
# and may override it, rollouts see a frozen snapshot — same semantics as
# the reference's physics-thread-only mode mutation.
MODE_SLOT = 15


@struct.dataclass
class TaskParams:
  """Traced, runtime-mutable task quantities."""
  weights: jax.Array  # (nterm,)
  norm_params: jax.Array  # (nterm, 2)
  risk: jax.Array  # ()
  residual_params: jax.Array  # (nres_param,) residual_* custom numerics


@dataclasses.dataclass(frozen=True)
class CostSpec:
  """Static structure of the cost: one entry per `<user>` sensor term."""
  names: Tuple[str, ...]
  norm_types: Tuple[int, ...]
  dims: Tuple[int, ...]

  @property
  def nterm(self) -> int:
    return len(self.names)

  @property
  def nresidual(self) -> int:
    return sum(self.dims)


def parse_cost_spec_mj(mj_model, model: Model,
                       dtype=jnp.float32) -> Tuple[CostSpec, TaskParams]:
  """CostSpec from a mujoco.MjModel (host load path)."""
  import mujoco

  names, norm_types, dims, weights, params = [], [], [], [], []
  for i in range(mj_model.nsensor):
    if mj_model.sensor_type[i] != mujoco.mjtSensor.mjSENS_USER:
      break
    user = mj_model.sensor_user[i]
    norm = int(user[0])
    names.append(model.sensor_names[i])
    norm_types.append(norm)
    dims.append(int(mj_model.sensor_dim[i]))
    weights.append(float(user[1]))
    p = list(user[4:6]) + [0.0, 0.0]
    params.append((float(p[0]), float(p[1])))

  # residual_* custom numerics → flat parameter vector (reference
  # Task::SetFeatureParameters, mjpc/task.cc:38-64)
  res_params, res_names = [], []
  for key, vals in model.custom_numeric:
    if key.startswith("residual_"):
      res_params.append(vals[0] if vals else 0.0)
      res_names.append(key)

  risk = model.custom("task_risk", 0.0)
  spec = CostSpec(tuple(names), tuple(norm_types), tuple(dims))
  tp = TaskParams(
      weights=jnp.asarray(weights, dtype=dtype),
      norm_params=jnp.asarray(params, dtype=dtype),
      risk=jnp.asarray(risk, dtype=dtype),
      residual_params=jnp.asarray(res_params, dtype=dtype))
  return spec, tp, tuple(res_names)


def cost_terms(spec: CostSpec, tp: TaskParams,
               residual: jax.Array, weighted: bool = True,
               scale: Optional[jax.Array] = None) -> jax.Array:
  """Per-term costs (nterm,) from a residual vector (BaseResidualFn::
  CostTerms, mjpc/task.cc:71-88). `scale` is an optional (nterm,)
  state-dependent weight multiplier from Task.weight_mod — the pure-
  function analogue of the reference Transition overwriting cost weights
  (e.g. the quadruped gait table, quadruped.cc:291-302)."""
  terms = []
  shift = 0
  for k in range(spec.nterm):
    block = residual[shift:shift + spec.dims[k]]
    val = norms.norm_value(block, norms.NormType(spec.norm_types[k]),
                           tp.norm_params[k, 0], tp.norm_params[k, 1])
    if weighted:
      w = tp.weights[k] if scale is None else tp.weights[k] * scale[k]
      val = w * val
    terms.append(val)
    shift += spec.dims[k]
  return jnp.stack(terms) if terms else jnp.zeros((0,))


def cost_value(spec: CostSpec, tp: TaskParams, residual: jax.Array,
               scale: Optional[jax.Array] = None) -> jax.Array:
  """Scalar cost with exponential risk transform (mjpc/task.cc:91-110)."""
  c = jnp.sum(cost_terms(spec, tp, residual, scale=scale))
  risky = (jnp.exp(tp.risk * c) - 1.0) / jnp.where(
      jnp.abs(tp.risk) < _RISK_TOL, 1.0, tp.risk)
  return jnp.where(jnp.abs(tp.risk) < _RISK_TOL, c, risky)


ResidualFn = Callable[[Model, Data, jax.Array], jax.Array]
TransitionFn = Callable[[Model, Data, jax.Array], Data]


@struct.dataclass
class Task:
  """A control task: model + cost spec + pure residual/transition fns.

  A pytree: `model` and `params` are traced (runtime-tunable, incl. system
  ID through model parameters); name/spec/functions are static metadata, so
  a Task passes straight through jit boundaries.
  """
  model: Model
  params: TaskParams
  name: str = struct.field(pytree_node=False)
  spec: CostSpec = struct.field(pytree_node=False)
  residual: ResidualFn = struct.field(pytree_node=False)
  transition: Optional[TransitionFn] = struct.field(
      pytree_node=False, default=None)
  # names of residual_* parameters, aligned with TaskParams.residual_params
  param_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
  # task mode names (reference Task::modes); data.userdata[MODE_SLOT] holds
  # the active mode index
  mode_names: Tuple[str, ...] = struct.field(
      pytree_node=False, default=("default",))
  # optional state-dependent (nterm,) weight multiplier (see cost_terms)
  weight_mod: Optional[ResidualFn] = struct.field(
      pytree_node=False, default=None)

  def default_ctrl(self) -> jax.Array:
    """Initial nominal control: the home keyframe's ctrl when present,
    otherwise mid-ctrlrange (keeps position-actuated robots at their
    stance pose instead of commanding mid-range)."""
    m = self.model
    try:
      ctrl = jnp.asarray(m.keyframe("home")[2], dtype=m.qpos0.dtype)
      if ctrl.shape[0] == m.nu and bool(jnp.any(ctrl != 0)):
        return ctrl
    except KeyError:
      pass
    mid = 0.5 * (m.actuator_ctrlrange[:, 0] + m.actuator_ctrlrange[:, 1])
    return jnp.where(m.actuator_ctrllimited, mid, 0.0)

  def set_weight(self, name: str, value) -> "Task":
    """SetCostWeights by term name (reference agent.proto:161-170)."""
    i = self.spec.names.index(name)
    return self.replace(params=self.params.replace(
        weights=self.params.weights.at[i].set(value)))

  def set_parameter(self, name: str, value) -> "Task":
    """SetTaskParameters by residual_* name (agent.proto:152-159)."""
    key = name if name.startswith("residual_") else f"residual_{name}"
    i = self.param_names.index(key)
    return self.replace(params=self.params.replace(
        residual_params=self.params.residual_params.at[i].set(value)))

  def residual_size(self) -> int:
    return self.spec.nresidual

  def cost(self, data: Data, params: Optional[TaskParams] = None):
    tp = params if params is not None else self.params
    r = self.residual(self.model, data, tp.residual_params)
    scale = (self.weight_mod(self.model, data, tp.residual_params)
             if self.weight_mod is not None else None)
    return cost_value(self.spec, tp, r, scale)

  def set_mode(self, data: Data, mode) -> Data:
    """Write the task mode register (reference agent.proto SetMode)."""
    return data.replace(
        userdata=data.userdata.at[MODE_SLOT].set(
            jnp.asarray(mode, dtype=data.userdata.dtype)))

  def get_mode(self, data: Data) -> jax.Array:
    return data.userdata[MODE_SLOT].astype(jnp.int32)

  def run_transition(self, data: Data,
                     params: Optional[TaskParams] = None) -> Data:
    if self.transition is None:
      return data
    tp = params if params is not None else self.params
    return self.transition(self.model, data, tp.residual_params)
