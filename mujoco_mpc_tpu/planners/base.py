"""Planner interface: pure jitted improve-steps over policy pytrees.

The reference's Planner virtual interface (mjpc/planners/planner.h:32-80 —
Initialize/Allocate/Reset/SetState/OptimizePolicy/ActionFromPolicy/...)
maps to a functional protocol: a planner is a (config, init, optimize,
action) quadruple where `optimize` is one planning iteration as a pure
function (state, data, rng) → (state, info), jitted once and reused. The
thread-pool/mutex machinery disappears: candidate fan-out is a batch axis,
the policy swap is a pytree donation.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Protocol

import jax

from mujoco_mpc_tpu.physics.types import Data
from mujoco_mpc_tpu.tasks.base import Task, TaskParams


class PlanInfo(NamedTuple):
  """Diagnostics from one planning iteration (reference Planner::Plots)."""
  costs: jax.Array  # per-candidate total returns
  winner: jax.Array  # index of the selected candidate
  best_return: jax.Array  # scalar winning return
  trace_qpos: Any = None  # optional (T, nq) winner trajectory


class Planner(Protocol):
  """Structural protocol all planners implement."""

  def init(self, task: Task) -> Any:
    """Fresh policy/planner state."""

  def optimize(self, task: Task, state: Any, data: Data, rng: jax.Array,
               params: TaskParams | None = None) -> tuple[Any, PlanInfo]:
    """One OptimizePolicy iteration (pure, jit-safe)."""

  def action(self, task: Task, state: Any, data: Data) -> jax.Array:
    """ActionFromPolicy: ctrl at data.time (pure, jit-safe)."""
