"""Core numeric ops: norms, splines, rollouts, TPU-tuned linalg.

NOTE: ops.rollout is imported lazily by users (it depends on physics,
which depends on ops.linalg — importing it here would be circular).
"""

from mujoco_mpc_tpu.ops import linalg, norms, spline

__all__ = ["linalg", "norms", "spline"]
