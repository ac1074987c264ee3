"""Planners: 7 algorithms matching the reference registry
(mjpc/planners/include.cc:30-53)."""

from mujoco_mpc_tpu.planners.base import Planner, PlanInfo
from mujoco_mpc_tpu.planners.cross_entropy import (CEMConfig, CEMPolicy,
                                                   CrossEntropyPlanner)
from mujoco_mpc_tpu.planners.gradient import (GradientConfig, GradientPlanner,
                                              GradientPolicy)
from mujoco_mpc_tpu.planners.ilqg import ILQGConfig, ILQGPlanner, ILQGPolicy
from mujoco_mpc_tpu.planners.ilqs import ILQSConfig, ILQSPlanner, ILQSPolicy
from mujoco_mpc_tpu.planners.robust import RobustConfig, RobustPlanner
from mujoco_mpc_tpu.planners.sample_gradient import (SampleGradientPlanner,
                                                     SGConfig, SGPolicy)
from mujoco_mpc_tpu.planners.sampling import (SamplingConfig, SamplingPlanner,
                                              SamplingPolicy)

__all__ = [
    "CEMConfig", "CEMPolicy", "CrossEntropyPlanner", "GradientConfig",
    "GradientPlanner", "GradientPolicy", "ILQGConfig", "ILQGPlanner",
    "ILQGPolicy", "ILQSConfig", "ILQSPlanner", "ILQSPolicy", "PlanInfo",
    "Planner", "RobustConfig", "RobustPlanner", "SGConfig", "SGPolicy",
    "SampleGradientPlanner", "SamplingConfig", "SamplingPlanner",
    "SamplingPolicy",
]
