"""Task system: registry + base classes."""

from mujoco_mpc_tpu.tasks.base import (CostSpec, Task, TaskParams,
                                       cost_terms, cost_value)
from mujoco_mpc_tpu.tasks.registry import get_task, register, task_names

__all__ = ["CostSpec", "Task", "TaskParams", "cost_terms", "cost_value",
           "get_task", "register", "task_names"]
