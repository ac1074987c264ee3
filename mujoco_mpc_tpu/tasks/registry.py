"""Task registry: name → Task factory (reference GetTasks,
mjpc/tasks/tasks.cc:46-75)."""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.tasks import base

_MODEL_DIR = os.path.join(os.path.dirname(__file__), "models")

_FACTORIES: Dict[str, Callable[..., base.Task]] = {}


def register(name: str):
  def wrap(fn):
    _FACTORIES[name] = fn
    return fn
  return wrap


def task_names():
  return sorted(_FACTORIES)


def get_task(name: str, dtype=jnp.float32) -> base.Task:
  if name not in _FACTORIES:
    raise KeyError(f"unknown task {name!r}; available: {task_names()}")
  return _FACTORIES[name](dtype=dtype)


def load_task_model(xml_name: str, dtype=jnp.float32, mutate=None):
  """(Model, CostSpec, TaskParams, param_names) from tasks/models/ MJCF.

  `mutate(mj_model)` may edit the parsed mujoco.MjModel before conversion
  (e.g. fill procedural hfield elevation data)."""
  import mujoco

  path = os.path.join(_MODEL_DIR, xml_name)
  mj_model = mujoco.MjModel.from_xml_path(path)
  if mutate is not None:
    mutate(mj_model)
  model = phys_io.from_mjmodel(mj_model, dtype=dtype)
  spec, params, names = base.parse_cost_spec_mj(mj_model, model, dtype=dtype)
  _captured_mj.append(mj_model)
  return model, spec, params, names


def load_task_model_from_builder(builder, dtype=jnp.float32):
  """(Model, CostSpec, TaskParams, param_names) from a programmatic model
  builder (tasks/dm_suite.py: dm_control MJCF + reference patch semantics
  applied via MjSpec, the load-time analogue of the reference's build-time
  asset pipeline, mjpc/tasks/CMakeLists.txt:19-50)."""
  mj_model = builder()
  model = phys_io.from_mjmodel(mj_model, dtype=dtype)
  spec, params, names = base.parse_cost_spec_mj(mj_model, model, dtype=dtype)
  _captured_mj.append(mj_model)
  return model, spec, params, names


# host-side mujoco.MjModel capture for viewers/renderers: task factories
# are pure pytree producers (the Task carries no host objects), so the UI
# recovers the exact parsed mujoco model by re-running the factory under
# capture (replaces examples/replay.py's fragile nq/nu XML matching)
_captured_mj = []


def get_mj_model(name: str):
  """The host-side mujoco.MjModel task `name` was built from (rendering /
  viewer use only — the physics engine never touches it). Includes any
  mutate() edits (hfield fill) and dm_suite builder patches."""
  if name not in _FACTORIES:
    raise KeyError(f"unknown task {name!r}; available: {task_names()}")
  _captured_mj.clear()
  _FACTORIES[name](dtype=jnp.float32)
  if not _captured_mj:
    raise RuntimeError(f"task {name!r} built no mujoco model")
  return _captured_mj[-1]


# import task modules for registration side effects
def _register_all():
  from mujoco_mpc_tpu.tasks import acrobot  # noqa: F401
  from mujoco_mpc_tpu.tasks import allegro  # noqa: F401
  from mujoco_mpc_tpu.tasks import arm_reach  # noqa: F401
  from mujoco_mpc_tpu.tasks import bimanual  # noqa: F401
  from mujoco_mpc_tpu.tasks import bimanual_insert  # noqa: F401
  from mujoco_mpc_tpu.tasks import bring  # noqa: F401
  from mujoco_mpc_tpu.tasks import cartpole  # noqa: F401
  from mujoco_mpc_tpu.tasks import fingers  # noqa: F401
  from mujoco_mpc_tpu.tasks import hand_reorient  # noqa: F401
  from mujoco_mpc_tpu.tasks import humanoid  # noqa: F401
  from mujoco_mpc_tpu.tasks import humanoid_interact  # noqa: F401
  from mujoco_mpc_tpu.tasks import humanoid_track  # noqa: F401
  from mujoco_mpc_tpu.tasks import op3  # noqa: F401
  from mujoco_mpc_tpu.tasks import particle  # noqa: F401
  from mujoco_mpc_tpu.tasks import pick  # noqa: F401
  from mujoco_mpc_tpu.tasks import push  # noqa: F401
  from mujoco_mpc_tpu.tasks import quadrotor  # noqa: F401
  from mujoco_mpc_tpu.tasks import quadruped  # noqa: F401
  from mujoco_mpc_tpu.tasks import rubik  # noqa: F401
  from mujoco_mpc_tpu.tasks import swimmer  # noqa: F401
  from mujoco_mpc_tpu.tasks import walker  # noqa: F401


_register_all()
