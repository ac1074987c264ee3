"""Every registered task loads, its residual matches the cost spec, and
its transition/weight_mod (when present) are jit-safe — the analog of the
reference's test/tasks/task_test.cc over GetTasks()."""

import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu import physics
from mujoco_mpc_tpu.tasks import registry

# the reference registers 23 tasks (mjpc/tasks/tasks.cc:46-75)
_MIN_TASKS = 21


def test_registry_size():
  assert len(registry.task_names()) >= _MIN_TASKS, registry.task_names()


@pytest.mark.parametrize("name", registry.task_names())
def test_task_loads_and_validates(name):
  task = registry.get_task(name)
  m = task.model
  d = physics.make_data(m)
  try:
    qpos, _, _ = m.keyframe("home")
    d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype))
  except KeyError:
    pass
  d = jax.jit(physics.forward)(m, d)

  r = task.residual(m, d, task.params.residual_params)
  assert r.shape == (task.spec.nresidual,), (name, r.shape)
  assert bool(jnp.all(jnp.isfinite(r))), name

  c = float(task.cost(d))
  assert c == c and abs(c) < 1e6, (name, c)

  if task.weight_mod is not None:
    s = task.weight_mod(m, d, task.params.residual_params)
    assert s.shape == (task.spec.nterm,), (name, s.shape)

  if task.transition is not None:
    d2 = jax.jit(task.run_transition)(d)
    assert bool(jnp.all(jnp.isfinite(d2.qpos))), name
