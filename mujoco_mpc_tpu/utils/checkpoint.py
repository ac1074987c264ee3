"""Checkpoint / resume for agent state (policy, physics state, task params).

The reference has no checkpointing (SURVEY §5.4 — closest is keyframe reset
and model hot-swap); this is a new capability built on orbax: save/restore
the full control session (policy pytree, Data state, task parameters, rng)
so a long-running agent can resume after preemption.

Pytrees are serialized as indexed flat leaves; the Agent's own pytrees are
the structure template at restore time, so custom dataclass nodes and
zero-size leaves roundtrip exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree) -> dict:
  leaves = jax.tree.leaves(tree)
  out = {}
  for i, leaf in enumerate(leaves):
    arr = np.asarray(leaf)
    if arr.size:  # orbax cannot serialize zero-size arrays
      out[str(i)] = arr
  out["__count__"] = np.asarray(len(leaves))
  return out


def _unflatten(template, flat: dict):
  import jax.numpy as jnp

  leaves, treedef = jax.tree.flatten(template)
  n = int(flat["__count__"])
  if n != len(leaves):
    raise ValueError(
        f"checkpoint has {n} leaves, template has {len(leaves)} — was the "
        "agent built with a different task/planner?")
  new = []
  for i, t in enumerate(leaves):
    a = flat.get(str(i))
    new.append(t if a is None else jnp.asarray(a, dtype=t.dtype))
  return jax.tree.unflatten(treedef, new)


def save(path: str, agent) -> str:
  """Serialize an Agent's resumable state to `path` (directory)."""
  import orbax.checkpoint as ocp

  path = os.path.abspath(path)
  state = {
      "policy": _flatten(agent.policy),
      "previous_policy": _flatten(agent.previous_policy),
      "data": _flatten(agent.data),
      "task_params": _flatten(agent.task.params),
      "rng": np.asarray(agent._rng),
  }
  ckptr = ocp.PyTreeCheckpointer()
  ckptr.save(path, state, force=True)
  return path


def restore(path: str, agent) -> None:
  """Restore a previously saved session into an Agent built the same way."""
  import jax.numpy as jnp
  import orbax.checkpoint as ocp

  ckptr = ocp.PyTreeCheckpointer()
  state = ckptr.restore(os.path.abspath(path))

  with agent._lock:
    agent.policy = _unflatten(agent.policy, state["policy"])
    agent.previous_policy = _unflatten(agent.previous_policy,
                                       state["previous_policy"])
    agent.data = _unflatten(agent.data, state["data"])
    agent.task = agent.task.replace(
        params=_unflatten(agent.task.params, state["task_params"]))
    agent._rng = jnp.asarray(state["rng"], dtype=jnp.uint32)
