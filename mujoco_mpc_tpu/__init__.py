"""mujoco_mpc_tpu: a TPU-native predictive-control framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
google-deepmind/mujoco_mpc (MJPC): batched on-device physics, sampling and
derivative-based planners, state estimators, a direct trajectory optimizer,
an asynchronous agent, and service/client layers.

Architecture (TPU-first, not a port):
  - physics/   pure-functional rigid-body engine (Model/Data pytrees,
               forward/step/inverse), differentiable smooth contacts.
  - ops/       norms, time-splines, rollouts (lax.scan), linalg kernels.
  - tasks/     task = pytree of cost spec + pure residual/transition fns.
  - planners/  predictive sampling, CEM, gradient, iLQG, iLQS, robust,
               sample-gradient — each a jitted pure improve-step.
  - estimators/ EKF, UKF, batch smoother, direct optimizer.
  - agent/     host-side orchestration (sync + async plan/act loops).
  - parallel/  jax.sharding mesh utilities: candidate-axis data parallelism.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: planner-step compiles are 10-40 s; for
# interactive/production use a warm cache turns process restarts into
# millisecond loads (reference MJPC pays zero compile by construction —
# this is the TPU-native answer). Opt out with MJPC_TPU_NO_CACHE=1.
import os as _os

if not _os.environ.get("MJPC_TPU_NO_CACHE"):
  import jax as _jax

  def _machine_key():
    # XLA:CPU AOT executables bake in the compile host's CPU features;
    # loading them on a host with different features is at best a SIGILL
    # and at worst silently wrong numerics (observed: equality-constraint
    # tests failing from a cache written by a different machine). Keying
    # the cache dir on the CPU feature set isolates hosts; TPU entries are
    # keyed the same way (harmless — the tunnel host rarely changes).
    import hashlib
    import platform
    flags = platform.machine()
    try:
      with open("/proc/cpuinfo") as f:
        for line in f:
          if line.startswith(("flags", "Features")):
            flags += line
            break
    except OSError:
      pass
    return hashlib.sha1(flags.encode()).hexdigest()[:10]

  _cache_dir = _os.environ.get(
      "MJPC_TPU_CACHE_DIR",
      _os.path.join(_os.path.expanduser("~"), ".cache", "mujoco_mpc_tpu",
                    "xla", _machine_key()))
  try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  except Exception:  # cache is best-effort; never block import
    pass
