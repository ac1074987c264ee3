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
