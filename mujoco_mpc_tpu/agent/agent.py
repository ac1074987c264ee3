"""Agent: the host-side orchestrator around jitted plan/act functions.

Replaces the reference Agent (mjpc/agent.h:45-256, agent.cc) and its thread
choreography (plan thread ∥ physics thread, app.cc:464-503). Here the device
does the heavy lifting inside two jitted calls — `planner_step` (one
OptimizePolicy iteration) and `step` (transition → action → physics) — and
the host shell is a thin layer holding the latest policy.

Sync mode mirrors the headless gRPC AgentService semantics
(grpc/agent_service.cc:212-246): callers interleave planner_step()/step().
Async mode mirrors the GUI's plan-while-acting loop (agent.cc:360-371):
a background thread continuously re-optimizes against the latest published
state, and action() always reads the latest completed policy.
"""

from __future__ import annotations

import threading
import time as time_mod
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import forward as phys_forward
from mujoco_mpc_tpu.physics.step import step as phys_step
from mujoco_mpc_tpu.planners import (cross_entropy, gradient, ilqg, ilqs,
                                     robust, sampling)
from mujoco_mpc_tpu.planners import sample_gradient
from mujoco_mpc_tpu.tasks import base as task_base
from mujoco_mpc_tpu.tasks import registry


_PLANNERS = {
    "sampling": lambda task, horizon: sampling.SamplingPlanner(
        sampling.SamplingConfig.from_task(task, horizon)),
    "cross_entropy": lambda task, horizon: cross_entropy.CrossEntropyPlanner(
        cross_entropy.CEMConfig.from_task(task, horizon)),
    "gradient": lambda task, horizon: gradient.GradientPlanner(
        gradient.GradientConfig.from_task(task, horizon)),
    "sample_gradient": lambda task, horizon:
        sample_gradient.SampleGradientPlanner(
            sample_gradient.SGConfig.from_task(task, horizon)),
    "robust": lambda task, horizon: robust.RobustPlanner(
        sampling.SamplingPlanner(
            sampling.SamplingConfig.from_task(task, horizon)),
        robust.RobustConfig()),
    "ilqg": lambda task, horizon: ilqg.ILQGPlanner(
        ilqg.ILQGConfig.from_task(task, horizon)),
    "ilqs": lambda task, horizon: ilqs.ILQSPlanner(
        ilqs.ILQSConfig.from_task(task, horizon)),
}


# reference planner enum order (mjpc/planners/include.h:26-34)
_PLANNER_INDEX = ("sampling", "gradient", "ilqg", "ilqs", "robust",
                  "cross_entropy", "sample_gradient")


def register_planner(name: str, factory):
  _PLANNERS[name] = factory


class Agent:
  """Predictive-control agent: owns task, planner, policy and sim state."""

  def __init__(self, task: str | task_base.Task,
               planner: Optional[str] = None,
               horizon_steps: Optional[int] = None, seed: int = 0,
               dtype=jnp.float32, model_xml: Optional[str] = None):
    if isinstance(task, str):
      task = registry.get_task(task, dtype=dtype)
    if model_xml is not None:
      # caller-supplied model override (reference Init with custom model,
      # mjpc/grpc/agent.proto:21-30, grpc_agent_util.cc LoadModelFromString)
      import mujoco
      mj = mujoco.MjModel.from_xml_string(model_xml)
      model = phys_io.from_mjmodel(mj, dtype=dtype)
      spec, params, names = task_base.parse_cost_spec_mj(
          mj, model, dtype=dtype)
      task = task.replace(model=model, spec=spec, params=params,
                          param_names=names)
    if planner is None:
      # task XML selects the planner (reference agent_planner numeric)
      idx = int(task.model.custom("agent_planner", 0))
      planner = _PLANNER_INDEX[idx] if idx < len(_PLANNER_INDEX) else \
          "sampling"
    self.sim_task = task  # model at the XML timestep (physics fidelity)
    # planning model runs at agent_timestep (reference agent.cc:288-293)
    agent_dt = task.model.custom("agent_timestep", None)
    plan_model = task.model
    if agent_dt is not None:
      plan_model = task.model.replace(opt=task.model.opt.replace(
          timestep=jnp.asarray(agent_dt, dtype=task.model.qpos0.dtype)))
    self.task = task.replace(model=plan_model)

    self.planner_name = planner
    self.planner = _PLANNERS[planner](self.task, horizon_steps)
    self.policy = self.planner.init(self.task)
    self.previous_policy = self.policy
    self.data = phys_io.make_data(task.model)
    self._rng = jax.random.PRNGKey(seed)
    self._lock = threading.Lock()
    self._plan_thread: Optional[threading.Thread] = None
    self._exit = threading.Event()
    self.last_info = None
    self._estimator = None
    self._est_state = None
    self._jit_est_update = None
    self._est_thread: Optional[threading.Thread] = None
    self._est_exit = threading.Event()
    self._data_version = 0  # bumped on every sim-state publish
    self._ou_noise = np.zeros(task.model.nu)

    self._jit_opt = jax.jit(self.planner.optimize)
    self._jit_act = jax.jit(self.planner.action)
    self._jit_step = jax.jit(phys_step)
    self._jit_forward = jax.jit(phys_forward)
    self._jit_transition = jax.jit(self.task.run_transition)
    self._jit_steps_cache = {}  # n -> fused n-step scan (see steps())

  # ------------------------------------------------------------- state API
  def set_state(self, qpos=None, qvel=None, time=None, act=None,
                mocap_pos=None, mocap_quat=None, userdata=None):
    d = self.data
    dt = d.qpos.dtype
    if qpos is not None:
      d = d.replace(qpos=jnp.asarray(qpos, dtype=dt))
    if qvel is not None:
      d = d.replace(qvel=jnp.asarray(qvel, dtype=dt))
    if time is not None:
      d = d.replace(time=jnp.asarray(time, dtype=dt))
    if act is not None:
      d = d.replace(act=jnp.asarray(act, dtype=dt))
    if mocap_pos is not None:
      d = d.replace(mocap_pos=jnp.asarray(mocap_pos, dtype=dt))
    if mocap_quat is not None:
      d = d.replace(mocap_quat=jnp.asarray(mocap_quat, dtype=dt))
    if userdata is not None:
      d = d.replace(userdata=jnp.asarray(userdata, dtype=dt))
    with self._lock:
      self.data = d
      self._data_version += 1

  def get_state(self):
    d = self.data
    return {
        "time": float(d.time), "qpos": np.asarray(d.qpos),
        "qvel": np.asarray(d.qvel), "act": np.asarray(d.act),
        "mocap_pos": np.asarray(d.mocap_pos),
        "mocap_quat": np.asarray(d.mocap_quat),
        "userdata": np.asarray(d.userdata),
    }

  def reset(self, keyframe: Optional[str] = None):
    self.data = phys_io.make_data(self.sim_task.model)
    if keyframe is not None:
      qpos, qvel, ctrl = self.task.model.keyframe(keyframe)
      self.set_state(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    self.policy = self.planner.init(self.task)
    self.previous_policy = self.policy

  # ------------------------------------------------------------ task modes
  @property
  def mode_names(self):
    return self.task.mode_names

  def set_mode(self, mode):
    """Select the task mode by name or index (reference Agent SetMode;
    the value lands in data.userdata[MODE_SLOT] and the task's Transition
    gates/accepts it on the next step)."""
    idx = (self.task.mode_names.index(mode) if isinstance(mode, str)
           else int(mode))
    with self._lock:
      self.data = self.task.set_mode(self.data, idx)

  def get_mode(self) -> str:
    idx = int(np.asarray(self.data.userdata[task_base.MODE_SLOT]))
    names = self.task.mode_names
    return names[idx] if 0 <= idx < len(names) else str(idx)

  # ------------------------------------------------------------ task knobs
  def set_cost_weights(self, weights: dict):
    task = self.task
    for name, val in weights.items():
      task = task.set_weight(name, val)
    with self._lock:
      self.task = task

  def set_task_parameter(self, name: str, value: float):
    with self._lock:
      self.task = self.task.set_parameter(name, value)

  def get_cost_weights(self):
    return dict(zip(self.task.spec.names,
                    np.asarray(self.task.params.weights)))

  # -------------------------------------------------------------- planning
  def planner_step(self, from_estimate: bool = False):
    """One planning iteration against the current state (PlanIteration,
    agent.cc:283-357). With from_estimate=True and an attached estimator,
    plans from the estimated state (reference estimator_enabled path)."""
    self._rng, key = jax.random.split(self._rng)
    with self._lock:
      task, data, policy = self.task, self.data, self.policy
    if from_estimate:
      if self._estimator is None:
        raise RuntimeError("no estimator attached")
      qpos, qvel, act = self._estimator.state(self._est_state)
      data = data.replace(qpos=qpos, qvel=qvel, act=act)
    new_policy, info = self._jit_opt(task, policy, data, key)
    jax.block_until_ready(new_policy)
    with self._lock:
      self.previous_policy = self.policy
      self.policy = new_policy
      self.last_info = info
    return info

  def action(self, time: Optional[float] = None,
             use_previous: bool = False,
             nominal: bool = False) -> np.ndarray:
    """ActionFromPolicy at the given (default current) time.

    nominal=True skips feedback terms (reference GetAction nominal_action,
    agent.proto:106-111) — for feedback policies (iLQG) the gains are
    zeroed; open-loop policies are nominal already."""
    with self._lock:
      policy = self.previous_policy if use_previous else self.policy
    if nominal and hasattr(policy, "feedback_scale"):
      policy = policy.replace(
          feedback_scale=jnp.zeros_like(policy.feedback_scale))
    d = self.data
    if time is not None:
      d = d.replace(time=jnp.asarray(time, dtype=d.qpos.dtype))
    return np.asarray(self._jit_act(self.task, policy, d))

  def step(self, ctrl_noise_std: float = 0.0,
           ctrl_noise_rate: float = 0.1):
    """Synchronous env step: transition FSM → policy action → physics
    (AgentService::Step, grpc/agent_service.cc:224-246).

    ctrl_noise_std > 0 adds OU exploration noise to the executed action,
    scaled by ctrlrange (reference app.cc:292-304)."""
    with self._lock:
      task, policy = self.task, self.policy
    d = self.data
    d = self._jit_transition(d) if task.transition else d
    u = self._jit_act(task, policy, d)
    if ctrl_noise_std > 0:
      m = self.sim_task.model
      self._rng, k = jax.random.split(self._rng)
      scale = 0.5 * (np.asarray(m.actuator_ctrlrange[:, 1]) -
                     np.asarray(m.actuator_ctrlrange[:, 0]))
      eps = np.asarray(jax.random.normal(k, (m.nu,)))
      self._ou_noise = ((1.0 - ctrl_noise_rate) * self._ou_noise +
                        np.sqrt(ctrl_noise_rate * (2 - ctrl_noise_rate)) *
                        ctrl_noise_std * scale * eps)
      u = jnp.asarray(np.asarray(u) + self._ou_noise, dtype=u.dtype)
    d = d.replace(ctrl=u)
    d = self._jit_step(self.sim_task.model, d)
    with self._lock:
      self.data = d
      self._data_version += 1
    # feed the attached estimator inline — unless its own thread runs
    # (start_estimation; reference EstimatorLoop, app.cc:151-206)
    if self._estimator is not None and self._est_thread is None:
      df = self._jit_forward(self.sim_task.model, d)
      self._est_state = self._jit_est_update(
          self._est_state, d.ctrl, df.sensordata)
    return d

  def steps(self, n: int, ctrl_noise_std: float = 0.0,
            ctrl_noise_rate: float = 0.1):
    """`n` synchronous env steps fused into ONE device dispatch.

    Semantically n calls to step(): a lax.scan of transition → policy
    action → physics. Built for driving through high-latency device links
    (a tunneled TPU adds ~10-20 ms per dispatch, and step() makes three),
    where per-call latency — not compute — dominates a drive loop
    (tools/drive.py). Falls back to the per-step path when an estimator
    runs INLINE (its update interleaves host-side — start_estimation()
    moves it to its own thread and keeps this path fused) or control
    noise is requested (OU state lives on the host, app.cc:292-304)."""
    if ((self._estimator is not None and self._est_thread is None)
        or ctrl_noise_std > 0):
      d = self.data
      for _ in range(n):
        d = self.step(ctrl_noise_std, ctrl_noise_rate)
      return d
    fn = self._jit_steps_cache.get(n)
    if fn is None:
      sim_model = self.sim_task.model

      def run(task, policy, data):
        def body(d, _):
          if task.transition:
            d = task.run_transition(d)
          u = self.planner.action(task, policy, d)
          return phys_step(sim_model, d.replace(ctrl=u)), None

        return jax.lax.scan(body, data, None, length=n)[0]

      fn = jax.jit(run)
      self._jit_steps_cache[n] = fn
    with self._lock:
      task, policy = self.task, self.policy
    d = fn(task, policy, self.data)
    with self._lock:
      self.data = d
      self._data_version += 1
    return d

  # ----------------------------------------------------------- estimation
  def attach_estimator(self, name: str = "kalman", **kwargs):
    """Run a state estimator alongside stepping (reference EstimatorLoop,
    app.cc:151-206); estimated_state() reads its output."""
    from mujoco_mpc_tpu.estimators import base as est_base
    from mujoco_mpc_tpu.estimators import get_estimator

    start, dim = est_base.measurement_slice(self.sim_task.model)
    kwargs.setdefault("sensor_start", start)
    kwargs.setdefault("nsensordata", dim)
    self._estimator = get_estimator(name, self.sim_task.model, **kwargs)
    self._est_state = self._estimator.init(self.data)
    self._jit_est_update = jax.jit(self._estimator.update)

  def start_estimation(self, rate_limit_hz: Optional[float] = None):
    """Move the estimator update onto its own thread (the reference's
    optional estimator thread, app.cc:151-206 EstimatorLoop): each
    iteration snapshots the LATEST published sim state (latest-wins, as
    the reference's loop under the sim mutex), runs one measurement
    update, and publishes the estimate. With the thread running,
    steps(n) keeps its fused single-dispatch scan."""
    if self._estimator is None:
      raise RuntimeError("no estimator attached")
    if self._est_thread is not None:
      return
    self._est_exit.clear()

    def loop():
      last_seen = -1
      while not self._est_exit.is_set():
        with self._lock:
          version = self._data_version
          d = self.data
        if version == last_seen:
          time_mod.sleep(1e-4)
          continue
        t0 = time_mod.perf_counter()
        df = self._jit_forward(self.sim_task.model, d)
        est = self._jit_est_update(self._est_state, d.ctrl, df.sensordata)
        jax.block_until_ready(est)
        with self._lock:
          self._est_state = est
        last_seen = version
        if rate_limit_hz:
          dt = 1.0 / rate_limit_hz - (time_mod.perf_counter() - t0)
          if dt > 0:
            time_mod.sleep(dt)

    self._est_thread = threading.Thread(target=loop, daemon=True)
    self._est_thread.start()

  def stop_estimation(self):
    self._est_exit.set()
    if self._est_thread is not None:
      self._est_thread.join()
      self._est_thread = None

  def estimated_state(self):
    if self._estimator is None:
      raise RuntimeError("no estimator attached")
    with self._lock:
      est = self._est_state
    qpos, qvel, act = self._estimator.state(est)
    return {"qpos": np.asarray(qpos), "qvel": np.asarray(qvel),
            "act": np.asarray(act)}

  def total_cost(self) -> float:
    """Task cost at the current state."""
    d = self._jit_forward(self.sim_task.model, self.data)
    return float(self.task.cost(d))

  def cost_terms(self) -> dict:
    d = self._jit_forward(self.sim_task.model, self.data)
    r = self.task.residual(self.task.model, d,
                           self.task.params.residual_params)
    terms = task_base.cost_terms(self.task.spec, self.task.params, r)
    return dict(zip(self.task.spec.names, np.asarray(terms)))

  def best_trajectory(self, horizon: Optional[int] = None):
    """Roll the current policy from the current state and return the
    trajectory (reference GetBestTrajectory, agent.proto:142-146)."""
    from mujoco_mpc_tpu.ops import rollout as rollout_mod

    with self._lock:
      task, policy, data = self.task, self.policy, self.data
    hor = horizon or getattr(self.planner.config, "horizon", 100)
    pf = lambda t, dd: self.planner.action(task, policy, dd)
    res = jax.jit(
        lambda d: rollout_mod.rollout(task, d, pf, hor))(data)
    return {
        "qpos": np.asarray(res.qpos),
        "costs": np.asarray(res.costs),
        "total_return": float(res.total_return),
    }

  # ------------------------------------------------------------- async API
  def start_planning(self, rate_limit_hz: Optional[float] = None):
    """Launch the asynchronous plan loop (Agent::Plan, agent.cc:360-371)."""
    if self._plan_thread is not None:
      return
    self._exit.clear()
    # warm-up: compile the optimize step synchronously so the loop starts
    # producing policies immediately (first jit compile is seconds-slow and
    # would otherwise eat the start of the episode)
    self.planner_step()

    def loop():
      while not self._exit.is_set():
        t0 = time_mod.perf_counter()
        self.planner_step()
        if rate_limit_hz:
          dt = 1.0 / rate_limit_hz - (time_mod.perf_counter() - t0)
          if dt > 0:
            time_mod.sleep(dt)

    self._plan_thread = threading.Thread(target=loop, daemon=True)
    self._plan_thread.start()

  def stop_planning(self):
    self._exit.set()
    if self._plan_thread is not None:
      self._plan_thread.join()
      self._plan_thread = None
