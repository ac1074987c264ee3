"""gRPC Agent service: the reference's agent_service on top of the JAX agent.

Reference (mjpc/grpc/agent_service.{h,cc}): a headless synchronous agent
behind gRPC — Step = transition → action-from-policy → physics step
(agent_service.cc:224-246); PlannerStep = one PlanIteration (:212-221).
Since grpc_python_plugin is unavailable in this environment, the service is
registered through grpc's generic method handlers (equivalent wire
behavior, no generated stubs).
"""

from __future__ import annotations

from concurrent import futures
from typing import Optional

import grpc
import numpy as np

from mujoco_mpc_tpu.agent.agent import Agent
from mujoco_mpc_tpu.service import agent_pb2 as pb

_SERVICE = "mjpc_tpu.Agent"


class AgentServicer:
  """Method implementations; one Agent per server."""

  def __init__(self):
    self.agent: Optional[Agent] = None

  # each handler: request proto -> response proto
  def Init(self, req: pb.InitRequest, ctx) -> pb.InitResponse:
    self.agent = Agent(
        req.task_id, planner=req.planner or "sampling",
        horizon_steps=req.horizon_steps or None,
        model_xml=req.model_xml or None)
    # warm-up: trigger every jit compile (optimize/action/step/forward) now,
    # under Init's long client deadline, so later RPCs respond at
    # steady-state latency instead of stalling minutes on first contact
    self.agent.planner_step()
    self.agent.step()
    self.agent.total_cost()
    self.agent.reset()
    return pb.InitResponse()

  def _require(self):
    if self.agent is None:
      raise RuntimeError("call Init first")
    return self.agent

  def SetState(self, req: pb.SetStateRequest, ctx) -> pb.SetStateResponse:
    a = self._require()
    s = req.state
    kw = {}
    if s.qpos:
      kw["qpos"] = np.asarray(s.qpos)
    if s.qvel:
      kw["qvel"] = np.asarray(s.qvel)
    if s.act:
      kw["act"] = np.asarray(s.act)
    if s.mocap_pos:
      kw["mocap_pos"] = np.asarray(s.mocap_pos).reshape(-1, 3)
    if s.mocap_quat:
      kw["mocap_quat"] = np.asarray(s.mocap_quat).reshape(-1, 4)
    if s.userdata:
      kw["userdata"] = np.asarray(s.userdata)
    if s.time:
      kw["time"] = s.time
    a.set_state(**kw)
    return pb.SetStateResponse()

  def _state_msg(self, a: Agent) -> pb.State:
    st = a.get_state()
    return pb.State(
        time=st["time"], qpos=st["qpos"].tolist(),
        qvel=st["qvel"].tolist(), act=st["act"].tolist(),
        mocap_pos=st["mocap_pos"].ravel().tolist(),
        mocap_quat=st["mocap_quat"].ravel().tolist(),
        userdata=st["userdata"].tolist())

  def GetState(self, req, ctx) -> pb.GetStateResponse:
    return pb.GetStateResponse(state=self._state_msg(self._require()))

  def GetAction(self, req: pb.GetActionRequest, ctx) -> pb.GetActionResponse:
    a = self._require()
    t = req.time if req.time >= 0 else None
    if req.averaging_duration > 0:
      # rollout-based averaging (reference grpc_agent_util.cc GetAction):
      # roll the *physics* forward over the averaging window executing the
      # policy and average the executed actions — for feedback policies
      # (iLQG) this differs from averaging policy samples at fixed state
      import jax.numpy as jnp
      m = a.sim_task.model
      dt = float(m.opt.timestep)
      n = max(1, int(round(req.averaging_duration / dt)))
      saved = a.data
      if t is not None:
        a.data = a.data.replace(
            time=jnp.asarray(t, dtype=a.data.qpos.dtype))
      actions = []
      for _ in range(n):
        u = a.action(use_previous=req.use_previous_policy,
                     nominal=req.nominal_action)
        actions.append(u)
        a.data = a.data.replace(
            ctrl=jnp.asarray(u, dtype=a.data.qpos.dtype))
        a.data = a._jit_step(m, a.data)
      act = np.stack(actions).mean(axis=0)
      a.data = saved
    else:
      act = a.action(time=t, use_previous=req.use_previous_policy,
                     nominal=req.nominal_action)
    return pb.GetActionResponse(action=act.tolist())

  def PlannerStep(self, req, ctx) -> pb.PlannerStepResponse:
    info = self._require().planner_step()
    return pb.PlannerStepResponse(best_return=float(info.best_return))

  def Step(self, req: pb.StepRequest, ctx) -> pb.StepResponse:
    a = self._require()
    a.step()
    return pb.StepResponse(state=self._state_msg(a))

  def Reset(self, req: pb.ResetRequest, ctx) -> pb.ResetResponse:
    self._require().reset(keyframe=req.keyframe or None)
    return pb.ResetResponse()

  def SetTaskParameters(self, req, ctx):
    a = self._require()
    for p in req.parameters:
      a.set_task_parameter(p.name, p.value)
    return pb.SetTaskParametersResponse()

  def GetTaskParameters(self, req, ctx):
    a = self._require()
    out = pb.GetTaskParametersResponse()
    vals = np.asarray(a.task.params.residual_params)
    for name, val in zip(a.task.param_names, vals):
      out.parameters.append(pb.TaskParameter(name=name, value=float(val)))
    return out

  def SetCostWeights(self, req, ctx):
    self._require().set_cost_weights(
        {w.name: w.weight for w in req.weights})
    return pb.SetCostWeightsResponse()

  def GetCostValuesAndWeights(self, req, ctx):
    a = self._require()
    terms = a.cost_terms()
    weights = a.get_cost_weights()
    out = pb.GetCostValuesAndWeightsResponse(total_cost=a.total_cost())
    for name in terms:
      out.terms.append(pb.CostTerm(name=name, value=float(terms[name]),
                                   weight=float(weights[name])))
    return out

  def GetResiduals(self, req, ctx):
    a = self._require()
    d = a._jit_forward(a.sim_task.model, a.data)
    r = a.task.residual(a.task.model, d, a.task.params.residual_params)
    return pb.GetResidualsResponse(residuals=np.asarray(r).tolist())

  def StartPlanning(self, req: pb.StartPlanningRequest, ctx):
    self._require().start_planning(
        rate_limit_hz=req.rate_limit_hz or None)
    return pb.StartPlanningResponse()

  def StopPlanning(self, req, ctx):
    self._require().stop_planning()
    return pb.StopPlanningResponse()

  def SetMode(self, req: pb.SetModeRequest, ctx):
    self._require().set_mode(req.mode)
    return pb.SetModeResponse()

  def GetMode(self, req, ctx):
    return pb.GetModeResponse(mode=self._require().get_mode())

  def GetAllModes(self, req, ctx):
    return pb.GetAllModesResponse(
        mode_names=list(self._require().mode_names))

  def SetAnything(self, req: pb.SetAnythingRequest, ctx):
    """One-call state/weights/params/mode mutation (reference SetAnything,
    grpc_agent_util.cc)."""
    a = self._require()
    if req.HasField("state"):
      self.SetState(pb.SetStateRequest(state=req.state), ctx)
    if req.cost_weights:
      a.set_cost_weights({w.name: w.weight for w in req.cost_weights})
    for p in req.parameters:
      a.set_task_parameter(p.name, p.value)
    if req.mode:
      a.set_mode(req.mode)
    if req.ctrl:
      a.data = a.data.replace(
          ctrl=np.asarray(req.ctrl, dtype=np.asarray(a.data.ctrl).dtype))
    return pb.SetAnythingResponse()

  def GetBestTrajectory(self, req, ctx):
    a = self._require()
    info = a.last_info
    if info is None:
      return pb.GetBestTrajectoryResponse()
    return pb.GetBestTrajectoryResponse(
        best_return=float(info.best_return),
        candidate_returns=np.asarray(info.costs).tolist(),
        winner=int(info.winner))


_RPCS = [
    ("Init", pb.InitRequest, pb.InitResponse),
    ("StartPlanning", pb.StartPlanningRequest, pb.StartPlanningResponse),
    ("StopPlanning", pb.StopPlanningRequest, pb.StopPlanningResponse),
    ("SetState", pb.SetStateRequest, pb.SetStateResponse),
    ("GetState", pb.GetStateRequest, pb.GetStateResponse),
    ("GetAction", pb.GetActionRequest, pb.GetActionResponse),
    ("PlannerStep", pb.PlannerStepRequest, pb.PlannerStepResponse),
    ("Step", pb.StepRequest, pb.StepResponse),
    ("Reset", pb.ResetRequest, pb.ResetResponse),
    ("SetTaskParameters", pb.SetTaskParametersRequest,
     pb.SetTaskParametersResponse),
    ("GetTaskParameters", pb.GetTaskParametersRequest,
     pb.GetTaskParametersResponse),
    ("SetCostWeights", pb.SetCostWeightsRequest, pb.SetCostWeightsResponse),
    ("GetCostValuesAndWeights", pb.GetCostValuesAndWeightsRequest,
     pb.GetCostValuesAndWeightsResponse),
    ("GetResiduals", pb.GetResidualsRequest, pb.GetResidualsResponse),
    ("GetBestTrajectory", pb.GetBestTrajectoryRequest,
     pb.GetBestTrajectoryResponse),
    ("SetMode", pb.SetModeRequest, pb.SetModeResponse),
    ("GetMode", pb.GetModeRequest, pb.GetModeResponse),
    ("GetAllModes", pb.GetAllModesRequest, pb.GetAllModesResponse),
    ("SetAnything", pb.SetAnythingRequest, pb.SetAnythingResponse),
]


def make_server(port: int = 0,
                max_workers: int = 4) -> tuple[grpc.Server, int]:
  """Build and start the server; returns (server, bound port)."""
  servicer = AgentServicer()
  handlers = {}
  for name, req_cls, resp_cls in _RPCS:
    method = getattr(servicer, name)
    handlers[name] = grpc.unary_unary_rpc_method_handler(
        lambda req, ctx, _m=method: _m(req, ctx),
        request_deserializer=req_cls.FromString,
        response_serializer=resp_cls.SerializeToString)
  server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
  server.add_generic_rpc_handlers(
      (grpc.method_handlers_generic_handler(_SERVICE, handlers),))
  bound = server.add_insecure_port(f"localhost:{port}")
  server.start()
  return server, bound


def main():
  import argparse

  parser = argparse.ArgumentParser(description="mjpc_tpu agent server")
  parser.add_argument("--port", type=int, default=10000)
  parser.add_argument("--jax_platform", default="",
                      help="force a jax platform (e.g. cpu); the "
                           "JAX_PLATFORMS env var is unreliable under the "
                           "axon TPU plugin")
  args = parser.parse_args()
  if args.jax_platform:
    import jax
    jax.config.update("jax_platforms", args.jax_platform)
  server, port = make_server(args.port)
  print(f"mjpc_tpu agent server listening on {port}", flush=True)
  server.wait_for_termination()


if __name__ == "__main__":
  main()
