"""gRPC StateEstimation service + client (reference filter_service.cc,
python/mujoco_mpc/filter.py)."""

from __future__ import annotations

from concurrent import futures
from typing import Optional

import grpc
import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.service import filter_pb2 as pb

_SERVICE = "mjpc_tpu.StateEstimation"


class FilterServicer:
  def __init__(self):
    self.model = None
    self.filter = None
    self.state = None
    self._update = None

  def Init(self, req: pb.FilterInitRequest, ctx):
    from mujoco_mpc_tpu.estimators import get_estimator
    from mujoco_mpc_tpu.tasks import registry

    from mujoco_mpc_tpu.estimators import base as est_base

    task = registry.get_task(req.task_id)
    self.model = task.model
    name = req.filter or "kalman"
    start, dim = est_base.measurement_slice(task.model)
    if name == "ground_truth":
      self.filter = get_estimator(name, task.model)
    else:
      self.filter = get_estimator(name, task.model, sensor_start=start,
                                  nsensordata=dim)
    self.state = self.filter.init()
    self._update = jax.jit(self.filter.update)
    return pb.FilterInitResponse()

  def Reset(self, req, ctx):
    self.state = self.filter.init()
    return pb.FilterResetResponse()

  def Update(self, req: pb.FilterUpdateRequest, ctx):
    ctrl = jnp.asarray(list(req.ctrl), dtype=jnp.float32)
    sensor = jnp.asarray(list(req.sensor), dtype=jnp.float32)
    self.state = self._update(self.state, ctrl, sensor)
    return pb.FilterUpdateResponse()

  def State(self, req, ctx):
    qpos, qvel, act = self.filter.state(self.state)
    return pb.FilterStateResponse(
        qpos=np.asarray(qpos).tolist(), qvel=np.asarray(qvel).tolist(),
        act=np.asarray(act).tolist(),
        time=float(getattr(self.state, "time", 0.0))
        if not hasattr(self.state, "data") else float(self.state.data.time))

  def Covariance(self, req, ctx):
    cov = getattr(self.state, "cov", None)
    if cov is None:
      return pb.FilterCovarianceResponse(dim=0)
    c = np.asarray(cov)
    return pb.FilterCovarianceResponse(
        covariance=c.ravel().tolist(), dim=c.shape[0])

  def Noise(self, req: pb.FilterNoiseRequest, ctx):
    if req.process or req.sensor:
      kw = {}
      if req.process:
        kw["noise_process"] = jnp.asarray(list(req.process),
                                          dtype=jnp.float32)
      if req.sensor:
        kw["noise_sensor"] = jnp.asarray(list(req.sensor),
                                         dtype=jnp.float32)
      if hasattr(self.state, "noise_process"):
        self.state = self.state.replace(**kw)
    proc = getattr(self.state, "noise_process", np.zeros(0))
    sens = getattr(self.state, "noise_sensor", np.zeros(0))
    return pb.FilterNoiseResponse(
        process=np.asarray(proc).tolist(), sensor=np.asarray(sens).tolist())


_RPCS = [
    ("Init", pb.FilterInitRequest, pb.FilterInitResponse),
    ("Reset", pb.FilterResetRequest, pb.FilterResetResponse),
    ("Update", pb.FilterUpdateRequest, pb.FilterUpdateResponse),
    ("State", pb.FilterStateRequest, pb.FilterStateResponse),
    ("Covariance", pb.FilterCovarianceRequest, pb.FilterCovarianceResponse),
    ("Noise", pb.FilterNoiseRequest, pb.FilterNoiseResponse),
]


def make_server(port: int = 0, max_workers: int = 4):
  servicer = FilterServicer()
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


class FilterClient:
  """Mirrors the reference python/mujoco_mpc/filter.py surface, in-process
  or spawned (reuse AgentClient's pattern via port argument)."""

  def __init__(self, task_id: str, filter: str = "kalman",
               port: Optional[int] = None):
    self._server = None
    if port is None:
      self._server, port = make_server(0)
    self._channel = grpc.insecure_channel(f"localhost:{port}")
    grpc.channel_ready_future(self._channel).result(timeout=60)

    def rpc(name, req_cls, resp_cls):
      return self._channel.unary_unary(
          f"/{_SERVICE}/{name}",
          request_serializer=req_cls.SerializeToString,
          response_deserializer=resp_cls.FromString)

    self._rpcs = {name: rpc(name, rc, pc) for name, rc, pc in _RPCS}
    self._rpcs["Init"](pb.FilterInitRequest(task_id=task_id, filter=filter),
                       timeout=300)

  def update(self, ctrl, sensor):
    self._rpcs["Update"](pb.FilterUpdateRequest(
        ctrl=np.asarray(ctrl).tolist(), sensor=np.asarray(sensor).tolist()))

  def state(self) -> dict:
    r = self._rpcs["State"](pb.FilterStateRequest())
    return {"qpos": np.asarray(r.qpos), "qvel": np.asarray(r.qvel),
            "act": np.asarray(r.act), "time": r.time}

  def covariance(self) -> np.ndarray:
    r = self._rpcs["Covariance"](pb.FilterCovarianceRequest())
    return np.asarray(r.covariance).reshape(r.dim, r.dim)

  def noise(self, process=None, sensor=None) -> dict:
    r = self._rpcs["Noise"](pb.FilterNoiseRequest(
        process=list(process) if process is not None else [],
        sensor=list(sensor) if sensor is not None else []))
    return {"process": np.asarray(r.process), "sensor": np.asarray(r.sensor)}

  def reset(self):
    self._rpcs["Reset"](pb.FilterResetRequest())

  def close(self):
    self._channel.close()
    if self._server is not None:
      self._server.stop(None)

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
