"""gRPC Direct-optimizer service + client (reference direct_service.cc,
python/mujoco_mpc/direct.py)."""

from __future__ import annotations

import dataclasses
from concurrent import futures
from typing import Optional

import grpc
import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.service import direct_pb2 as pb

_SERVICE = "mjpc_tpu.Direct"


class DirectServicer:
  def __init__(self):
    self.direct = None
    self.qpos = None
    self.sensors = None
    self.ctrls = None
    self.optimized = False
    self.task = None

  def Init(self, req: pb.DirectInitRequest, ctx):
    from mujoco_mpc_tpu.estimators.direct import Direct, DirectConfig
    from mujoco_mpc_tpu.physics import io as phys_io
    from mujoco_mpc_tpu.tasks import registry

    from mujoco_mpc_tpu.estimators import base as est_base

    self.task = registry.get_task(req.task_id)
    m = self.task.model
    horizon = req.horizon or 16
    start, dim = est_base.measurement_slice(m)
    self.direct = Direct(m, DirectConfig(horizon=horizon),
                         sensor_start=start, nsensordata=dim)
    d0 = phys_io.make_data(m)
    self.qpos = jnp.tile(d0.qpos, (horizon, 1))
    self.sensors = jnp.zeros((horizon, self.direct.ns), dtype=jnp.float32)
    self.ctrls = jnp.zeros((horizon, m.nu), dtype=jnp.float32)
    self.optimized = False
    return pb.DirectInitResponse()

  def Data(self, req: pb.DirectDataRequest, ctx):
    i = req.index
    if req.qpos:
      self.qpos = self.qpos.at[i].set(
          jnp.asarray(list(req.qpos), dtype=jnp.float32))
    if req.sensor:
      self.sensors = self.sensors.at[i].set(
          jnp.asarray(list(req.sensor), dtype=jnp.float32))
    if req.ctrl:
      self.ctrls = self.ctrls.at[i].set(
          jnp.asarray(list(req.ctrl), dtype=jnp.float32))
    return pb.DirectDataResponse(qpos=np.asarray(self.qpos[i]).tolist())

  def Settings(self, req: pb.DirectSettingsRequest, ctx):
    cfg = self.direct.config
    changes = {}
    if req.max_iterations > 0:
      changes["max_iterations"] = req.max_iterations
    if req.sensor_weight > 0:
      changes["sensor_weight"] = req.sensor_weight
    if req.force_weight > 0:
      changes["force_weight"] = req.force_weight
    if changes:
      self.direct.config = dataclasses.replace(cfg, **changes)
    return pb.DirectSettingsResponse()

  def Optimize(self, req, ctx):
    result = jax.jit(self.direct.optimize)(self.qpos, self.sensors,
                                           self.ctrls)
    self.qpos = result.qpos
    self.optimized = True
    return pb.DirectOptimizeResponse(
        cost_initial=float(result.cost_initial),
        cost_final=float(result.cost),
        iterations=int(result.iterations))

  def Cost(self, req, ctx):
    c = self.direct._total_cost(self.qpos, self.direct.default_parameters(),
                                self.sensors, self.ctrls)
    return pb.DirectCostResponse(cost=float(c))

  def Status(self, req, ctx):
    return pb.DirectStatusResponse(
        horizon=self.direct.config.horizon, optimized=self.optimized)

  def Noise(self, req: pb.DirectNoiseRequest, ctx):
    """Get/set process (force), sensor and parameter-prior weights
    (reference direct.proto Noise RPC; direct.h noise_process/noise_sensor).
    Empty request fields read back the current values."""
    d = self.direct
    m = self.task.model
    if req.process:
      d.config = dataclasses.replace(
          d.config, force_weight=jnp.asarray(list(req.process),
                                             dtype=jnp.float32))
    if req.sensor:
      d._sensor_w = jnp.asarray(list(req.sensor), dtype=jnp.float32)
    if req.parameter and d.ntheta:
      # parameter-prior weights live on the ParameterSpec blocks
      # (reference model_parameters.h); rebuild the specs' prior weights
      pw = list(req.parameter)
      off, new_specs = 0, []
      for spec in d.parameters:
        w = pw[off:off + spec.dim]
        new_specs.append(dataclasses.replace(
            spec, prior_weight=float(np.mean(w)) if w else
            spec.prior_weight))
        off += spec.dim
      d.parameters = tuple(new_specs)
    fw = np.asarray(d.config.force_weight, dtype=np.float64).ravel()
    if fw.size == 1:
      fw = np.full((int(m.nv),), fw[0])
    resp = pb.DirectNoiseResponse(
        process=fw.tolist(),
        sensor=np.asarray(d._sensor_w, dtype=np.float64).tolist())
    for spec in d.parameters:
      resp.parameter.extend([float(spec.prior_weight)] * spec.dim)
    return resp

  def SensorInfo(self, req, ctx):
    """Measurement layout (reference direct.proto SensorInfo)."""
    d = self.direct
    return pb.DirectSensorInfoResponse(
        start_index=int(d.sensor_start),
        num_measurements=int(d.ns),
        dim_measurements=int(d.ns))


_RPCS = [
    ("Init", pb.DirectInitRequest, pb.DirectInitResponse),
    ("Data", pb.DirectDataRequest, pb.DirectDataResponse),
    ("Settings", pb.DirectSettingsRequest, pb.DirectSettingsResponse),
    ("Optimize", pb.DirectOptimizeRequest, pb.DirectOptimizeResponse),
    ("Cost", pb.DirectCostRequest, pb.DirectCostResponse),
    ("Status", pb.DirectStatusRequest, pb.DirectStatusResponse),
    ("Noise", pb.DirectNoiseRequest, pb.DirectNoiseResponse),
    ("SensorInfo", pb.DirectSensorInfoRequest, pb.DirectSensorInfoResponse),
]


def make_server(port: int = 0, max_workers: int = 4):
  servicer = DirectServicer()
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


class DirectClient:
  """Mirrors python/mujoco_mpc/direct.py's shape (in-process server)."""

  def __init__(self, task_id: str, horizon: int = 16,
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
    self._rpcs["Init"](pb.DirectInitRequest(task_id=task_id,
                                            horizon=horizon), timeout=300)

  def data(self, index: int, qpos=None, sensor=None, ctrl=None):
    req = pb.DirectDataRequest(index=index)
    if qpos is not None:
      req.qpos.extend(np.asarray(qpos).tolist())
    if sensor is not None:
      req.sensor.extend(np.asarray(sensor).tolist())
    if ctrl is not None:
      req.ctrl.extend(np.asarray(ctrl).tolist())
    return np.asarray(self._rpcs["Data"](req).qpos)

  def settings(self, max_iterations=0, sensor_weight=0.0, force_weight=0.0):
    self._rpcs["Settings"](pb.DirectSettingsRequest(
        max_iterations=max_iterations, sensor_weight=sensor_weight,
        force_weight=force_weight))

  def optimize(self) -> dict:
    r = self._rpcs["Optimize"](pb.DirectOptimizeRequest(), timeout=600)
    return {"cost_initial": r.cost_initial, "cost_final": r.cost_final,
            "iterations": r.iterations}

  def cost(self) -> float:
    return self._rpcs["Cost"](pb.DirectCostRequest()).cost

  def status(self) -> dict:
    r = self._rpcs["Status"](pb.DirectStatusRequest())
    return {"horizon": r.horizon, "optimized": r.optimized}

  def noise(self, process=None, sensor=None, parameter=None) -> dict:
    req = pb.DirectNoiseRequest()
    if process is not None:
      req.process.extend(np.asarray(process).tolist())
    if sensor is not None:
      req.sensor.extend(np.asarray(sensor).tolist())
    if parameter is not None:
      req.parameter.extend(np.asarray(parameter).tolist())
    r = self._rpcs["Noise"](req)
    return {"process": np.asarray(r.process),
            "sensor": np.asarray(r.sensor),
            "parameter": np.asarray(r.parameter)}

  def sensor_info(self) -> dict:
    r = self._rpcs["SensorInfo"](pb.DirectSensorInfoRequest())
    return {"start_index": r.start_index,
            "num_measurements": r.num_measurements,
            "dim_measurements": r.dim_measurements}

  def close(self):
    self._channel.close()
    if self._server is not None:
      self._server.stop(None)

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
