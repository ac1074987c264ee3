"""Ground-truth 'estimator': open-loop stepping of the model.

Reference (mjpc/estimators/estimator.h:101-288 GroundTruth): ignores
measurements and integrates the model with the given controls.
"""

from __future__ import annotations

from flax import struct
import jax

from mujoco_mpc_tpu.physics import io as phys_io
from mujoco_mpc_tpu.physics.step import step as phys_step
from mujoco_mpc_tpu.physics.types import Data, Model


@struct.dataclass
class GroundTruthState:
  data: Data


class GroundTruth:
  def __init__(self, model: Model):
    self.model = model

  def init(self, data: Data | None = None) -> GroundTruthState:
    return GroundTruthState(data=data or phys_io.make_data(self.model))

  def update(self, state: GroundTruthState, ctrl: jax.Array,
             sensor: jax.Array) -> GroundTruthState:
    del sensor
    d = state.data.replace(ctrl=ctrl)
    return GroundTruthState(data=phys_step(self.model, d))

  def state(self, s: GroundTruthState):
    return s.data.qpos, s.data.qvel, s.data.act
