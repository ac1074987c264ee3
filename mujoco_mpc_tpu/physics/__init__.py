"""TPU-native rigid-body physics engine (the reference's MuJoCo role)."""

from mujoco_mpc_tpu.physics.io import from_mjmodel, load_model, make_data
from mujoco_mpc_tpu.physics.step import forward, integrate_pos, inverse, step
from mujoco_mpc_tpu.physics.types import (Contact, Data, GeomType, JointType,
                                          Model, Option, SensorType)

__all__ = [
    "Contact", "Data", "GeomType", "JointType", "Model", "Option",
    "SensorType", "forward", "from_mjmodel", "integrate_pos", "inverse",
    "load_model", "make_data", "step",
]
