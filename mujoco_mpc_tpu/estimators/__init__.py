"""State estimators: ground truth, EKF, UKF, batch smoother, direct.

Registry mirrors the reference (mjpc/estimators/include.cc:23-41).
"""

from mujoco_mpc_tpu.estimators.batch import Batch, BatchState
from mujoco_mpc_tpu.estimators.direct import Direct, DirectConfig
from mujoco_mpc_tpu.estimators.ground_truth import GroundTruth
from mujoco_mpc_tpu.estimators.kalman import Kalman, KalmanState
from mujoco_mpc_tpu.estimators.unscented import Unscented, UnscentedState

ESTIMATORS = {
    "ground_truth": GroundTruth,
    "kalman": Kalman,
    "unscented": Unscented,
    "batch": Batch,
}


def get_estimator(name: str, model, **kwargs):
  if name not in ESTIMATORS:
    raise KeyError(
        f"unknown estimator {name!r}; available: {sorted(ESTIMATORS)}")
  return ESTIMATORS[name](model, **kwargs)

__all__ = [
    "Batch", "BatchState", "Direct", "DirectConfig", "ESTIMATORS",
    "GroundTruth", "Kalman", "KalmanState", "Unscented", "UnscentedState",
    "get_estimator",
]
