"""Training core: fused jitted optimization step, losses, train state."""

from .losses import LossConfig, consistency_losses, disparity_vali_loss
from .step import TrainStepConfig, SceneFlowMotionFieldStep

__all__ = [
    "LossConfig",
    "consistency_losses",
    "disparity_vali_loss",
    "TrainStepConfig",
    "SceneFlowMotionFieldStep",
]
