from gcpnet_tpu.train.checkpoints import CheckpointManager
from gcpnet_tpu.train.optim import PlateauController, build_optimizer
from gcpnet_tpu.train.state import GradNormRing, TrainState
from gcpnet_tpu.train.trainer import Trainer

__all__ = [
    "CheckpointManager",
    "PlateauController",
    "build_optimizer",
    "GradNormRing",
    "TrainState",
    "Trainer",
]
