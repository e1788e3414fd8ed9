"""Training layer: losses, metrics, optimizers, trainer, checkpointing.

Reference parity: src/trainer/ (SURVEY.md §2.4), rebuilt as pure functions
and a functional jit/pjit train step.
"""

from multimodal_organ_segmentation_tpu.train.losses import (  # noqa: F401
    dice_loss,
    cross_entropy_loss,
    focal_loss,
    tversky_loss,
    dice_ce_loss,
    get_loss,
)
from multimodal_organ_segmentation_tpu.train.metrics import (  # noqa: F401
    DiceMetric,
    ConfusionMatrix,
    HausdorffDistance,
    get_metrics,
)
