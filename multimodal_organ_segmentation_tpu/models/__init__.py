"""Model zoo: backbones (UNet3D, SwinUNETR, DualEncoder), fusion, heads.

Reference parity: src/models/ (SURVEY.md §2.3). All modules are
flax.linen in channels-last NDHWC layout with a configurable compute dtype
(bf16 on TPU, fp32 params).
"""

from multimodal_organ_segmentation_tpu.models.build import (  # noqa: F401
    MODEL_REGISTRY,
    build_model,
    get_model,
)
from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D  # noqa: F401
from multimodal_organ_segmentation_tpu.models.dual_encoder import DualEncoder  # noqa: F401
from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR  # noqa: F401
