"""Model factory + multimodal wrapper (reference: src/models/build.py:16-119).

``MODEL_REGISTRY`` maps names → builders; ``build_model`` instantiates the
backbone and wraps it in ``MultiModalSegmentationModel`` whose ``__call__``
supports ``capture`` for explainability (the JAX replacement for the
reference's ``return_features``/torch hooks).

The compute dtype comes from ``hardware.mixed_precision``: "bf16" →
bfloat16 activations with fp32 params (TPU-native AMP; reference used fp16
GradScaler, trainer.py:74-75, unnecessary with bf16's fp32-range exponent).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D, build_unet3d
from multimodal_organ_segmentation_tpu.models.dual_encoder import (
    DualEncoder,
    build_dual_encoder,
)
from multimodal_organ_segmentation_tpu.models.swin_unetr import (
    SwinUNETR,
    build_swin_unetr,
)
from multimodal_organ_segmentation_tpu.models.attention_unet import (
    AttentionUNet3D,
    build_attention_unet,
)

MODEL_REGISTRY: Dict[str, Callable] = {
    "swin_unetr": build_swin_unetr,
    "unet": build_unet3d,
    "unet3d": build_unet3d,
    # real attention-gated UNet (the reference CLI advertises this name but
    # its registry never implements it, build.py:16-21)
    "attention_unet": build_attention_unet,
    "dual_encoder": build_dual_encoder,
}


class MultiModalSegmentationModel(nn.Module):
    """Thin wrapper delegating to a backbone
    (reference: build.py:24-74)."""

    backbone: nn.Module

    def __call__(self, x: jax.Array, train: bool = True, capture: bool = False):
        return self.backbone(x, train=train, capture=capture)


def compute_dtype(config) -> Any:
    mp = str(config.get("hardware.mixed_precision", "bf16")).lower()
    if mp in ("bf16", "bfloat16", "true", "mixed"):
        return jnp.bfloat16
    return jnp.float32


def get_model(name: str):
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name]


def build_model(config) -> MultiModalSegmentationModel:
    """Build the configured model.

    For concat-input models, in_channels is forced to len(modalities)
    (reference: build.py:94-99) — in NDHWC that's simply the input's last
    dim; the builders don't need an explicit in_channels.
    """
    name = str(config.get("model.name", "swin_unetr")).lower()
    dtype = compute_dtype(config)
    backbone = get_model(name)(config, dtype=dtype)
    return MultiModalSegmentationModel(backbone=backbone)


def model_input_channels(config) -> int:
    """Channel count of the stacked-modalities input tensor."""
    return len(config.get("data.modalities", ["CT", "PET"]))
