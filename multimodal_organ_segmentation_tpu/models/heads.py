"""Prediction heads (reference: src/models/heads/, SURVEY.md §2.3).

Composable modules: segmentation (dropout + kxk conv + optional activation),
deep supervision (per-scale heads upsampled to target), anchor-based
detection, and anchor-free CenterNet-style detection.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_organ_segmentation_tpu.models.layers import Dropout3D
from multimodal_organ_segmentation_tpu.ops.resize import resize_linear

Dtype = Any


class SegmentationHead(nn.Module):
    """dropout → conv(k) → optional softmax/sigmoid
    (reference: segmentation.py:11-59)."""

    num_classes: int
    kernel_size: int = 1
    dropout: float = 0.0
    activation: Optional[str] = None  # None (logits), "softmax", "sigmoid"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = Dropout3D(self.dropout)(x, train)
        k = (self.kernel_size,) * 3
        x = nn.Conv(self.num_classes, k, padding="SAME", dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        if self.activation == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        elif self.activation == "sigmoid":
            x = jax.nn.sigmoid(x)
        return x


class DeepSupervisionHead(nn.Module):
    """One SegmentationHead per scale, all linearly upsampled to
    ``target_size`` (reference: segmentation.py:62-115)."""

    num_classes: int
    target_size: Tuple[int, int, int]
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jax.Array], train: bool = True) -> List[jax.Array]:
        outs = []
        for i, f in enumerate(features):
            logits = SegmentationHead(
                self.num_classes,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"scale{i}",
            )(f, train)
            if logits.shape[1:4] != tuple(self.target_size):
                logits = resize_linear(logits, tuple(self.target_size), (1, 2, 3))
            outs.append(logits)
        return outs


class DetectionHead(nn.Module):
    """Anchor-based: shared conv → cls (anchors×classes) + reg (anchors×6)
    (reference: detection.py:12-71)."""

    num_classes: int
    num_anchors: int = 3
    hidden: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True):
        h = nn.Conv(self.hidden, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        h = nn.relu(h)
        cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3, 3), padding="SAME",
            dtype=jnp.float32, name="cls_head",
        )(h.astype(jnp.float32))
        reg = nn.Conv(
            self.num_anchors * 6, (3, 3, 3), padding="SAME",
            dtype=jnp.float32, name="reg_head",
        )(h.astype(jnp.float32))
        return {"cls": cls, "reg": reg}


class CenterNetHead(nn.Module):
    """Anchor-free: heatmap(sigmoid) + offset(3) + size(3)
    (reference: detection.py:74-138)."""

    num_classes: int
    hidden: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True):
        def branch(out, name):
            h = nn.Conv(
                self.hidden, (3, 3, 3), padding="SAME", dtype=self.dtype,
                name=f"{name}_conv",
            )(x)
            h = nn.relu(h)
            return nn.Conv(
                out, (1, 1, 1), dtype=jnp.float32, name=f"{name}_out"
            )(h.astype(jnp.float32))

        return {
            "heatmap": jax.nn.sigmoid(branch(self.num_classes, "heatmap")),
            "offset": branch(3, "offset"),
            "size": branch(3, "size"),
        }
