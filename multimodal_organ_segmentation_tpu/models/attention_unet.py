"""Attention U-Net: UNet3D with attention-gated skip connections.

The reference CLI offers ``--model attention_unet`` (main.py:164) but its
registry has no such model (build.py:16-21) — the flag silently falls back.
Here it is a real architecture: additive attention gates (Oktay et al.,
"Attention U-Net") modulate each skip connection with a gating signal from
the coarser decoder level before concatenation.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_organ_segmentation_tpu.models.layers import (
    ConvBlock3D,
    DownBlock3D,
    Dropout3D,
    Norm3D,
)
from multimodal_organ_segmentation_tpu.ops.resize import resize_linear


class AttentionGate(nn.Module):
    """Additive attention gate: α = σ(ψ(relu(Wg·g + Wx·x))), out = x·α."""

    inter_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array, train: bool = True) -> jax.Array:
        # g: gating signal (coarser, [B, h/2, w/2, d/2, Cg]); x: skip features
        theta_x = nn.Conv(
            self.inter_channels, (2, 2, 2), strides=(2, 2, 2), use_bias=False,
            dtype=self.dtype, name="theta",
        )(x)
        phi_g = nn.Conv(
            self.inter_channels, (1, 1, 1), dtype=self.dtype, name="phi"
        )(g)
        if phi_g.shape[1:4] != theta_x.shape[1:4]:
            phi_g = resize_linear(phi_g, theta_x.shape[1:4], (1, 2, 3))
        f = nn.relu(theta_x + phi_g)
        alpha = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="psi")(f)
        alpha = jax.nn.sigmoid(alpha)
        alpha = resize_linear(alpha, x.shape[1:4], (1, 2, 3))
        return x * alpha


class AttentionUNet3D(nn.Module):
    """3D UNet with attention-gated skips."""

    out_channels: int = 8
    features: Sequence[int] = (32, 64, 128, 256, 512)
    norm: str = "instance"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    enable_perturb: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        capture: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, List[jax.Array]]]:
        feats = list(self.features)
        x = x.astype(self.dtype)

        x = ConvBlock3D(feats[0], norm=self.norm, dtype=self.dtype, name="init_conv")(
            x, train
        )
        if self.enable_perturb:
            x = self.perturb("feat0", x)
        encoder_features = [x]
        for i in range(len(feats) - 1):
            x, _ = DownBlock3D(
                feats[i + 1], norm=self.norm, dtype=self.dtype, name=f"down{i}"
            )(x, train)
            if self.enable_perturb:
                x = self.perturb(f"feat{i + 1}", x)
            encoder_features.append(x)

        skips = encoder_features[:-1]
        for j, i in enumerate(range(len(feats) - 1, 0, -1)):
            skip = skips[i - 1]
            gated = AttentionGate(
                inter_channels=max(feats[i - 1] // 2, 1),
                dtype=self.dtype,
                name=f"gate{j}",
            )(skip, x, train)

            x = nn.ConvTranspose(
                feats[i] // 2, kernel_size=(2, 2, 2), strides=(2, 2, 2),
                padding="VALID", dtype=self.dtype, name=f"up{j}_tconv",
            )(x)
            if x.shape[1:4] != gated.shape[1:4]:
                x = resize_linear(x, gated.shape[1:4], (1, 2, 3))
            x = jnp.concatenate([x, gated], axis=-1)
            x = ConvBlock3D(
                feats[i - 1], norm=self.norm, dtype=self.dtype, name=f"up{j}_conv"
            )(x, train)

        x = Dropout3D(self.dropout)(x, train)
        logits = nn.Conv(
            self.out_channels, (1, 1, 1), dtype=jnp.float32, name="out_conv"
        )(x.astype(jnp.float32))
        if capture:
            return logits, encoder_features
        return logits

    @property
    def encoder_channels(self) -> List[int]:
        return list(self.features)


def build_attention_unet(config, dtype=jnp.float32) -> AttentionUNet3D:
    backbone = config.get("model.backbone", {}) or {}
    return AttentionUNet3D(
        out_channels=int(config.get("model.out_channels", 8)),
        features=tuple(backbone.get("features", [32, 64, 128, 256, 512])),
        norm=str(backbone.get("norm", "instance")),
        dropout=float(config.get("model.head.dropout", 0.0) or 0.0),
        dtype=dtype,
        enable_perturb=bool(config.get("model.enable_perturb", False)),
    )
