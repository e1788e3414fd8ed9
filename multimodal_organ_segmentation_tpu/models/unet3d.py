"""3D UNet backbone (reference: src/models/backbones/unet.py:116-226).

Encoder-decoder with skip connections; feature ladder default
[32, 64, 128, 256, 512]; the bottleneck is excluded from skips
(unet.py:190). Channels-last; bf16-compute-capable.
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
    UpBlock3D,
)


class UNet3D(nn.Module):
    """Standard 3D UNet.

    Input ``[B, H, W, D, C_in]`` → logits ``[B, H, W, D, out_channels]``.
    ``capture`` returns encoder features for explainability (the JAX
    answer to the reference's ``return_features``, build.py:49-64).
    """

    out_channels: int = 8
    features: Sequence[int] = (32, 64, 128, 256, 512)
    norm: str = "instance"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    # explainability: register zero "perturbations" at encoder outputs so
    # jax.grad(score)(perturbations) yields d score / d activation — the
    # JAX replacement for the reference's torch backward hooks
    # (gradcam.py:44-59)
    enable_perturb: bool = False
    # tensor parallelism: mesh axis to shard activation channels over
    # (requires an active mesh context; GSPMD inserts the collectives)
    tp_axis: Any = None
    # deep supervision: 1×1 aux heads on the intermediate decoder stages,
    # linearly upsampled to full resolution; training returns
    # [main, aux_fine, ..., aux_coarse] and the trainer's loss wrapper
    # applies 1, 1/2, 1/4... weights. Both the reference and this repo
    # shipped DeepSupervisionHead as dead code (reference
    # segmentation.py:62-115 — defined, never trained); this wires the
    # capability into the actual train path. Inference (train=False) always
    # returns the single full-res logits (aux heads are DCE'd by XLA).
    deep_supervision: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        capture: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, List[jax.Array]]]:
        feats = list(self.features)
        x = x.astype(self.dtype)

        from multimodal_organ_segmentation_tpu.parallel.mesh import constrain_channels

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
            x = constrain_channels(x, self.tp_axis)
            if self.enable_perturb:
                x = self.perturb(f"feat{i + 1}", x)
            encoder_features.append(x)

        skips = encoder_features[:-1]  # bottleneck excluded from skips
        aux_logits: List[jax.Array] = []
        for j, i in enumerate(range(len(feats) - 1, 0, -1)):
            x = UpBlock3D(
                features=feats[i - 1],
                up_features=feats[i] // 2,
                norm=self.norm,
                dtype=self.dtype,
                name=f"up{j}",
            )(x, skips[i - 1], train)
            if self.deep_supervision and i > 1:
                # aux head params must exist regardless of `train` so the
                # init-time tree matches the train-time tree; at inference
                # the unused results are dead code to XLA
                # ≥f32 head (AMP pattern); promote keeps f64 under jax x64
                hd = jnp.promote_types(x.dtype, jnp.float32)
                aux_logits.append(
                    nn.Conv(
                        self.out_channels,
                        (1, 1, 1),
                        dtype=hd,
                        name=f"ds_head{j}",
                    )(x.astype(hd))
                )

        x = Dropout3D(self.dropout)(x, train)
        hd = jnp.promote_types(x.dtype, jnp.float32)
        logits = nn.Conv(
            self.out_channels, (1, 1, 1), dtype=hd, name="out_conv"
        )(x.astype(hd))

        if self.deep_supervision and train and aux_logits:
            from multimodal_organ_segmentation_tpu.ops.resize import resize_linear

            full = tuple(logits.shape[1:4])
            # finest aux first (highest weight under the trainer's 2^-k rule)
            outs = [logits] + [
                resize_linear(a, full, (1, 2, 3)) for a in reversed(aux_logits)
            ]
            if capture:
                return outs, encoder_features
            return outs

        if capture:
            return logits, encoder_features
        return logits

    @property
    def encoder_channels(self) -> List[int]:
        return list(self.features)


def build_unet3d(config, dtype=jnp.float32) -> UNet3D:
    """Factory from config (reference: unet.py:208-226)."""
    backbone = config.get("model.backbone", {}) or {}
    return UNet3D(
        out_channels=int(config.get("model.out_channels", 8)),
        features=tuple(backbone.get("features", [32, 64, 128, 256, 512])),
        norm=str(backbone.get("norm", "instance")),
        dropout=float(config.get("model.head.dropout", 0.0) or 0.0),
        dtype=dtype,
        enable_perturb=bool(config.get("model.enable_perturb", False)),
        tp_axis=_config_tp_axis(config),
        deep_supervision=(
            str(config.get("model.head.type", "conv")) == "deep_supervision"
        ),
    )


def _config_tp_axis(config):
    from multimodal_organ_segmentation_tpu.parallel.mesh import config_tp_axis

    return config_tp_axis(config)
