"""Shared conv building blocks (channels-last NDHWC, flax.linen).

Reference parity: ConvBlock3D / DownBlock3D / UpBlock3D
(src/models/backbones/unet.py:12-113). Semantics preserved:

- conv(3³, pad 1) → norm → act, twice per block;
- norm ∈ {batch, instance, group(8), none}; torch InstanceNorm3d is
  affine-free ⇒ GroupNorm(groups=C, no scale/bias);
- down = maxpool(2) → block;
- up = transpose-conv(2, stride 2) (or linear 2× upsample + 1×1 conv),
  resize-on-mismatch, skip concat, block.

TPU notes: NDHWC keeps the channel dim last so XLA lowers convs onto the
MXU without transposes; norms + activations fuse into the conv epilogue.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_organ_segmentation_tpu.ops.resize import resize_linear

Dtype = Any


def activation_fn(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "relu":
        return nn.relu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "gelu":
        return nn.gelu
    return nn.relu


class Norm3D(nn.Module):
    """Normalization dispatcher matching the reference vocabulary."""

    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.norm == "batch":
            return nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, axis_name=None
            )(x)
        if self.norm == "instance":
            # torch InstanceNorm3d default: affine=False, eps=1e-5
            return nn.GroupNorm(
                num_groups=None,
                group_size=1,
                use_scale=False,
                use_bias=False,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.norm == "group":
            return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype)(x)
        return x


class ConvBlock3D(nn.Module):
    """(conv3³ → norm → act) × 2."""

    features: int
    kernel_size: int = 3
    norm: str = "instance"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        act = activation_fn(self.activation)
        k = (self.kernel_size,) * 3
        x = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype)(x)
        x = Norm3D(self.norm, dtype=self.dtype)(x, train)
        x = act(x)
        x = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype)(x)
        x = Norm3D(self.norm, dtype=self.dtype)(x, train)
        x = act(x)
        return x


def max_pool_3d(x: jax.Array, window: int = 2) -> jax.Array:
    w = (window,) * 3
    return nn.max_pool(x, window_shape=w, strides=w)


class DownBlock3D(nn.Module):
    """maxpool(2) → ConvBlock3D."""

    features: int
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        x_pool = max_pool_3d(x)
        x_conv = ConvBlock3D(self.features, norm=self.norm, dtype=self.dtype)(
            x_pool, train
        )
        return x_conv, x_pool


class UpBlock3D(nn.Module):
    """Upsample ×2 → (resize-on-mismatch) → concat skip → ConvBlock3D."""

    features: int  # output features
    up_features: int  # features after the upsampling conv (in_channels // 2)
    norm: str = "instance"
    mode: str = "transpose"  # or "linear"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool = True) -> jax.Array:
        if self.mode == "transpose":
            x = nn.ConvTranspose(
                self.up_features,
                kernel_size=(2, 2, 2),
                strides=(2, 2, 2),
                padding="VALID",
                dtype=self.dtype,
            )(x)
        else:
            out_shape = tuple(s * 2 for s in x.shape[1:4])
            x = resize_linear(x, out_shape, spatial_axes=(1, 2, 3))
            x = nn.Conv(self.up_features, (1, 1, 1), dtype=self.dtype)(x)

        if x.shape[1:4] != skip.shape[1:4]:
            x = resize_linear(x, skip.shape[1:4], spatial_axes=(1, 2, 3))

        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBlock3D(self.features, norm=self.norm, dtype=self.dtype)(x, train)
        return x


class Dropout3D(nn.Module):
    """Channel dropout like torch Dropout3d: drops whole channels."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.rate <= 0.0 or not train:
            return x
        # broadcast over spatial dims → whole-channel dropout
        return nn.Dropout(
            rate=self.rate, broadcast_dims=tuple(range(1, x.ndim - 1)), deterministic=False
        )(x)
