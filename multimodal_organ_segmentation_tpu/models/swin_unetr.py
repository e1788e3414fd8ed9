"""SwinUNETR: 3D Swin-transformer encoder + UNETR conv decoder.

The reference delegates this entire architecture to MONAI
(src/models/backbones/swin_unetr.py:14,80-96); here it is built from
scratch, TPU-first:

- channels-last NDHWC; window attention runs as batched MXU matmuls over
  ``[B·nW, heads, tokens, tokens]`` (tokens = 7³ = 343 per window);
- shifted windows via ``jnp.roll`` + additive region mask (no dynamic
  shapes — pad-to-window-multiple is static);
- relative position bias from a learned table indexed by a precomputed
  static index map;
- patch merging = space-to-depth(2³) → LayerNorm → Linear(8C→2C);
- UNETR decoder: residual conv blocks on each pyramid level + transpose-conv
  upsampling with skip concat;
- optional ``jax.checkpoint`` (remat) per stage for memory.

Feature pyramid (feature_size=fs): [fs@/2, 2fs@/4, 4fs@/8, 8fs@/16,
16fs@/32], matching the reference's declared encoder_channels
(swin_unetr.py:167-176).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_organ_segmentation_tpu.models.layers import Norm3D

Dtype = Any


# ---------------------------------------------------------------------------
# window utilities (static shapes)
# ---------------------------------------------------------------------------

def window_partition(x: jax.Array, window: Tuple[int, int, int]) -> jax.Array:
    """[B, H, W, D, C] → [B·nW, wh·ww·wd, C]; H/W/D must divide window."""
    b, h, w, d, c = x.shape
    wh, ww, wd = window
    x = x.reshape(b, h // wh, wh, w // ww, ww, d // wd, wd, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wh * ww * wd, c)


def window_unpartition(
    windows: jax.Array, window: Tuple[int, int, int], dims: Tuple[int, int, int, int]
) -> jax.Array:
    """Inverse of window_partition."""
    b, h, w, d = dims
    wh, ww, wd = window
    c = windows.shape[-1]
    x = windows.reshape(b, h // wh, w // ww, d // wd, wh, ww, wd, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, h, w, d, c)


def _relative_position_index(window: Tuple[int, int, int]) -> np.ndarray:
    """Static [N, N] index into the (2wh-1)(2ww-1)(2wd-1) bias table."""
    wh, ww, wd = window
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), np.arange(wd), indexing="ij")
    )  # [3, wh, ww, wd]
    flat = coords.reshape(3, -1)  # [3, N]
    rel = flat[:, :, None] - flat[:, None, :]  # [3, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int32)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 2] += wd - 1
    rel[:, :, 0] *= (2 * ww - 1) * (2 * wd - 1)
    rel[:, :, 1] *= 2 * wd - 1
    return rel.sum(-1)  # [N, N]


def _shift_attention_mask(
    dims: Tuple[int, int, int],
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
) -> jax.Array:
    """Additive [nW, N, N] mask forbidding attention across rolled borders.

    Computed with device ops at trace time — materializing this as a host
    constant would embed ~160MB into the HLO at stage 1 of a 96³ model
    (343 windows × 343² floats), blowing up compile times and program-size
    limits.
    """
    h, w, d = dims
    wh, ww, wd = window

    def axis_ids(size: int, win: int, s: int) -> jax.Array:
        pos = jnp.arange(size)
        if s == 0:
            return jnp.zeros((size,), jnp.int32)
        return (pos >= size - win).astype(jnp.int32) + (
            pos >= size - s
        ).astype(jnp.int32)

    ids = (
        axis_ids(h, wh, shift[0])[:, None, None] * 9
        + axis_ids(w, ww, shift[1])[None, :, None] * 3
        + axis_ids(d, wd, shift[2])[None, None, :]
    )  # [H, W, D]
    ids = window_partition(ids[None, ..., None].astype(jnp.float32), window)[..., 0]
    # ids: [nW, N]
    diff = ids[:, None, :] - ids[:, :, None]
    return jnp.where(diff != 0, -1e9, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# transformer pieces
# ---------------------------------------------------------------------------

class WindowAttention(nn.Module):
    """Multi-head self attention within windows + relative position bias.

    Two execution paths:
    - fused Pallas kernel (TPU default): softmax(q·kᵀ + bias + mask)·v per
      (window, head) entirely in VMEM — the XLA path materializes
      ``[B·nW, h, N, N]`` scores in HBM (~0.5 GB/batch at stage 1 of a 96³
      model), pure bandwidth waste;
    - dense XLA path: CPU tests, attention-prob capture (sow), dropout.
    """

    dim: int
    num_heads: int
    window: Tuple[int, int, int]
    attn_drop: float = 0.0
    dtype: Dtype = jnp.float32
    use_fused: Optional[bool] = None  # None = auto (TPU)

    @nn.compact
    def __call__(self, x: jax.Array, mask=None, train: bool = True) -> jax.Array:
        # x: [B_, N, C] where B_ = B·nW
        b_, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(c * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        table_size = (
            (2 * self.window[0] - 1)
            * (2 * self.window[1] - 1)
            * (2 * self.window[2] - 1)
        )
        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            (table_size, self.num_heads),
            jnp.float32,
        )
        rel_idx = jnp.asarray(_relative_position_index(self.window))
        bias = bias_table[rel_idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # [heads, N, N]

        capture = self.is_mutable_collection("intermediates")
        use_fused = (
            self.use_fused
            if self.use_fused is not None
            else jax.default_backend() == "tpu"
        )
        if use_fused and not capture and self.attn_drop == 0.0:
            from multimodal_organ_segmentation_tpu.ops.pallas.window_attention import (
                window_mha,
            )

            nw = mask.shape[0] if mask is not None else 1
            out = window_mha(q, k, v, bias, mask, nw)
            out = out.reshape(b_, n, c).astype(x.dtype)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

        scale = head_dim ** -0.5
        attn = (
            jnp.einsum(
                "bnhd,bmhd->bhnm",
                q.astype(jnp.float32),
                k.astype(jnp.float32),
            )
            * scale
        )
        attn = attn + bias[None]
        if mask is not None:
            # mask: [nW, N, N]; attn rows are grouped per batch as B·nW
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        # expose attention probabilities to the AttentionVisualizer; no-op
        # unless apply() passes mutable=["intermediates"]. Never during
        # init — everything is mutable there, and sowing would bake huge
        # prob tensors into the returned variables.
        if not self.is_initializing():
            self.sow("intermediates", "attn_probs", attn)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)

        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v.astype(jnp.float32))
        out = out.reshape(b_, n, c).astype(x.dtype)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """LN → (S)W-MSA → +res → LN → MLP(4×, GELU) → +res."""

    dim: int
    num_heads: int
    window: Tuple[int, int, int]
    shift: bool = False
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: Dtype = jnp.float32
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b, h, w, d, c = x.shape
        wh, ww, wd = self.window
        # clamp window to volume size (Swin rule: window ≥ dim ⇒ no shift)
        wh, ww, wd = min(wh, h), min(ww, w), min(wd, d)
        window = (wh, ww, wd)
        shift = (
            (wh // 2 if wh < h else 0, ww // 2 if ww < w else 0, wd // 2 if wd < d else 0)
            if self.shift
            else (0, 0, 0)
        )

        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)

        # pad to window multiples (static)
        ph, pw, pd = (-h) % wh, (-w) % ww, (-d) % wd
        if ph or pw or pd:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, pd), (0, 0)))
        hp, wp, dp = h + ph, w + pw, d + pd

        if any(shift):
            y = jnp.roll(y, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = _shift_attention_mask((hp, wp, dp), window, shift)
        else:
            mask = None

        windows = window_partition(y, window)
        attended = WindowAttention(
            self.dim,
            self.num_heads,
            window,
            attn_drop=self.attn_drop,
            dtype=self.dtype,
            use_fused=self.use_fused,
            name="attn",
        )(windows, mask, train)
        y = window_unpartition(attended, window, (b, hp, wp, dp))

        if any(shift):
            y = jnp.roll(y, shift, axis=(1, 2, 3))
        if ph or pw or pd:
            y = y[:, :h, :w, :d, :]

        x = shortcut + y

        # MLP
        z = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z)
        if self.drop > 0:
            z = nn.Dropout(self.drop, deterministic=not train)(z)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(z)
        return x + z


class PatchMerging(nn.Module):
    """Space-to-depth 2³ → LayerNorm → Linear(8C → 2C)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, d, c = x.shape
        ph, pw, pd = h % 2, w % 2, d % 2
        if ph or pw or pd:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, pd), (0, 0)))
            h, w, d = h + ph, w + pw, d + pd
        x = x.reshape(b, h // 2, 2, w // 2, 2, d // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, h // 2, w // 2, d // 2, 8 * c
        )
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype)(x)


class _UnetrResBlock(nn.Module):
    """conv-norm-act ×2 + 1×1 shortcut (UNETR basic residual block)."""

    features: int
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        residual = x
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        y = Norm3D(self.norm, dtype=self.dtype)(y, train)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME", dtype=self.dtype)(y)
        y = Norm3D(self.norm, dtype=self.dtype)(y, train)
        if residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype)(residual)
            residual = Norm3D(self.norm, dtype=self.dtype)(residual, train)
        return nn.leaky_relu(y + residual, 0.01)


class _UnetrUpBlock(nn.Module):
    """transpose-conv ×2 → concat skip → residual block."""

    features: int
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool = True) -> jax.Array:
        x = nn.ConvTranspose(
            self.features,
            kernel_size=(2, 2, 2),
            strides=(2, 2, 2),
            padding="VALID",
            dtype=self.dtype,
        )(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return _UnetrResBlock(self.features, self.norm, self.dtype)(x, train)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

class SwinUNETR(nn.Module):
    """3D Swin encoder + UNETR decoder.

    Input ``[B, H, W, D, C_in]`` (H/W/D divisible by 32) → logits
    ``[B, H, W, D, out_channels]``.
    """

    out_channels: int = 8
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (7, 7, 7)
    norm: str = "instance"
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    use_remat: bool = False
    dtype: Dtype = jnp.float32
    # explainability: grad-capture points at pyramid outputs (see unet3d)
    enable_perturb: bool = False
    # fused Pallas window attention (None = auto: on for TPU)
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        capture: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, List[jax.Array]]]:
        fs = self.feature_size
        x = x.astype(self.dtype)
        inp = x

        # patch embed: conv k=2 s=2 → fs @ /2
        y = nn.Conv(
            fs, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)

        hidden: List[jax.Array] = []
        dims = [fs, fs * 2, fs * 4, fs * 8]
        block_cls = SwinBlock
        if self.use_remat:
            block_cls = nn.remat(SwinBlock, static_argnums=(2,))
        for stage in range(4):
            for bi in range(self.depths[stage]):
                y = block_cls(
                    dim=dims[stage],
                    num_heads=self.num_heads[stage],
                    window=tuple(self.window_size),
                    shift=(bi % 2 == 1),
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    dtype=self.dtype,
                    use_fused=self.use_fused,
                    name=f"stage{stage}_block{bi}",
                )(y, train)
            if self.enable_perturb:
                y = self.perturb(f"stage{stage}", y)
            hidden.append(y)
            y = PatchMerging(dims[stage], dtype=self.dtype, name=f"merge{stage}")(y)
        if self.enable_perturb:
            y = self.perturb("stage4", y)
        hidden.append(y)  # bottleneck 16fs @ /32

        # UNETR decoder
        enc0 = _UnetrResBlock(fs, self.norm, self.dtype, name="encoder0")(inp, train)
        enc1 = _UnetrResBlock(fs, self.norm, self.dtype, name="encoder1")(
            hidden[0], train
        )
        enc2 = _UnetrResBlock(fs * 2, self.norm, self.dtype, name="encoder2")(
            hidden[1], train
        )
        enc3 = _UnetrResBlock(fs * 4, self.norm, self.dtype, name="encoder3")(
            hidden[2], train
        )
        enc4 = _UnetrResBlock(fs * 8, self.norm, self.dtype, name="encoder4")(
            hidden[3], train
        )
        bottleneck = _UnetrResBlock(fs * 16, self.norm, self.dtype, name="encoder10")(
            hidden[4], train
        )

        d4 = _UnetrUpBlock(fs * 8, self.norm, self.dtype, name="decoder5")(
            bottleneck, enc4, train
        )
        d3 = _UnetrUpBlock(fs * 4, self.norm, self.dtype, name="decoder4")(
            d4, enc3, train
        )
        d2 = _UnetrUpBlock(fs * 2, self.norm, self.dtype, name="decoder3")(
            d3, enc2, train
        )
        d1 = _UnetrUpBlock(fs, self.norm, self.dtype, name="decoder2")(d2, enc1, train)
        d0 = _UnetrUpBlock(fs, self.norm, self.dtype, name="decoder1")(d1, enc0, train)

        logits = nn.Conv(
            self.out_channels, (1, 1, 1), dtype=jnp.float32, name="out_conv"
        )(d0.astype(jnp.float32))

        if capture:
            return logits, hidden
        return logits

    @property
    def encoder_channels(self) -> List[int]:
        fs = self.feature_size
        return [fs, fs * 2, fs * 4, fs * 8, fs * 16]


def build_swin_unetr(config, dtype=jnp.float32) -> SwinUNETR:
    """Factory from config (reference: swin_unetr.py:179-200)."""
    backbone = config.get("model.backbone", {}) or {}
    return SwinUNETR(
        out_channels=int(config.get("model.out_channels", 8)),
        feature_size=int(backbone.get("feature_size", 48)),
        depths=tuple(backbone.get("depths", [2, 2, 2, 2])),
        num_heads=tuple(backbone.get("num_heads", [3, 6, 12, 24])),
        window_size=tuple(backbone.get("window_size", [7, 7, 7])),
        drop_rate=float(config.get("model.head.dropout", 0.0) or 0.0),
        use_remat=bool(config.get("parallel.remat", False)),
        dtype=dtype,
        enable_perturb=bool(config.get("model.enable_perturb", False)),
    )
