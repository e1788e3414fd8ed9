"""Torch re-implementation of ``monai.networks.nets.SwinUNETR`` for
checkpoint-interchange tests.

The reference delegates its SwinUNETR entirely to MONAI
(/root/reference/src/models/backbones/swin_unetr.py:80-96, requirements
``monai>=1.3.0``) with ``downsample="merging"``, ``use_v2=False``,
``normalize=True``, ``norm_name="instance"``. MONAI is not installable in
this environment, so this module re-creates that network in plain torch —
module tree, state_dict key names, and numerics transcribed from MONAI
1.3's swin_unetr.py / dynunet_block.py — to serve as the torch side of the
import-parity tests (tests/test_swin_import.py). A state_dict produced by
``MonaiSwinUNETR(...).state_dict()`` here has the same keys/shapes as a real
MONAI checkpoint, so the flax import mapping exercised against it applies
unchanged to reference ``.pth`` files.

Faithfulness notes (all load-bearing for bit parity):
- swinViT feature taps are AFTER each BasicLayer (blocks + downsample), plus
  the raw patch embed, each passed through a parameterless
  ``F.layer_norm`` (``proj_out``, normalize=True).
- ``PatchMerging`` ("merging", v1) concatenates the 8 neighbor slices in
  MONAI's v1 order — (0,1,0) and (0,0,1) sampled twice, (1,1,0)/(0,1,1)
  never (the quirk PatchMergingV2 later fixed); LayerNorm over the
  duplicated 8C vector, then Linear(8C→2C, bias=False).
- decoder5's skip is the raw normalized /16 hidden state (no UnetrBasicBlock
  on it); UnetResBlock convs are bias-free; InstanceNorm3d is affine-free;
  LeakyReLU slope 0.01; shift-window mask fill value -100.0.
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# swin transformer pieces (monai/networks/nets/swin_unetr.py)
# ---------------------------------------------------------------------------

def window_partition(x: torch.Tensor, ws: Sequence[int]) -> torch.Tensor:
    b, d, h, w, c = x.shape
    x = x.view(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
    return (
        x.permute(0, 1, 3, 5, 2, 4, 6, 7)
        .contiguous()
        .view(-1, ws[0] * ws[1] * ws[2], c)
    )


def window_reverse(windows: torch.Tensor, ws: Sequence[int], dims) -> torch.Tensor:
    b, d, h, w = dims
    x = windows.view(
        b, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1], ws[2], -1
    )
    return x.permute(0, 1, 4, 2, 5, 3, 6, 7).contiguous().view(b, d, h, w, -1)


def get_window_size(x_size, window_size, shift_size=None):
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_window[i] = x_size[i]
            if shift_size is not None:
                use_shift[i] = 0
    if shift_size is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def compute_mask(dims, window_size, shift_size, device):
    d, h, w = dims
    img_mask = torch.zeros((1, d, h, w, 1), device=device)
    cnt = 0
    for d_ in (
        slice(-window_size[0]),
        slice(-window_size[0], -shift_size[0]),
        slice(-shift_size[0], None),
    ):
        for h_ in (
            slice(-window_size[1]),
            slice(-window_size[1], -shift_size[1]),
            slice(-shift_size[1], None),
        ):
            for w_ in (
                slice(-window_size[2]),
                slice(-window_size[2], -shift_size[2]),
                slice(-shift_size[2], None),
            ):
                img_mask[:, d_, h_, w_, :] = cnt
                cnt += 1
    mask_windows = window_partition(img_mask, window_size).squeeze(-1)
    attn_mask = mask_windows.unsqueeze(1) - mask_windows.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
        attn_mask == 0, 0.0
    )
    return attn_mask


class WindowAttention(nn.Module):
    def __init__(self, dim, num_heads, window_size, qkv_bias=True):
        super().__init__()
        self.dim = dim
        self.window_size = tuple(window_size)
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim**-0.5

        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(
                (2 * window_size[0] - 1)
                * (2 * window_size[1] - 1)
                * (2 * window_size[2] - 1),
                num_heads,
            )
        )
        coords_d = torch.arange(window_size[0])
        coords_h = torch.arange(window_size[1])
        coords_w = torch.arange(window_size[2])
        coords = torch.stack(
            torch.meshgrid(coords_d, coords_h, coords_w, indexing="ij")
        )
        coords_flatten = torch.flatten(coords, 1)
        relative_coords = coords_flatten[:, :, None] - coords_flatten[:, None, :]
        relative_coords = relative_coords.permute(1, 2, 0).contiguous()
        relative_coords[:, :, 0] += window_size[0] - 1
        relative_coords[:, :, 1] += window_size[1] - 1
        relative_coords[:, :, 2] += window_size[2] - 1
        relative_coords[:, :, 0] *= (2 * window_size[1] - 1) * (
            2 * window_size[2] - 1
        )
        relative_coords[:, :, 1] *= 2 * window_size[2] - 1
        self.register_buffer(
            "relative_position_index", relative_coords.sum(-1)
        )

        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.softmax = nn.Softmax(dim=-1)
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)

    def forward(self, x, mask=None):
        b, n, c = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b, n, 3, self.num_heads, c // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        relative_position_bias = self.relative_position_bias_table[
            self.relative_position_index.clone()[:n, :n].reshape(-1)
        ].reshape(n, n, -1)
        relative_position_bias = relative_position_bias.permute(
            2, 0, 1
        ).contiguous()
        attn = attn + relative_position_bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b // nw, nw, self.num_heads, n, n) + mask.unsqueeze(
                1
            ).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = self.softmax(attn)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class MLPBlock(nn.Module):
    """MONAI MLPBlock: linear1 → GELU → linear2 (key names linear1/linear2)."""

    def __init__(self, hidden_size, mlp_dim):
        super().__init__()
        self.linear1 = nn.Linear(hidden_size, mlp_dim)
        self.linear2 = nn.Linear(mlp_dim, hidden_size)
        self.act = nn.GELU()

    def forward(self, x):
        return self.linear2(self.act(self.linear1(x)))


class SwinTransformerBlock(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio=4.0):
        super().__init__()
        self.window_size = tuple(window_size)
        self.shift_size = tuple(shift_size)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, num_heads, window_size)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))

    def forward_part1(self, x, mask_matrix):
        x = self.norm1(x)
        b, d, h, w, c = x.shape
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size, self.shift_size
        )
        pad_d = (window_size[0] - d % window_size[0]) % window_size[0]
        pad_h = (window_size[1] - h % window_size[1]) % window_size[1]
        pad_w = (window_size[2] - w % window_size[2]) % window_size[2]
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h, 0, pad_d))
        _, dp, hp, wp, _ = x.shape
        dims = [b, dp, hp, wp]
        if any(i > 0 for i in shift_size):
            shifted_x = torch.roll(
                x,
                shifts=(-shift_size[0], -shift_size[1], -shift_size[2]),
                dims=(1, 2, 3),
            )
            attn_mask = mask_matrix
        else:
            shifted_x = x
            attn_mask = None
        x_windows = window_partition(shifted_x, window_size)
        attn_windows = self.attn(x_windows, mask=attn_mask)
        shifted_x = window_reverse(attn_windows, window_size, dims)
        if any(i > 0 for i in shift_size):
            x = torch.roll(shifted_x, shifts=shift_size, dims=(1, 2, 3))
        else:
            x = shifted_x
        return x[:, :d, :h, :w, :].contiguous()

    def forward(self, x, mask_matrix):
        x = x + self.forward_part1(x, mask_matrix)
        return x + self.mlp(self.norm2(x))


_MONAI_V1_SLICES = [
    (0, 0, 0),
    (1, 0, 0),
    (0, 1, 0),
    (0, 0, 1),
    (1, 0, 1),
    (0, 1, 0),  # duplicate of index 2 — MONAI v1 quirk
    (0, 0, 1),  # duplicate of index 3
    (1, 1, 1),
]


class PatchMerging(nn.Module):
    """MONAI ``PatchMerging`` ("merging", v1) — or v2 product order."""

    def __init__(self, dim, order="monai_v1"):
        super().__init__()
        self.dim = dim
        self.order = order
        self.reduction = nn.Linear(8 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(8 * dim)

    def forward(self, x):  # x: [b, d, h, w, c]
        b, d, h, w, c = x.shape
        if (d % 2) or (h % 2) or (w % 2):
            x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2, 0, d % 2))
        if self.order == "monai_v1":
            triples = _MONAI_V1_SLICES
        else:
            triples = list(itertools.product(range(2), range(2), range(2)))
        x = torch.cat(
            [x[:, i::2, j::2, k::2, :] for i, j, k in triples], -1
        )
        x = self.norm(x)
        return self.reduction(x)


class BasicLayer(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, downsample, order):
        super().__init__()
        self.window_size = tuple(window_size)
        self.shift_size = tuple(i // 2 for i in window_size)
        self.no_shift = tuple(0 for _ in window_size)
        self.blocks = nn.ModuleList(
            [
                SwinTransformerBlock(
                    dim,
                    num_heads,
                    window_size,
                    self.no_shift if (i % 2 == 0) else self.shift_size,
                )
                for i in range(depth)
            ]
        )
        self.downsample = PatchMerging(dim, order) if downsample else None

    def forward(self, x):  # x: [b, c, d, h, w]
        b, c, d, h, w = x.shape
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size, self.shift_size
        )
        x = x.permute(0, 2, 3, 4, 1).contiguous()  # b d h w c
        dp = int(np.ceil(d / window_size[0])) * window_size[0]
        hp = int(np.ceil(h / window_size[1])) * window_size[1]
        wp = int(np.ceil(w / window_size[2])) * window_size[2]
        attn_mask = compute_mask([dp, hp, wp], window_size, shift_size, x.device)
        for blk in self.blocks:
            x = blk(x, attn_mask)
        x = x.view(b, d, h, w, -1)
        if self.downsample is not None:
            x = self.downsample(x)
        return x.permute(0, 4, 1, 2, 3).contiguous()  # b c d h w


class PatchEmbed(nn.Module):
    def __init__(self, in_chans, embed_dim, patch_size=(2, 2, 2)):
        super().__init__()
        self.proj = nn.Conv3d(
            in_chans, embed_dim, kernel_size=patch_size, stride=patch_size
        )

    def forward(self, x):
        return self.proj(x)


class SwinTransformer(nn.Module):
    def __init__(
        self,
        in_chans,
        embed_dim,
        window_size,
        depths,
        num_heads,
        merge_order="monai_v1",
    ):
        super().__init__()
        self.patch_embed = PatchEmbed(in_chans, embed_dim)
        self.layers1 = nn.ModuleList(
            [BasicLayer(embed_dim, depths[0], num_heads[0], window_size, True, merge_order)]
        )
        self.layers2 = nn.ModuleList(
            [BasicLayer(embed_dim * 2, depths[1], num_heads[1], window_size, True, merge_order)]
        )
        self.layers3 = nn.ModuleList(
            [BasicLayer(embed_dim * 4, depths[2], num_heads[2], window_size, True, merge_order)]
        )
        self.layers4 = nn.ModuleList(
            [BasicLayer(embed_dim * 8, depths[3], num_heads[3], window_size, True, merge_order)]
        )

    @staticmethod
    def proj_out(x, normalize=False):
        if normalize:
            ch = x.shape[1]
            x = x.permute(0, 2, 3, 4, 1)  # n d h w c
            x = F.layer_norm(x, [ch])
            x = x.permute(0, 4, 1, 2, 3)
        return x

    def forward(self, x, normalize=True):
        x0 = self.patch_embed(x)
        x0_out = self.proj_out(x0, normalize)
        x1 = self.layers1[0](x0.contiguous())
        x1_out = self.proj_out(x1, normalize)
        x2 = self.layers2[0](x1.contiguous())
        x2_out = self.proj_out(x2, normalize)
        x3 = self.layers3[0](x2.contiguous())
        x3_out = self.proj_out(x3, normalize)
        x4 = self.layers4[0](x3.contiguous())
        x4_out = self.proj_out(x4, normalize)
        return [x0_out, x1_out, x2_out, x3_out, x4_out]


# ---------------------------------------------------------------------------
# UNETR conv blocks (monai/networks/blocks/dynunet_block.py, unetr_block.py)
# ---------------------------------------------------------------------------

class Convolution(nn.Module):
    """Minimal monai Convolution: the wrapped conv lives at ``.conv``."""

    def __init__(self, in_c, out_c, kernel, stride, bias, is_transposed=False):
        super().__init__()
        if is_transposed:
            self.conv = nn.ConvTranspose3d(
                in_c, out_c, kernel, stride, padding=0, bias=bias
            )
        else:
            self.conv = nn.Conv3d(
                in_c, out_c, kernel, stride, padding=(kernel - 1) // 2, bias=bias
            )

    def forward(self, x):
        return self.conv(x)


class UnetResBlock(nn.Module):
    def __init__(self, in_c, out_c, kernel=3, stride=1):
        super().__init__()
        self.conv1 = Convolution(in_c, out_c, kernel, stride, bias=False)
        self.conv2 = Convolution(out_c, out_c, kernel, 1, bias=False)
        self.lrelu = nn.LeakyReLU(negative_slope=0.01, inplace=True)
        self.norm1 = nn.InstanceNorm3d(out_c)
        self.norm2 = nn.InstanceNorm3d(out_c)
        self.downsample = (in_c != out_c) or (stride != 1)
        if self.downsample:
            self.conv3 = Convolution(in_c, out_c, 1, stride, bias=False)
            self.norm3 = nn.InstanceNorm3d(out_c)

    def forward(self, inp):
        residual = inp
        out = self.lrelu(self.norm1(self.conv1(inp)))
        out = self.norm2(self.conv2(out))
        if self.downsample:
            residual = self.norm3(self.conv3(residual))
        return self.lrelu(out + residual)


class UnetrBasicBlock(nn.Module):
    def __init__(self, in_c, out_c, kernel=3, stride=1):
        super().__init__()
        self.layer = UnetResBlock(in_c, out_c, kernel, stride)

    def forward(self, x):
        return self.layer(x)


class UnetrUpBlock(nn.Module):
    def __init__(self, in_c, out_c, kernel=3, upsample_kernel=2):
        super().__init__()
        self.transp_conv = Convolution(
            in_c, out_c, upsample_kernel, upsample_kernel, bias=False,
            is_transposed=True,
        )
        self.conv_block = UnetResBlock(out_c + out_c, out_c, kernel, 1)

    def forward(self, inp, skip):
        out = self.transp_conv(inp)
        out = torch.cat((out, skip), dim=1)
        return self.conv_block(out)


class UnetOutBlock(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv = Convolution(in_c, out_c, 1, 1, bias=True)

    def forward(self, x):
        return self.conv(x)


# ---------------------------------------------------------------------------
# full network
# ---------------------------------------------------------------------------

class MonaiSwinUNETR(nn.Module):
    """state_dict-compatible stand-in for monai.networks.nets.SwinUNETR."""

    def __init__(
        self,
        in_channels: int = 2,
        out_channels: int = 8,
        feature_size: int = 48,
        depths: Tuple[int, ...] = (2, 2, 2, 2),
        num_heads: Tuple[int, ...] = (3, 6, 12, 24),
        window_size: Tuple[int, int, int] = (7, 7, 7),
        merge_order: str = "monai_v1",
    ):
        super().__init__()
        fs = feature_size
        self.swinViT = SwinTransformer(
            in_channels, fs, window_size, depths, num_heads, merge_order
        )
        self.encoder1 = UnetrBasicBlock(in_channels, fs)
        self.encoder2 = UnetrBasicBlock(fs, fs)
        self.encoder3 = UnetrBasicBlock(2 * fs, 2 * fs)
        self.encoder4 = UnetrBasicBlock(4 * fs, 4 * fs)
        self.encoder10 = UnetrBasicBlock(16 * fs, 16 * fs)
        self.decoder5 = UnetrUpBlock(16 * fs, 8 * fs)
        self.decoder4 = UnetrUpBlock(8 * fs, 4 * fs)
        self.decoder3 = UnetrUpBlock(4 * fs, 2 * fs)
        self.decoder2 = UnetrUpBlock(2 * fs, fs)
        self.decoder1 = UnetrUpBlock(fs, fs)
        self.out = UnetOutBlock(fs, out_channels)

    def forward(self, x_in):  # x_in: [b, c, d, h, w]
        hidden = self.swinViT(x_in, normalize=True)
        enc0 = self.encoder1(x_in)
        enc1 = self.encoder2(hidden[0])
        enc2 = self.encoder3(hidden[1])
        enc3 = self.encoder4(hidden[2])
        dec4 = self.encoder10(hidden[4])
        dec3 = self.decoder5(dec4, hidden[3])
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        dec0 = self.decoder2(dec1, enc1)
        out = self.decoder1(dec0, enc0)
        return self.out(out)
