"""Import reference PyTorch checkpoints into this framework's params.

The reference saves ``{"model_state_dict": ...}`` torch checkpoints
(src/models/build.py:153-180). This module maps a reference ``UNet3D``
state_dict (unet.py:116-226) onto our flax parameter tree so trained
reference models run natively here — the bit-level Dice-parity path
(SURVEY.md §7 hard part d).

Weight layout conversions:
- Conv3d          ``[out, in, kh, kw, kd]`` → ``[kh, kw, kd, in, out]``
- ConvTranspose3d ``[in, out, kh, kw, kd]`` → ``[kh, kw, kd, in, out]``
  (flax ConvTranspose computes a fractionally-strided *correlation* while
  torch computes the gradient-of-conv — for stride=kernel (non-overlapping
  2×2×2) they coincide with the kernel spatially flipped)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # [out, in, kh, kw, kd] → [kh, kw, kd, in, out]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    # torch [in, out, kh, kw, kd] → flax [kh, kw, kd, in, out], spatially
    # flipped (torch convtranspose places w[..., di] at output offset di of
    # a correlation-style upsample only after a flip)
    w = np.transpose(w, (2, 3, 4, 0, 1))
    return np.ascontiguousarray(w[::-1, ::-1, ::-1])


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _convblock(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "Conv_0": {
            "kernel": _conv_kernel(_to_np(sd[f"{prefix}.conv1.weight"])),
            "bias": _to_np(sd[f"{prefix}.conv1.bias"]),
        },
        "Conv_1": {
            "kernel": _conv_kernel(_to_np(sd[f"{prefix}.conv2.weight"])),
            "bias": _to_np(sd[f"{prefix}.conv2.bias"]),
        },
    }


def from_torch_unet3d(state_dict: Mapping[str, Any], num_levels: int) -> Dict[str, Any]:
    """Reference UNet3D state_dict → our UNet3D params tree.

    ``num_levels`` = len(features); the reference has num_levels-1 encoder
    and decoder blocks (unet.py:152-159).
    """
    sd = {k.removeprefix("backbone."): v for k, v in state_dict.items()}

    params: Dict[str, Any] = {"init_conv": _convblock(sd, "init_conv")}
    for i in range(num_levels - 1):
        params[f"down{i}"] = {
            "ConvBlock3D_0": _convblock(sd, f"encoders.{i}.conv")
        }
    for j in range(num_levels - 1):
        params[f"up{j}"] = {
            "ConvTranspose_0": {
                "kernel": _conv_transpose_kernel(_to_np(sd[f"decoders.{j}.up.weight"])),
                "bias": _to_np(sd[f"decoders.{j}.up.bias"]),
            },
            "ConvBlock3D_0": _convblock(sd, f"decoders.{j}.conv"),
        }
    params["out_conv"] = {
        "kernel": _conv_kernel(_to_np(sd["out_conv.weight"])),
        "bias": _to_np(sd["out_conv.bias"]),
    }
    return params


def load_torch_checkpoint(path, num_levels: int) -> Dict[str, Any]:
    """Load a reference .pth checkpoint (tolerant of the reference's
    model_state_dict/state_dict/raw formats, build.py:140-146)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    return from_torch_unet3d(sd, num_levels)
