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

from typing import Any, Dict, Mapping, Optional, Tuple

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


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.Linear ``[out, in]`` → flax Dense kernel ``[in, out]``."""
    out = {"kernel": np.ascontiguousarray(_to_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _to_np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "scale": _to_np(sd[f"{prefix}.weight"]),
        "bias": _to_np(sd[f"{prefix}.bias"]),
    }


def _bias_or_zeros(sd: Mapping[str, Any], key: str, n: int) -> np.ndarray:
    """MONAI UnetResBlock convs are bias-free; flax convs carry a bias."""
    return _to_np(sd[key]) if key in sd else np.zeros((n,), np.float32)


def _interp_linear_axis(a: np.ndarray, coords: np.ndarray, axis: int) -> np.ndarray:
    """1-D linear interpolation of ``a`` at fractional ``coords`` along
    ``axis`` (separable building block of the trilinear resample below)."""
    i0 = np.clip(np.floor(coords).astype(np.int64), 0, a.shape[axis] - 1)
    i1 = np.minimum(i0 + 1, a.shape[axis] - 1)
    frac = coords - np.floor(coords)
    shape = [1] * a.ndim
    shape[axis] = -1
    w = frac.reshape(shape)
    return np.take(a, i0, axis) * (1.0 - w) + np.take(a, i1, axis) * w


def resample_rel_pos_bias(
    table: np.ndarray,
    src_window: Tuple[int, int, int],
    dst_window: Tuple[int, int, int],
) -> np.ndarray:
    """Window-size transfer for Swin relative-position-bias tables.

    ``table`` is ``[(2sh-1)(2sw-1)(2sd-1), heads]`` — a per-head bias over
    the 3-D relative-displacement grid ``[-(w-1), w-1]³``. Transferring a
    checkpoint trained at one window size (MONAI's 7³ default,
    /root/reference/src/models/backbones/swin_unetr.py:30-35) to another
    (e.g. the 6³ perf window that divides every stage of a 96³ ROI with
    zero padding) resamples that grid trilinearly with the displacement
    axes scaled proportionally: target displacement ``d`` reads the source
    at ``d · (ws-1)/(wt-1)`` — the Swin window-transfer technique
    (bias-table interpolation over the normalized displacement grid).
    Nothing else in a SwinUNETR checkpoint is window-shaped.
    """
    sh = tuple(2 * int(w) - 1 for w in src_window)
    dh = tuple(2 * int(w) - 1 for w in dst_window)
    heads = table.shape[-1]
    if table.shape[0] != int(np.prod(sh)):
        raise ValueError(
            f"rel-pos-bias table has {table.shape[0]} rows; window "
            f"{tuple(src_window)} implies {int(np.prod(sh))}"
        )
    if sh == dh:
        return table
    grid = np.asarray(table, np.float64).reshape(*sh, heads)
    for axis in range(3):
        s, d = src_window[axis], dst_window[axis]
        if d > 1:
            # displacement −(d−1)..(d−1) → source units, then +center offset
            disp = np.arange(dh[axis], dtype=np.float64) - (d - 1)
            coords = disp * (s - 1) / (d - 1) + (s - 1)
        else:
            coords = np.array([float(s - 1)])  # center (zero displacement)
        grid = _interp_linear_axis(grid, coords, axis)
    return np.ascontiguousarray(
        grid.reshape(-1, heads).astype(table.dtype, copy=False)
    )


def _infer_cubic_window(table_rows: int) -> Tuple[int, int, int]:
    """Source window of a checkpoint bias table, assuming cubic windows
    (the only kind the reference ever constructs — MONAI default 7³)."""
    side = round(table_rows ** (1.0 / 3.0))
    for cand in (side - 1, side, side + 1):
        if cand > 0 and cand % 2 == 1 and cand**3 == table_rows:
            w = (cand + 1) // 2
            return (w, w, w)
    raise ValueError(
        f"cannot infer a cubic source window from a {table_rows}-row "
        "rel-pos-bias table; pass src_window explicitly"
    )


def _unetr_res_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """MONAI UnetResBlock (dynunet_block.py) → our _UnetrResBlock params.

    conv1/conv2 → Conv_0/Conv_1; the 1×1 shortcut conv3 (present when
    in_channels != out_channels) → Conv_2. Instance norms are affine-free
    on both sides (no params).
    """
    out: Dict[str, Any] = {}
    for torch_name, flax_name in (
        ("conv1", "Conv_0"),
        ("conv2", "Conv_1"),
        ("conv3", "Conv_2"),
    ):
        wkey = f"{prefix}.{torch_name}.conv.weight"
        if wkey not in sd:
            continue
        w = _conv_kernel(_to_np(sd[wkey]))
        out[flax_name] = {
            "kernel": w,
            "bias": _bias_or_zeros(sd, f"{prefix}.{torch_name}.conv.bias", w.shape[-1]),
        }
    return out


def from_torch_swin_unetr(
    state_dict: Mapping[str, Any],
    depths=(2, 2, 2, 2),
    target_window: Optional[Tuple[int, int, int]] = None,
    src_window: Optional[Tuple[int, int, int]] = None,
) -> Dict[str, Any]:
    """MONAI SwinUNETR state_dict → our ``SwinUNETR(monai_compat=True)``
    params tree.

    The reference builds ``monai.networks.nets.SwinUNETR``
    (src/models/backbones/swin_unetr.py:80-96) and saves it through
    ``save_checkpoint`` (src/models/build.py:153-180), so its checkpoints
    carry MONAI's key names (``swinViT.layers{i}.0.blocks.{j}...``,
    ``encoder{1,2,3,4,10}.layer...``, ``decoder{5..1}...``, ``out.conv``).
    Wrapper prefixes (the reference's ``model.`` and our ``backbone.``) are
    stripped.

    Layout conversions: Linear → Dense transpose, Conv3d/ConvTranspose3d as
    in the UNet3D import above; the relative-position-bias table and index
    orderings coincide (same (2w-1)³ factorization on both sides).
    Target the same ``merge_order`` the checkpoint was trained with
    (``"monai_v1"`` for MONAI's default ``downsample="merging"``).

    ``target_window``: when the target config's ``window_size`` differs
    from the checkpoint's, every relative-position-bias table is
    trilinearly resampled onto the new displacement grid
    (:func:`resample_rel_pos_bias`) — this is what lets a 7³-trained
    reference checkpoint serve under the 6³ zero-padding perf window.
    ``src_window`` is inferred from the table row count (cubic) unless
    given.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("backbone.")
        k = k.removeprefix("model.")
        sd[k] = v

    params: Dict[str, Any] = {}
    # --- swin transformer encoder ---
    pe = _conv_kernel(_to_np(sd["swinViT.patch_embed.proj.weight"]))
    params["patch_embed"] = {
        "kernel": pe,
        "bias": _bias_or_zeros(sd, "swinViT.patch_embed.proj.bias", pe.shape[-1]),
    }
    for s in range(4):
        layer = f"swinViT.layers{s + 1}.0"
        for b in range(depths[s]):
            blk = f"{layer}.blocks.{b}"
            table = _to_np(sd[f"{blk}.attn.relative_position_bias_table"])
            if target_window is not None:
                src = src_window or _infer_cubic_window(table.shape[0])
                table = resample_rel_pos_bias(table, src, tuple(target_window))
            params[f"stage{s}_block{b}"] = {
                "norm1": _layernorm(sd, f"{blk}.norm1"),
                "attn": {
                    "qkv": _dense(sd, f"{blk}.attn.qkv"),
                    "rel_pos_bias": table,
                    "proj": _dense(sd, f"{blk}.attn.proj"),
                },
                "norm2": _layernorm(sd, f"{blk}.norm2"),
                "mlp_fc1": _dense(sd, f"{blk}.mlp.linear1"),
                "mlp_fc2": _dense(sd, f"{blk}.mlp.linear2"),
            }
        params[f"merge{s}"] = {
            "LayerNorm_0": _layernorm(sd, f"{layer}.downsample.norm"),
            "Dense_0": _dense(sd, f"{layer}.downsample.reduction"),
        }
    # --- UNETR decoder (MONAI encoder1..4/10 → our encoder0..3/10) ---
    for ours, monai in (
        ("encoder0", "encoder1"),
        ("encoder1", "encoder2"),
        ("encoder2", "encoder3"),
        ("encoder3", "encoder4"),
        ("encoder10", "encoder10"),
    ):
        params[ours] = _unetr_res_block(sd, f"{monai}.layer")
    for n in range(5, 0, -1):
        w = _conv_transpose_kernel(_to_np(sd[f"decoder{n}.transp_conv.conv.weight"]))
        params[f"decoder{n}"] = {
            "ConvTranspose_0": {
                "kernel": w,
                "bias": _bias_or_zeros(
                    sd, f"decoder{n}.transp_conv.conv.bias", w.shape[-1]
                ),
            },
            "_UnetrResBlock_0": _unetr_res_block(sd, f"decoder{n}.conv_block"),
        }
    out_w = _conv_kernel(_to_np(sd["out.conv.conv.weight"]))
    params["out_conv"] = {
        "kernel": out_w,
        "bias": _bias_or_zeros(sd, "out.conv.conv.bias", out_w.shape[-1]),
    }
    return params


def from_torch_dual_encoder(
    state_dict: Mapping[str, Any],
    num_levels: int,
    num_modalities: int = 2,
    fusion_type: str = "concat",
) -> Dict[str, Any]:
    """Reference DualEncoder state_dict → our DualEncoder params tree.

    Maps the reference's per-modality encoders (dual_encoder.py:86-103:
    ``encoders.{m}.init_conv`` + ``encoders.{m}.blocks.{i}``), shared
    decoder (``decoder.{j}`` — deepest level first on both sides), 1×1
    ``out_conv``, and the fusion parameters: ``concat`` → per-level 1×1
    projection convs (dual_encoder.py:72-79), ``attention`` → the
    CrossModalAttention SE MLP (dual_encoder.py:226-233; Sequential
    indices 2 and 4 are its two Linear layers). ``add`` has no params.
    Instance norms are affine-free on both sides.
    """
    sd = {k.removeprefix("backbone."): v for k, v in state_dict.items()}

    params: Dict[str, Any] = {}
    for m in range(num_modalities):
        enc: Dict[str, Any] = {
            "init_conv": _convblock(sd, f"encoders.{m}.init_conv")
        }
        for i in range(num_levels - 1):
            enc[f"down{i}"] = {
                "ConvBlock3D_0": _convblock(sd, f"encoders.{m}.blocks.{i}.conv")
            }
        params[f"encoder{m}"] = enc
    for j in range(num_levels - 1):
        params[f"up{j}"] = {
            "ConvTranspose_0": {
                "kernel": _conv_transpose_kernel(_to_np(sd[f"decoder.{j}.up.weight"])),
                "bias": _to_np(sd[f"decoder.{j}.up.bias"]),
            },
            "ConvBlock3D_0": _convblock(sd, f"decoder.{j}.conv"),
        }
    params["out_conv"] = {
        "kernel": _conv_kernel(_to_np(sd["out_conv.weight"])),
        "bias": _to_np(sd["out_conv.bias"]),
    }
    if fusion_type == "concat":
        for lv in range(num_levels):
            params[f"fusion_proj{lv}"] = {
                "kernel": _conv_kernel(_to_np(sd[f"fusion_proj.{lv}.weight"])),
                "bias": _to_np(sd[f"fusion_proj.{lv}.bias"]),
            }
    elif fusion_type == "attention":
        for lv in range(num_levels):
            params[f"fusion_attn{lv}"] = {
                "Dense_0": _dense(sd, f"fusion_layers.{lv}.attention.2"),
                "Dense_1": _dense(sd, f"fusion_layers.{lv}.attention.4"),
            }
    return params


def _load_state_dict(path) -> Dict[str, Any]:
    """Load a reference .pth checkpoint (tolerant of the reference's
    model_state_dict/state_dict/raw formats, build.py:140-146)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def load_torch_checkpoint(path, num_levels: int) -> Dict[str, Any]:
    return from_torch_unet3d(_load_state_dict(path), num_levels)


def import_torch_checkpoint(path, config) -> Dict[str, Any]:
    """Reference ``load_pretrained`` analog (build.py:66-69), config-driven:
    load a reference .pth and map it onto this config's model — returned
    params are nested under ``backbone`` to match
    ``MultiModalSegmentationModel``'s tree.

    Dispatch mirrors the reference model registry: unet3d → UNet3D mapping,
    swin_unetr → MONAI SwinUNETR mapping (requires
    ``model.backbone.monai_compat: true`` so the flax graph reproduces the
    checkpoint's wiring exactly), dual_encoder → per-modality encoders +
    fusion. ``attention_unet`` has no reference implementation to import
    from (its registry never built one, build.py:16-21).
    """
    sd = _load_state_dict(path)
    name = str(config.get("model.name", "swin_unetr")).lower()  # build.py default
    backbone = config.get("model.backbone", {}) or {}
    if hasattr(backbone, "to_dict"):
        backbone = backbone.to_dict()

    if name in ("unet", "unet3d"):
        # default mirrors build_unet3d / reference unet.py:127
        feats = list(backbone.get("features", [32, 64, 128, 256, 512]))
        params = from_torch_unet3d(sd, num_levels=len(feats))
    elif name == "swin_unetr":
        if not bool(backbone.get("monai_compat", False)):
            raise ValueError(
                "importing a reference SwinUNETR .pth requires "
                "model.backbone.monai_compat: true (the checkpoint encodes "
                "MONAI's graph wiring — post-merge taps, v1 merge order, "
                "constructor-window bias tables)"
            )
        params = from_torch_swin_unetr(
            sd,
            depths=tuple(backbone.get("depths", [2, 2, 2, 2])),
            # resample bias tables when the target window differs from the
            # checkpoint's (no-op when they match) — unlocks the 6³ perf
            # window for 7³-trained reference checkpoints
            target_window=tuple(backbone.get("window_size", [7, 7, 7])),
        )
    elif name == "dual_encoder":
        fusion = config.get("model.fusion", {}) or {}
        ftype = str(
            fusion.get("type", "concat") if hasattr(fusion, "get") else "concat"
        ).lower()
        if ftype in ("early", "late"):
            ftype = "concat"
        if ftype not in ("concat", "add", "attention"):
            raise ValueError(
                f"the reference DualEncoder only ever wires concat/add/"
                f"attention fusion (dual_encoder.py:63-79) — there is no "
                f"reference checkpoint to import for fusion type {ftype!r}"
            )
        feats = list(backbone.get("features", [32, 64, 128, 256, 512]))
        params = from_torch_dual_encoder(
            sd,
            num_levels=len(feats),
            num_modalities=len(config.get("data.modalities", ["CT", "PET"])),
            fusion_type=ftype,
        )
    else:
        raise ValueError(
            f"no reference torch-checkpoint mapping for model.name={name!r}"
        )
    return {"backbone": params}
