"""Dual/multi-encoder architecture with per-level fusion
(reference: src/models/backbones/dual_encoder.py:15-254).

One UNet-style encoder per modality; per-level fusion ∈
{concat(1×1 proj), add, attention (SE over modalities), cross_attention,
mean}; shared UNet decoder. The input ``[B, H, W, D, M]`` is split
channel-wise per modality (dual_encoder.py:127-144).

``cross_attention`` extends the reference's fusion vocabulary (its
DualEncoder only wires concat/add/attention even though the CLI offers
cross_attention — SURVEY.md §1): modality-0 features attend to the fused
other-modality features via the blockwise flash path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_organ_segmentation_tpu.models.layers import (
    ConvBlock3D,
    DownBlock3D,
    Dropout3D,
    UpBlock3D,
)
from multimodal_organ_segmentation_tpu.models.fusion import (
    AttentionFusion,
    BidirectionalCrossAttention,
    CrossAttentionFusion,
    SUVGuidedAttention,
)


class _Encoder(nn.Module):
    features: Sequence[int]
    norm: str
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> List[jax.Array]:
        feats = list(self.features)
        x = ConvBlock3D(feats[0], norm=self.norm, dtype=self.dtype, name="init_conv")(
            x, train
        )
        outs = [x]
        for i in range(len(feats) - 1):
            x, _ = DownBlock3D(
                feats[i + 1], norm=self.norm, dtype=self.dtype, name=f"down{i}"
            )(x, train)
            outs.append(x)
        return outs


class DualEncoder(nn.Module):
    """Separate encoder per modality + fused shared decoder."""

    num_modalities: int = 2
    out_channels: int = 8
    features: Sequence[int] = (32, 64, 128, 256, 512)
    norm: str = "instance"
    # concat, add, attention, cross_attention, bidirectional, suv_guided, mean
    fusion_type: str = "concat"
    dropout: float = 0.0
    cross_attn_heads: int = 4
    # channel index of the PET/SUV modality in the stacked input, used by
    # suv_guided fusion (reference: attention_fusion.py:219-295 takes the
    # raw SUV volume alongside the CT features)
    suv_channel: int = 1
    suv_threshold: float = 2.5
    dtype: Any = jnp.float32
    # explainability: grad-capture points at fused pyramid levels
    enable_perturb: bool = False
    # sequence parallelism: shard the voxel-token axis of cross attention
    # over this mesh axis (ring attention, SURVEY.md §2.10)
    sequence_axis: Optional[str] = None
    mesh: Any = None
    # voxel-token cross attention is O(N²) compute: at 128³ the full-res
    # level alone is ~5·10¹⁷ FLOPs per forward — unrunnable on ANY
    # hardware (the reference's CrossAttentionFusion would need 17 TB of
    # scores; it is exported but never wired there,
    # src/models/fusion/__init__.py:7). Pyramid levels with more than this
    # many tokens fall back to parameter-free additive fusion; quadratic
    # attention applies where it is affordable (e.g. 24³=13824 tokens at
    # level 2 of a 96³ grid). When ``sequence_axis``/``mesh`` are set the
    # effective budget is multiplied by the axis size — the K/V ring shards
    # both memory and the O(N²) compute, so a mesh pushes attention up the
    # pyramid (see _fuse).
    xattn_max_tokens: int = 16384
    # aux 1×1 heads on intermediate decoder stages (same contract as
    # UNet3D.deep_supervision; the trainer's loss wrapper applies the
    # 2^-k weights; inference output unchanged)
    deep_supervision: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        capture: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, Dict[str, Any]]]:
        feats = list(self.features)
        x = x.astype(self.dtype)

        all_encoder_features: List[List[jax.Array]] = []
        for mi in range(self.num_modalities):
            mod_input = x[..., mi : mi + 1]
            outs = _Encoder(feats, self.norm, self.dtype, name=f"encoder{mi}")(
                mod_input, train
            )
            all_encoder_features.append(outs)

        suv = x[..., self.suv_channel : self.suv_channel + 1]
        fused = self._fuse(all_encoder_features, suv, train)
        if self.enable_perturb:
            fused = [
                self.perturb(f"fused{i}", f) for i, f in enumerate(fused)
            ]

        y = fused[-1]
        skips = fused[:-1]
        aux_logits: List[jax.Array] = []
        for j, i in enumerate(range(len(feats) - 1, 0, -1)):
            y = UpBlock3D(
                features=feats[i - 1],
                up_features=feats[i] // 2,
                norm=self.norm,
                dtype=self.dtype,
                name=f"up{j}",
            )(y, skips[i - 1], train)
            if self.deep_supervision and i > 1:
                # params exist regardless of `train` (init tree == train
                # tree); unused inference results are DCE'd by XLA
                aux_logits.append(
                    nn.Conv(
                        self.out_channels, (1, 1, 1), dtype=jnp.float32,
                        name=f"ds_head{j}",
                    )(y.astype(jnp.float32))
                )

        y = Dropout3D(self.dropout)(y, train)
        logits = nn.Conv(
            self.out_channels, (1, 1, 1), dtype=jnp.float32, name="out_conv"
        )(y.astype(jnp.float32))

        if self.deep_supervision and train and aux_logits:
            from multimodal_organ_segmentation_tpu.ops.resize import resize_linear

            full = tuple(logits.shape[1:4])
            outs = [logits] + [
                resize_linear(a, full, (1, 2, 3)) for a in reversed(aux_logits)
            ]
            if capture:
                return outs, {
                    "encoder_features": all_encoder_features,
                    "fused_features": fused,
                }
            return outs

        if capture:
            return logits, {
                "encoder_features": all_encoder_features,
                "fused_features": fused,
            }
        return logits

    def _fuse(
        self, all_features: List[List[jax.Array]], suv: jax.Array, train: bool
    ) -> List[jax.Array]:
        num_levels = len(all_features[0])
        fused = []
        for level in range(num_levels):
            level_feats = [f[level] for f in all_features]
            if self.fusion_type == "concat":
                cat = jnp.concatenate(level_feats, axis=-1)
                f = nn.Conv(
                    level_feats[0].shape[-1],
                    (1, 1, 1),
                    dtype=self.dtype,
                    name=f"fusion_proj{level}",
                )(cat)
            elif self.fusion_type == "add":
                f = sum(level_feats)
            elif self.fusion_type == "attention":
                f = AttentionFusion(dtype=self.dtype, name=f"fusion_attn{level}")(
                    level_feats, train
                )
            elif self.fusion_type in ("cross_attention", "bidirectional"):
                others = (
                    level_feats[1]
                    if len(level_feats) == 2
                    else jnp.mean(jnp.stack(level_feats[1:], axis=0), axis=0)
                )
                _, fh, fw, fd, _ = level_feats[0].shape
                n_tok = fh * fw * fd
                # ring attention shards BOTH the token-axis memory and the
                # O(N²) compute by the sequence-axis size (each device does
                # its query shard against the rotating K/V ring), so a mesh
                # raises the affordable budget proportionally — sequence
                # parallelism pushes cross attention UP the pyramid rather
                # than merely re-running what one chip could already do.
                budget = self.xattn_max_tokens
                if self.sequence_axis is not None and self.mesh is not None:
                    size = dict(self.mesh.shape).get(self.sequence_axis, 1)
                    if size > 1 and n_tok % size == 0:
                        budget *= size
                if n_tok > budget:
                    # O(N²) budget exceeded at this grid: additive fusion
                    # (see xattn_max_tokens)
                    f = level_feats[0] + others
                elif self.fusion_type == "cross_attention":
                    f = CrossAttentionFusion(
                        num_heads=self.cross_attn_heads,
                        dtype=self.dtype,
                        sequence_axis=self.sequence_axis,
                        mesh=self.mesh,
                        name=f"fusion_xattn{level}",
                    )(level_feats[0], others, train)
                else:
                    f = BidirectionalCrossAttention(
                        num_heads=self.cross_attn_heads,
                        dtype=self.dtype,
                        sequence_axis=self.sequence_axis,
                        mesh=self.mesh,
                        name=f"fusion_bixattn{level}",
                    )(level_feats[0], others, train)
            elif self.fusion_type == "suv_guided":
                # gate the primary-modality (CT) features by the raw SUV
                # volume; add the other modalities' features back in so
                # their encoders still contribute
                base = level_feats[0]
                if len(level_feats) > 1:
                    base = base + jnp.mean(
                        jnp.stack(level_feats[1:], axis=0), axis=0
                    )
                f = SUVGuidedAttention(
                    suv_threshold=self.suv_threshold,
                    dtype=self.dtype,
                    name=f"fusion_suv{level}",
                )(base, suv, train)
            else:  # mean
                f = jnp.mean(jnp.stack(level_feats, axis=0), axis=0)
            fused.append(f)
        return fused

    @property
    def encoder_channels(self) -> List[int]:
        return list(self.features)


def build_dual_encoder(config, dtype=jnp.float32) -> DualEncoder:
    """Factory from config (reference: dual_encoder.py:257-280)."""
    backbone = config.get("model.backbone", {}) or {}
    fusion = config.get("model.fusion", {}) or {}
    num_modalities = len(config.get("data.modalities", ["CT", "PET"]))
    ftype = str(fusion.get("type", "concat"))
    # map the CLI vocabulary onto DualEncoder's internal fusion set
    if ftype in ("early", "late"):
        ftype = "concat"
    modalities = [str(m).upper() for m in config.get("data.modalities", ["CT", "PET"])]
    suv_channel = modalities.index("PET") if "PET" in modalities else min(
        1, num_modalities - 1
    )
    # sequence parallelism: ring attention over parallel.sequence_axis
    sequence_axis = config.get("parallel.sequence_axis", None)
    mesh = None
    if sequence_axis:
        from multimodal_organ_segmentation_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(config)
        if dict(mesh.shape).get(str(sequence_axis), 1) <= 1:
            sequence_axis, mesh = None, None
    return DualEncoder(
        num_modalities=num_modalities,
        out_channels=int(config.get("model.out_channels", 8)),
        features=tuple(backbone.get("features", [32, 64, 128, 256, 512])),
        norm=str(backbone.get("norm", "instance")),
        fusion_type=ftype,
        dropout=float(config.get("model.head.dropout", 0.0) or 0.0),
        suv_channel=suv_channel,
        suv_threshold=float(fusion.get("suv_threshold", 2.5)),
        dtype=dtype,
        enable_perturb=bool(config.get("model.enable_perturb", False)),
        sequence_axis=str(sequence_axis) if sequence_axis else None,
        mesh=mesh,
        xattn_max_tokens=int(fusion.get("max_tokens", 16384)),
        deep_supervision=(
            str(config.get("model.head.type", "conv")) == "deep_supervision"
        ),
    )
