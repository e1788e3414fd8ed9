"""Attention-map visualization (reference: src/explainability/attention.py).

Captures attention tensors sown into the ``intermediates`` collection
(WindowAttention probs, AttentionFusion modality weights) — the JAX
replacement for the reference's name-matching forward hooks
(attention.py:41-43) — reduces them to spatial saliency maps, and renders
3-plane (axial/coronal/sagittal) heatmap figures (attention.py:138-156)
plus an all-heads grid (attention.py:166-215).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.ops.resize import resize_linear


class AttentionVisualizer:
    """Collects and renders attention maps."""

    def __init__(self, model, variables: Dict[str, Any]):
        self.model = model
        self.variables = {"params": variables["params"]}

    def capture(self, x) -> Dict[str, np.ndarray]:
        """Run a forward pass collecting all sown attention tensors."""
        _, state = self.model.apply(
            self.variables, jnp.asarray(x), train=False, mutable=["intermediates"]
        )
        flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
        out = {}
        for path, value in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            out[name] = np.asarray(value)
        return out

    @staticmethod
    def attention_rollout(attn: np.ndarray) -> np.ndarray:
        """[B', heads, N, N] window attention → per-token saliency [B', N]:
        mean over heads of attention received (column mean)."""
        return attn.mean(axis=1).mean(axis=1)

    def _window_grid(
        self, nw: int, spatial: Tuple[int, int, int]
    ) -> Optional[Tuple[int, int, int]]:
        """Per-axis window counts ``(nw_h, nw_w, nw_d)`` with product ``nw``.

        Derived from the model's ``window_size`` and the input spatial dims
        across candidate downsample factors (patch embed /2, then stage
        strides), so an ANISOTROPIC grid whose product happens to be a
        perfect cube (e.g. 2·4·8 = 64) is arranged on the correct axes
        instead of being scrambled by a cube-root reshape (r4 ADVICE).
        Falls back to a cube grid when the model exposes no window size.
        """
        ws = getattr(self.model, "window_size", None)
        if ws is not None:
            ws = tuple(int(w) for w in ws)
            for k in range(1, 7):  # /2 (patch embed) … /64
                dims = [max(1, -(-int(s) // (2**k))) for s in spatial]
                cnt = tuple(-(-d // w) for d, w in zip(dims, ws))
                if cnt[0] * cnt[1] * cnt[2] == nw:
                    return cnt
        side = round(nw ** (1 / 3))
        return (side, side, side) if side**3 == nw else None

    def spatial_map(
        self,
        attn: np.ndarray,
        volume_shape: Tuple[int, int, int],
    ) -> Optional[np.ndarray]:
        """Fold window-token saliency back to a coarse spatial volume.

        The reference probes /4, /8, /16 grids to reshape sequences
        (attention.py:104-113); here window attention gives [B·nW, h, N, N]
        with N = window volume — we reduce to per-window saliency and
        arrange windows on their grid, then resize to ``volume_shape``.
        """
        if attn.ndim != 4:
            return None
        saliency = self.attention_rollout(attn)  # [B·nW, N]
        per_window = saliency.mean(axis=1)  # [B·nW]
        n = per_window.shape[0]
        counts = self._window_grid(n, tuple(volume_shape))
        if counts is None:
            return None
        grid = per_window.reshape(counts)
        vol = resize_linear(jnp.asarray(grid), tuple(volume_shape), (0, 1, 2))
        vol = np.asarray(vol)
        lo, hi = vol.min(), vol.max()
        return (vol - lo) / (hi - lo + 1e-8)

    # ---- native-grid saliency through the sliding window ----

    def _tile_saliency(self, params, patches, max_layers: int) -> jax.Array:
        """Per-tile attention saliency volumes [n, rh, rw, rd, L].

        Mirrors :meth:`spatial_map` per tile — per-window attention-received
        saliency arranged on the window grid, trilinearly resized to the
        tile grid — but UNnormalized so all tiles share one global minmax
        after Gaussian blending (normalizing per tile would seam).
        """
        n = patches.shape[0]
        roi = patches.shape[1:4]
        _, state = self.model.apply(
            {"params": params}, patches, train=False, mutable=["intermediates"]
        )
        flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
        vols = []
        for path, attn in flat:
            if len(vols) >= max_layers:
                break
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "attn_probs" not in name or attn.ndim != 4:
                continue
            nw = attn.shape[0] // n
            counts = self._window_grid(nw, roi)
            if counts is None:
                continue
            # [n·nW, h, N, N] → attention received per token → per window
            sal = attn.astype(jnp.float32).mean(axis=(1, 2))  # [n·nW, N]
            per_window = sal.mean(axis=1).reshape(n, *counts)
            vols.append(resize_linear(per_window, roi, spatial_axes=(1, 2, 3)))
        if not vols:
            raise ValueError("no foldable attn_probs tensors (window grid unresolvable)")
        return jnp.stack(vols, axis=-1)  # [n, rh, rw, rd, L]

    def saliency_native(
        self,
        volume,
        *,
        roi_size: Tuple[int, int, int],
        overlap: float = 0.5,
        sw_batch_size: int = 4,
        mode: str = "gaussian",
        max_layers: int = 4,
    ) -> List[np.ndarray]:
        """Native-grid attention saliency volumes via sliding-window
        blending (same tile grid + Gaussian map as logits inference).
        Returns up to ``max_layers`` minmax-normalized ``[H, W, D]`` maps.
        """
        from functools import partial

        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            sliding_window_inference,
        )

        cache = getattr(self, "_tile_fn_cache", None)
        if cache is None:
            cache = self._tile_fn_cache = {}
        tile_fn = cache.get(max_layers)
        if tile_fn is None:
            tile_fn = cache[max_layers] = partial(
                self._tile_saliency, max_layers=max_layers
            )

        # count foldable layers with one abstract trace (no FLOPs)
        probe = jax.eval_shape(
            lambda p, x: tile_fn(p, x),
            self.variables["params"],
            jax.ShapeDtypeStruct((1, *roi_size, int(np.asarray(volume).shape[-1])), jnp.float32),
        )
        n_layers = probe.shape[-1]

        blended = sliding_window_inference(
            jnp.asarray(volume),
            tile_fn,
            roi_size=tuple(roi_size),
            num_classes=n_layers,
            overlap=overlap,
            sw_batch_size=sw_batch_size,
            mode=mode,
            params=self.variables["params"],
        )
        out = []
        for li in range(n_layers):
            v = blended[..., li]
            lo, hi = jnp.min(v), jnp.max(v)
            out.append(np.asarray((v - lo) / (hi - lo + 1e-8)))
        return out

    def visualize(
        self,
        x,
        output_dir,
        max_layers: int = 4,
    ) -> List[str]:
        """Write 3-plane heatmaps for up to ``max_layers`` attention maps."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        x = np.asarray(x)
        vol_shape = x.shape[1:4]
        captured = self.capture(x)

        written = []
        count = 0
        for name, attn in captured.items():
            if count >= max_layers:
                break
            if "attn_probs" not in name:
                continue
            spatial = self.spatial_map(attn, vol_shape)
            if spatial is None:
                continue
            img = x[0, ..., 0]
            fig, axes = plt.subplots(1, 3, figsize=(15, 5))
            for ax, axis_idx, title in zip(axes, (2, 1, 0), ("axial", "coronal", "sagittal")):
                mid = img.shape[axis_idx] // 2
                ax.imshow(np.take(img, mid, axis=axis_idx).T, cmap="gray", origin="lower")
                ax.imshow(
                    np.take(spatial, mid, axis=axis_idx).T,
                    cmap="jet", alpha=0.4, origin="lower",
                )
                ax.set_title(f"{title}")
                ax.axis("off")
            safe = name.replace("/", "_")[:80]
            out = output_dir / f"attention_{count}_{safe}.png"
            fig.suptitle(name, fontsize=8)
            fig.tight_layout()
            fig.savefig(out, dpi=100)
            plt.close(fig)
            written.append(str(out))
            count += 1

        # all-heads grid for the first attention tensor
        first = next((a for n, a in captured.items() if "attn_probs" in n), None)
        if first is not None and first.ndim == 4:
            heads = first.shape[1]
            cols = min(heads, 4)
            rows = (heads + cols - 1) // cols
            fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows))
            axes = np.atleast_1d(axes).ravel()
            for h in range(heads):
                axes[h].imshow(first[0, h], cmap="viridis")
                axes[h].set_title(f"head {h}")
                axes[h].axis("off")
            for ax in axes[heads:]:
                ax.axis("off")
            out = output_dir / "attention_heads_grid.png"
            fig.tight_layout()
            fig.savefig(out, dpi=100)
            plt.close(fig)
            written.append(str(out))
        return written
