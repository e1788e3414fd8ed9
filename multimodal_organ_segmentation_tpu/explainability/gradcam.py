"""GradCAM / GradCAM++ via flax perturbations
(reference: src/explainability/gradcam.py:13-287).

Semantics preserved: the segmentation score is
``output[0, ..., class].max()`` (gradcam.py:101-106); weights are the
spatial GAP of the gradient; cam = ReLU(Σ_c w_c·A_c), trilinearly resized
to the input grid and minmax-normalized (gradcam.py:109-145).
GradCAM++: α = g² / (2g² + ΣA·g³), w = Σ α·ReLU(g) (gradcam.py:148-247).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.ops.resize import resize_linear


class GradCAM:
    """Class-activation maps from capture features + perturbation grads.

    ``model`` must be built with ``enable_perturb=True``; layer names are
    the perturbation names (e.g. "feat3" for UNet3D, "stage3" for
    SwinUNETR, "fused4" for DualEncoder).
    """

    def __init__(self, model, variables: Dict[str, Any], target_layers: List[str]):
        self.model = model
        self.params = variables["params"]
        self.perturbations = jax.tree_util.tree_map(
            jnp.zeros_like, variables.get("perturbations", {})
        )
        if not self.perturbations:
            raise ValueError(
                "model has no perturbation points; build it with enable_perturb=True"
            )
        self.target_layers = list(target_layers)
        missing = [t for t in self.target_layers if not self._find(t)]
        if missing:
            raise ValueError(
                f"target layers {missing} not in perturbation points "
                f"{list(self._flat_names())}"
            )
        self._grad_fn = jax.jit(
            jax.value_and_grad(self._score, has_aux=True), static_argnums=(3,)
        )

    def _flat_names(self):
        flat = jax.tree_util.tree_flatten_with_path(self.perturbations)[0]
        return ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat]

    def _find(self, name: str) -> bool:
        return self._match(self._flat_names(), name) is not None

    @staticmethod
    def _match(names, target: str) -> Optional[str]:
        """Bind ``target`` to exactly one path by EXACT leaf-name equality.

        Substring matching silently bound the wrong layer when one
        perturbation name prefixed another ("feat1" vs "feat10") — r4
        ADVICE. Ambiguity raises instead of taking the first hit.
        """
        leaf = target.split("/")[-1]
        hits = [nm for nm in names if nm.split("/")[-1] == leaf]
        if len(hits) > 1:
            raise ValueError(
                f"target layer {target!r} is ambiguous: matches {sorted(hits)}"
            )
        return hits[0] if hits else None

    def _score(self, perts, x, params, class_idx: int):
        variables = {"params": params, "perturbations": perts}
        out = self.model.apply(variables, x, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        score = jnp.max(logits[0, ..., class_idx])
        # activations = perturbed values reconstructed: activation + 0
        return score, logits

    def _activations(self, x) -> Dict[str, jax.Array]:
        variables = {"params": self.params}
        logits, feats = self.model.apply(variables, x, train=False, capture=True)
        flat = {}
        if isinstance(feats, dict):  # DualEncoder capture dict
            for i, f in enumerate(feats.get("fused_features", [])):
                flat[f"fused{i}"] = f
        else:
            for i, f in enumerate(feats):
                flat[f"feat{i}"] = f
                flat[f"stage{i}"] = f
        return flat

    def _gradients(self, x, class_idx: int) -> Dict[str, jax.Array]:
        (score, logits), grads = self._grad_fn(
            self.perturbations, x, self.params, class_idx
        )
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        return {
            "/".join(str(getattr(k, "key", k)) for k in path): g for path, g in flat
        }

    def _weights(self, grad: jax.Array) -> jax.Array:
        # GAP over spatial dims → per-channel weight; grad [B, H, W, D, C]
        return jnp.mean(grad, axis=(1, 2, 3))

    def generate(
        self, x, class_idx: int = 1
    ) -> Dict[str, np.ndarray]:
        """Per-target-layer CAM volumes matching the input grid."""
        x = jnp.asarray(x)
        acts = self._activations(x)
        grads = self._gradients(x, class_idx)
        cams = {}
        for target in self.target_layers:
            gname = self._match(grads, target)
            # activations are keyed by the short perturbation name
            # ("feat1"), grads by the full path ("backbone/feat1")
            short = target.split("/")[-1]
            act = acts.get(short, acts.get(target))
            if gname is None or act is None:
                continue
            grad = grads[gname]
            w = self._weights_from(grad, act)  # [B, C]
            cam = jnp.einsum("bhwdc,bc->bhwd", act.astype(jnp.float32), w)
            cam = jnp.maximum(cam, 0.0)
            cam = resize_linear(cam, x.shape[1:4], spatial_axes=(1, 2, 3))
            lo, hi = jnp.min(cam), jnp.max(cam)
            cam = (cam - lo) / (hi - lo + 1e-8)
            cams[target] = np.asarray(cam[0])
        return cams

    def _weights_from(self, grad: jax.Array, act: jax.Array) -> jax.Array:
        return self._weights(grad.astype(jnp.float32))

    # ---- native-grid CAM through the sliding window ----

    def _tile_cams(self, params, patches, class_idx: int) -> jax.Array:
        """Per-tile UNnormalized CAMs for every target layer.

        ``patches`` [n, rh, rw, rd, C] → [n, rh, rw, rd, L]. Normalization
        must NOT happen here: tiles share one global minmax after blending,
        exactly like logits share one argmax. The per-tile score is the
        reference's ``max`` over the tile's class logit (gradcam.py:101-106)
        summed over tiles — each tile's activations only touch its own
        score, so the batched perturbation grad is the per-tile grad.
        """
        n = patches.shape[0]
        # batch-n zero perturbations (the stored ones were init'd at B=1;
        # perturbation tensors are batch-leading zeros_like(activation))
        perts_n = jax.tree_util.tree_map(
            lambda p: jnp.zeros((n,) + p.shape[1:], p.dtype), self.perturbations
        )

        logits, feats = self.model.apply(
            {"params": params}, patches, train=False, capture=True
        )
        acts = {}
        if isinstance(feats, dict):
            for i, f in enumerate(feats.get("fused_features", [])):
                acts[f"fused{i}"] = f
        else:
            for i, f in enumerate(feats):
                acts[f"feat{i}"] = f
                acts[f"stage{i}"] = f

        def score_fn(perts):
            out = self.model.apply(
                {"params": params, "perturbations": perts},
                patches, train=False,
            )
            lg = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(jnp.max(lg[..., class_idx], axis=(1, 2, 3)))

        grad_tree = jax.grad(score_fn)(perts_n)
        flat = jax.tree_util.tree_flatten_with_path(grad_tree)[0]
        grads = {
            "/".join(str(getattr(k, "key", k)) for k in path): g
            for path, g in flat
        }

        roi = patches.shape[1:4]
        cams = []
        for target in self.target_layers:
            gname = self._match(grads, target)
            short = target.split("/")[-1]
            act = acts.get(short, acts.get(target))
            if gname is None or act is None:
                raise ValueError(
                    f"target layer {target!r} not found among activations "
                    f"{sorted(acts)} / grads {sorted(grads)}"
                )
            w = self._weights_from(grads[gname], act)  # [n, C]
            cam = jnp.einsum("bhwdc,bc->bhwd", act.astype(jnp.float32), w)
            cam = jnp.maximum(cam, 0.0)
            cam = resize_linear(cam, roi, spatial_axes=(1, 2, 3))
            cams.append(cam)
        return jnp.stack(cams, axis=-1)  # [n, rh, rw, rd, L]

    def generate_native(
        self,
        volume,
        class_idx: int = 1,
        *,
        roi_size: Tuple[int, int, int],
        overlap: float = 0.5,
        sw_batch_size: int = 4,
        mode: str = "gaussian",
    ) -> Dict[str, np.ndarray]:
        """CAMs on the NATIVE volume grid via sliding-window blending.

        Tiles the volume exactly like logits inference (same grid, same
        Gaussian importance map — ops/sliding_window.py), computes each
        tile's unnormalized CAM, blends, then minmax-normalizes globally.
        On a volume ≤ roi_size this reduces to one tile and equals
        :meth:`generate` on the (padded) whole volume. Reference semantics
        preserved per tile: src/explainability/gradcam.py:109-145.

        Args:
            volume: ``[H, W, D, C]`` native-grid multi-channel image.
        Returns:
            {target_layer: [H, W, D] normalized cam} on the native grid.
        """
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            sliding_window_inference,
        )

        # cache the per-class tile fn: sliding_window_inference treats
        # predict_fn as a static jit arg (hashed by identity for partials),
        # so a fresh partial per call would recompile per case
        cache = getattr(self, "_tile_fn_cache", None)
        if cache is None:
            cache = self._tile_fn_cache = {}
        tile_fn = cache.get(class_idx)
        if tile_fn is None:
            tile_fn = cache[class_idx] = partial(
                self._tile_cams, class_idx=class_idx
            )

        n_layers = len(self.target_layers)
        blended = sliding_window_inference(
            jnp.asarray(volume),
            tile_fn,
            roi_size=tuple(roi_size),
            num_classes=n_layers,
            overlap=overlap,
            sw_batch_size=sw_batch_size,
            mode=mode,
            params=self.params,
        )  # [H, W, D, L]
        out = {}
        for li, target in enumerate(self.target_layers):
            cam = blended[..., li]
            lo, hi = jnp.min(cam), jnp.max(cam)
            out[target] = np.asarray((cam - lo) / (hi - lo + 1e-8))
        return out


class GradCAMPlusPlus(GradCAM):
    """GradCAM++ weighting."""

    def _weights_from(self, grad: jax.Array, act: jax.Array) -> jax.Array:
        g = grad.astype(jnp.float32)
        a = act.astype(jnp.float32)
        g2 = g**2
        g3 = g2 * g
        sum_a_g3 = jnp.sum(a * g3, axis=(1, 2, 3), keepdims=True)
        alpha = g2 / (2.0 * g2 + sum_a_g3 + 1e-8)
        return jnp.sum(alpha * jnp.maximum(g, 0.0), axis=(1, 2, 3))


def visualize_gradcam(
    image: np.ndarray,
    cam: np.ndarray,
    output_path=None,
    axis: int = 2,
    slice_idx: Optional[int] = None,
    alpha: float = 0.4,
):
    """Overlay a CAM slice on the image (reference: gradcam.py:250-287)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    image = np.asarray(image)
    if image.ndim == 4:  # [H, W, D, C] → first channel
        image = image[..., 0]
    if slice_idx is None:
        slice_idx = image.shape[axis] // 2
    img_slice = np.take(image, slice_idx, axis=axis)
    cam_slice = np.take(cam, slice_idx, axis=axis)

    fig, axes = plt.subplots(1, 3, figsize=(14, 5))
    axes[0].imshow(img_slice.T, cmap="gray", origin="lower")
    axes[0].set_title("image")
    axes[1].imshow(cam_slice.T, cmap="jet", origin="lower")
    axes[1].set_title("GradCAM")
    axes[2].imshow(img_slice.T, cmap="gray", origin="lower")
    axes[2].imshow(cam_slice.T, cmap="jet", alpha=alpha, origin="lower")
    axes[2].set_title("overlay")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    if output_path is not None:
        fig.savefig(output_path, dpi=100)
        plt.close(fig)
        return str(output_path)
    return fig
