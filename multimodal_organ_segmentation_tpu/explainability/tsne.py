"""t-SNE feature visualization (reference: src/explainability/tsne.py:15-226).

GAP-pooled capture features per sample; labels = per-sample voxel-label
mode (tsne.py:103-105); sklearn TSNE (perplexity 30, seed 42) scatter.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


class TSNEVisualizer:
    """Embed pooled encoder features of many samples in 2D."""

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        feature_level: int = -1,
        perplexity: float = 30.0,
        n_components: int = 2,
        seed: int = 42,
    ):
        self.model = model
        self.variables = {"params": variables["params"]}
        self.feature_level = feature_level
        self.perplexity = perplexity
        self.n_components = n_components
        self.seed = seed
        self._extract = jax.jit(self._pooled_features)

    def _pooled_features(self, x):
        out = self.model.apply(self.variables, x, train=False, capture=True)
        _, feats = out
        if isinstance(feats, dict):
            feats = feats.get("fused_features", [])
        f = feats[self.feature_level]
        return jnp.mean(f.astype(jnp.float32), axis=(1, 2, 3))  # [B, C]

    def collect(self, samples) -> Dict[str, np.ndarray]:
        """samples: iterable of dicts with image [H,W,D,C] (+ optional label)."""
        vecs, labels = [], []
        for s in samples:
            img = jnp.asarray(np.asarray(s["image"]))[None]
            vecs.append(np.asarray(self._extract(img))[0])
            if "label" in s and s["label"] is not None:
                lbl = np.asarray(s["label"])
                fg = lbl[lbl > 0]
                labels.append(int(np.bincount(fg.ravel()).argmax()) if fg.size else 0)
            else:
                labels.append(0)
        return {"features": np.stack(vecs), "labels": np.asarray(labels)}

    def visualize(self, samples, output_path) -> str:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.manifold import TSNE

        data = self.collect(samples)
        n = len(data["features"])
        perplexity = min(self.perplexity, max(1.0, (n - 1) / 3))
        tsne = TSNE(
            n_components=self.n_components,
            perplexity=perplexity,
            random_state=self.seed,
            init="pca" if n > self.n_components else "random",
        )
        emb = tsne.fit_transform(data["features"])

        fig, ax = plt.subplots(figsize=(8, 8))
        scatter = ax.scatter(
            emb[:, 0], emb[:, 1], c=data["labels"], cmap="tab10", s=40
        )
        ax.set_title("t-SNE of pooled encoder features")
        fig.colorbar(scatter, ax=ax, label="dominant label")
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        fig.tight_layout()
        fig.savefig(output_path, dpi=100)
        plt.close(fig)
        return str(output_path)
