"""Sliding-window inference compiled to one XLA program.

Replaces MONAI's ``sliding_window_inference`` (used by the reference at
src/trainer/trainer.py:370-395): static tile grid from roi/overlap, a
precomputed separable Gaussian importance map, ``lax.scan`` over tile
chunks with dynamic-slice extraction and read-modify-write accumulation,
then a final normalize. Everything is static-shaped so XLA pipelines the
whole volume without host round-trips — this is the benchmark path
(BASELINE.md north star).

Tiling contract (MONAI-compatible):
  interval_i = int(roi_i * (1 - overlap))   (roi_i if interval would be 0)
  n_i        = ceil((dim_i - roi_i) / interval_i) + 1
  start_k    = min(k * interval_i, dim_i - roi_i)

Gaussian blending: separable gaussian centered at (roi-1)/2 with
sigma = 0.125 * roi, max-normalized (MONAI default sigma_scale=0.125).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _scan_starts(dim: int, roi: int, overlap: float) -> list:
    """Tile start offsets along one axis (MONAI dense_patch_slices rule)."""
    if dim <= roi:
        return [0]
    interval = int(roi * (1.0 - overlap))
    if interval <= 0:
        interval = roi
    n = int(math.ceil((dim - roi) / interval)) + 1
    return [min(k * interval, dim - roi) for k in range(n)]


def gaussian_importance_map(
    roi_size: Sequence[int], sigma_scale: float = 0.125, dtype=np.float32
) -> np.ndarray:
    """Separable Gaussian weight map over a ROI, max-normalized to 1."""
    maps = []
    for r in roi_size:
        center = (r - 1) / 2.0
        sigma = sigma_scale * r
        x = np.arange(r, dtype=np.float64)
        g = np.exp(-0.5 * ((x - center) / sigma) ** 2)
        maps.append(g)
    w = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    w = w / w.max()
    # avoid exact zeros so normalization is safe everywhere
    w = np.maximum(w, w.max() * 1e-3)
    return w.astype(dtype)


@partial(
    jax.jit,
    static_argnames=("predict_fn", "roi_size", "overlap", "sw_batch_size", "mode", "num_classes"),
)
def sliding_window_inference(
    volume: jax.Array,
    predict_fn: Callable[..., jax.Array],
    roi_size: Tuple[int, int, int],
    num_classes: int,
    overlap: float = 0.5,
    sw_batch_size: int = 4,
    mode: str = "gaussian",
    params=None,
) -> jax.Array:
    """Run tiled inference over ``volume``.

    Args:
        volume: ``[H, W, D, C]`` (single volume) or ``[B, H, W, D, C]``.
        predict_fn: maps ``[n, *roi, C]`` patches → ``[n, *roi, num_classes]``
            logits. Must be jit-traceable. If ``params`` is given, the
            signature is ``predict_fn(params, patches)``.
        roi_size: tile size.
        num_classes: output channel count.
        overlap: fractional tile overlap (default 0.5 like the reference
            config inference.sliding_window.overlap).
        sw_batch_size: tiles per model forward (reference inference.batch_size).
        mode: "gaussian" or "constant" blending.
        params: optional pytree of model variables, threaded through the jit
            as a real argument. IMPORTANT for performance: closing over the
            weights in ``predict_fn`` instead would embed them as program
            constants (slow lowering, host transfers, recompile per
            checkpoint).

    Returns:
        logits with the same spatial shape as ``volume`` and ``num_classes``
        channels.
    """
    run_predict = (
        predict_fn if params is None else (lambda p: predict_fn(params, p))
    )
    if volume.ndim == 5:
        return jax.vmap(
            lambda v: sliding_window_inference(
                v,
                predict_fn,
                roi_size,
                num_classes,
                overlap,
                sw_batch_size,
                mode,
                params,
            )
        )(volume)

    h, w, d, c = volume.shape
    rh, rw, rd = roi_size

    # Pad spatial dims up to at least roi
    ph, pw, pd = max(rh - h, 0), max(rw - w, 0), max(rd - d, 0)
    vol = jnp.pad(volume, ((0, ph), (0, pw), (0, pd), (0, 0)))
    H, W, D = h + ph, w + pw, d + pd

    starts = [
        (sh, sw_, sd)
        for sh in _scan_starts(H, rh, overlap)
        for sw_ in _scan_starts(W, rw, overlap)
        for sd in _scan_starts(D, rd, overlap)
    ]
    n_tiles = len(starts)
    n_chunks = int(math.ceil(n_tiles / sw_batch_size))
    # pad tile list to a whole number of chunks; padded slots are masked to
    # zero contribution (repeating a tile unmasked would double its
    # Gaussian weight and change blended logits vs MONAI)
    n_padded = n_chunks * sw_batch_size
    valid = np.zeros((n_padded,), dtype=np.float32)
    valid[:n_tiles] = 1.0
    while len(starts) < n_padded:
        starts.append(starts[-1])
    starts_arr = jnp.asarray(np.asarray(starts, dtype=np.int32)).reshape(
        n_chunks, sw_batch_size, 3
    )
    valid_arr = jnp.asarray(valid).reshape(n_chunks, sw_batch_size)

    if mode == "gaussian":
        weight = jnp.asarray(gaussian_importance_map(roi_size))
    else:
        weight = jnp.ones(roi_size, dtype=jnp.float32)
    weight4 = weight[..., None]  # [rh, rw, rd, 1]

    acc = jnp.zeros((H, W, D, num_classes), dtype=jnp.float32)
    wacc = jnp.zeros((H, W, D, 1), dtype=jnp.float32)

    def extract(start):
        return jax.lax.dynamic_slice(
            vol, (start[0], start[1], start[2], 0), (rh, rw, rd, c)
        )

    def chunk_body(carry, chunk):
        acc, wacc = carry
        chunk_starts, chunk_valid = chunk
        patches = jax.vmap(extract)(chunk_starts)  # [sw, rh, rw, rd, c]
        logits = run_predict(patches).astype(jnp.float32)  # [sw, rh, rw, rd, K]
        weighted = logits * weight4[None]

        def add_one(i, carry):
            acc, wacc = carry
            s = chunk_starts[i]
            v = chunk_valid[i]  # 0 for padded duplicate tiles
            idx = (s[0], s[1], s[2], 0)
            cur = jax.lax.dynamic_slice(acc, idx, (rh, rw, rd, num_classes))
            acc = jax.lax.dynamic_update_slice(acc, cur + weighted[i] * v, idx)
            curw = jax.lax.dynamic_slice(wacc, idx, (rh, rw, rd, 1))
            wacc = jax.lax.dynamic_update_slice(wacc, curw + weight4 * v, idx)
            return acc, wacc

        acc, wacc = jax.lax.fori_loop(0, sw_batch_size, add_one, (acc, wacc))
        return (acc, wacc), None

    (acc, wacc), _ = jax.lax.scan(chunk_body, (acc, wacc), (starts_arr, valid_arr))

    out = acc / wacc
    return out[:h, :w, :d, :]
