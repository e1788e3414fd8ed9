"""Volume resizing as separable matrix products (MXU-friendly).

Matches scipy ``ndimage.zoom`` semantics exactly (the reference's Resize,
src/data/transforms.py:215-250):

- order=1 (images): output coord ``i`` samples input coord
  ``i * (in-1) / (out-1)`` with linear interpolation (verified empirically
  against scipy).
- order=0 (labels): same coords, rounded to nearest index.

Instead of gather-based ``map_coordinates`` (slow scatter/gather on TPU),
each axis resize is a dense ``[out, in]`` interpolation-matrix contraction —
three small matmuls that XLA fuses and runs on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _linear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out, in] linear-interpolation matrix, align-corners mapping."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if out_size == 1:
        m = np.zeros((1, in_size), dtype=np.float32)
        m[0, 0] = 1.0
        return m
    coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2) if in_size > 1 else np.zeros_like(lo)
    frac = coords - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    m[rows, lo] = (1.0 - frac).astype(np.float32)
    m[rows, np.minimum(lo + 1, in_size - 1)] += frac.astype(np.float32)
    return m


def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out, in] nearest-neighbor selection matrix (scipy order=0)."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if out_size == 1:
        m = np.zeros((1, in_size), dtype=np.float32)
        m[0, 0] = 1.0
        return m
    coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    idx = np.floor(coords + 0.5).astype(np.int64)
    idx = np.clip(idx, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


def _apply_axis(x: jax.Array, matrix: jax.Array, axis: int) -> jax.Array:
    """Contract ``matrix [out, in]`` against ``x`` along ``axis``.

    HIGHEST precision: resize matmuls are a negligible FLOP fraction but
    must match scipy bit-for-bit-ish on TPU (default TPU matmul precision
    is bf16-accumulated and fails parity at 1e-4).
    """
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, matrix.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


@partial(jax.jit, static_argnames=("out_shape", "spatial_axes"))
def resize_linear(
    x: jax.Array,
    out_shape: Tuple[int, ...],
    spatial_axes: Tuple[int, ...] = (-3, -2, -1),
) -> jax.Array:
    """Linear resize of the given spatial axes to ``out_shape``."""
    axes = [a % x.ndim for a in spatial_axes]
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    for axis, out_size in zip(axes, out_shape):
        m = jnp.asarray(_linear_matrix(x.shape[axis], out_size))
        y = _apply_axis(y, m, axis)
    return y.astype(orig_dtype)


@partial(jax.jit, static_argnames=("out_shape", "spatial_axes"))
def resize_nearest(
    x: jax.Array,
    out_shape: Tuple[int, ...],
    spatial_axes: Tuple[int, ...] = (-3, -2, -1),
) -> jax.Array:
    """Nearest-neighbor resize (labels)."""
    axes = [a % x.ndim for a in spatial_axes]
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    for axis, out_size in zip(axes, out_shape):
        m = jnp.asarray(_nearest_matrix(x.shape[axis], out_size))
        y = _apply_axis(y, m, axis)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        y = jnp.round(y)
    return y.astype(orig_dtype)


def resize_volume(
    image: jax.Array,
    out_shape: Tuple[int, int, int],
    order: int = 1,
    spatial_axes: Tuple[int, ...] = (-3, -2, -1),
) -> jax.Array:
    """scipy-zoom-compatible volume resize (order ∈ {0, 1})."""
    if order == 0:
        return resize_nearest(image, tuple(out_shape), tuple(spatial_axes))
    return resize_linear(image, tuple(out_shape), tuple(spatial_axes))


def upsample2x_linear(x: jax.Array, spatial_axes: Tuple[int, ...] = (1, 2, 3)) -> jax.Array:
    """2× trilinear upsample with align_corners=True (torch Upsample parity,
    reference unet.py:98)."""
    out_shape = tuple(x.shape[a % x.ndim] * 2 for a in spatial_axes)
    return resize_linear(x, out_shape, tuple(spatial_axes))
