"""Fused Pallas kernel for 3D windowed multi-head attention.

The XLA path materializes ``[B·nW, heads, N, N]`` score tensors in HBM
(at stage 1 of a 96³ SwinUNETR that's ~0.5 GB per batch element) — pure
HBM-bandwidth waste for N = 343-token windows. This kernel keeps the whole
attention for one (window, head) in VMEM: one program computes
``softmax(q·kᵀ·scale + rel_pos_bias[h] + shift_mask[w]) · v`` with no HBM
round-trip for scores.

Grid: ``(B·nW·heads,)`` — bias is indexed by ``head = i % H`` and the
shift mask by ``window = (i // H) % nW`` directly in the BlockSpec index
maps. Tokens are padded to the sublane multiple and masked.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale, n_tok):
    q = q_ref[0].astype(jnp.float32)  # [Np, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Np, Np]
    s = s + bias_ref[0].astype(jnp.float32)
    s = s + mask_ref[0].astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_tok, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(col < n_tok, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-20)
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def dense_window_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    num_windows: int,
) -> jax.Array:
    """Reference dense formula (used on CPU and as the backward path)."""
    bw, n, h, d = q.shape
    scale = d**-0.5
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        b = bw // num_windows
        m = jnp.tile(mask.astype(jnp.float32), (b, 1, 1))  # [BW, N, N]
        s = s + m[:, None]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def window_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    num_windows: int,
) -> jax.Array:
    """Fused windowed MHA.

    Args:
        q, k, v: ``[BW, N, H, D]`` — BW = batch·num_windows (windows vary
            fastest, matching window_partition's reshape order).
        bias: relative position bias ``[H, N, N]``.
        mask: shift mask ``[nW, N, N]`` or None.
        num_windows: nW (for mask indexing).
    Returns:
        ``[BW, N, H, D]``.
    """
    return _window_mha_fwd_impl(q, k, v, bias, mask, num_windows)


def _window_mha_fwd(q, k, v, bias, mask, num_windows):
    return window_mha(q, k, v, bias, mask, num_windows), (q, k, v, bias, mask)


def _window_mha_bwd(num_windows, residuals, g):
    q, k, v, bias, mask = residuals
    _, vjp = jax.vjp(
        lambda q, k, v, bias, mask: dense_window_mha(q, k, v, bias, mask, num_windows),
        q, k, v, bias, mask,
    )
    return vjp(g)


window_mha.defvjp(_window_mha_fwd, _window_mha_bwd)


def _window_mha_fwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    num_windows: int,
    interpret: Optional[bool] = None,
    force_d_pad: Optional[int] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bw, n, h, d = q.shape
    scale = d**-0.5

    n_pad = ((n + 127) // 128) * 128
    # do NOT pad head_dim in HBM: Mosaic pads the lane dim inside VMEM for
    # free, while an HBM pad (the round-1 kernel forced 128) multiplies
    # q/k/v DMA traffic 8x at the SwinUNETR head_dim of 16 — that waste is
    # exactly why the old kernel was only neutral vs XLA
    d_pad = force_d_pad or d

    def to_prog(x):  # [BW, N, H, D] → [BW·H, Np, Dp]
        x = x.transpose(0, 2, 1, 3).reshape(bw * h, n, d)
        return _pad_axis(_pad_axis(x, n_pad, 1), d_pad, 2)

    qp, kp, vp = to_prog(q), to_prog(k), to_prog(v)
    bias_p = _pad_axis(_pad_axis(bias, n_pad, 1), n_pad, 2)  # [H, Np, Np]
    if mask is None:
        mask_p = jnp.zeros((1, n_pad, n_pad), dtype=jnp.float32)
        n_w = 1
    else:
        mask_p = _pad_axis(_pad_axis(mask, n_pad, 1), n_pad, 2)
        n_w = num_windows

    grid = (bw * h,)
    kernel = functools.partial(_kernel, scale=scale, n_tok=n)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bw * h, n_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i % h, 0, 0)),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: ((i // h) % n_w, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * bw * h * n * n * d,
            bytes_accessed=(qp.size * 3 + bias_p.size) * qp.dtype.itemsize,
            transcendentals=bw * h * n * n,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p, mask_p)

    out = out[:, :n, :d].reshape(bw, h, n, d).transpose(0, 2, 1, 3)
    return out
