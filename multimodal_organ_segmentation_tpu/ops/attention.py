"""Attention primitives: dense and blockwise (flash-style) multi-head attention.

The reference's CrossAttentionFusion materializes an O(N²) score matrix over
N = H·W·D voxel tokens (src/models/fusion/attention_fusion.py:144-155) — at
128³ that's infeasible. Here attention over voxel tokens is computed
blockwise with running-softmax renormalization so memory is O(N·block):

- ``dense_attention`` — reference semantics for small N and for parity tests;
- ``blockwise_attention`` — lax.scan over KV blocks with the
  (running max, running denominator) flash recurrence. Pure XLA, works on
  CPU and TPU; the Pallas TPU kernel (ops/pallas/flash_attention.py) is used
  automatically on TPU for large N.

All functions take ``[B, N, H, Dh]`` query/key/value (tokens-major,
heads inside) and return ``[B, N, H, Dh]``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def dense_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None
) -> jax.Array:
    """Reference dense softmax attention."""
    head_dim = q.shape[-1]
    scale = scale if scale is not None else head_dim ** -0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bnhd,bmhd->bhnm", qf, kf) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, vf)
    return out.astype(q.dtype)


@partial(jax.jit, static_argnames=("kv_block", "scale"))
def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_block: int = 1024,
    scale: Optional[float] = None,
) -> jax.Array:
    """Memory-efficient attention: scan over KV blocks, flash recurrence."""
    b, n, h, d = q.shape
    m = k.shape[1]
    scale = scale if scale is not None else d ** -0.5

    if m <= kv_block:
        return dense_attention(q, k, v, scale)

    # pad KV to a multiple of kv_block with -inf-masked entries
    pad = (-m) % kv_block
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    mask = jnp.arange(m + pad) < m  # [M]
    n_blocks = (m + pad) // kv_block

    kb = k.reshape(b, n_blocks, kv_block, h, d)
    vb = v.reshape(b, n_blocks, kv_block, h, d)
    maskb = mask.reshape(n_blocks, kv_block)

    qf = q.astype(jnp.float32) * scale

    def body(carry, inp):
        m_run, l_run, acc = carry  # [b,h,n], [b,h,n], [b,n,h,d]
        k_i, v_i, mask_i = inp
        s = jnp.einsum("bnhd,bmhd->bhnm", qf, k_i.astype(jnp.float32))
        s = jnp.where(mask_i[None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
        # guard: all-masked block at start gives -inf; exp(-inf - -inf) nan
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        p = jnp.exp(s - m_safe[..., None])  # [b,h,n,m]
        correction = jnp.exp(jnp.where(jnp.isneginf(m_run), -jnp.inf, m_run) - m_safe)
        correction = jnp.where(jnp.isnan(correction), 0.0, correction)
        l_new = l_run * correction + jnp.sum(p, axis=-1)
        acc = acc * correction.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhnm,bmhd->bnhd", p, v_i.astype(jnp.float32)
        )
        return (m_new, l_new, acc), None

    init = (
        jnp.full((b, h, n), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((b, h, n), dtype=jnp.float32),
        jnp.zeros((b, n, h, d), dtype=jnp.float32),
    )
    (m_run, l_run, acc), _ = jax.lax.scan(
        body,
        init,
        (
            jnp.moveaxis(kb, 1, 0),
            jnp.moveaxis(vb, 1, 0),
            maskb,
        ),
    )
    out = acc / l_run.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_block: int = 2048,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatch: Pallas flash kernel on TPU for large N, else XLA blockwise."""
    n, m = q.shape[1], k.shape[1]
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and m >= 1024 and q.shape[-1] <= 256
        )
    if use_pallas:
        try:
            from multimodal_organ_segmentation_tpu.ops.pallas.flash_attention import (
                flash_attention,
            )

            return flash_attention(q, k, v)
        except Exception:
            pass
    return blockwise_attention(q, k, v, kv_block=kv_block)
