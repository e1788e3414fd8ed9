"""Pallas TPU flash attention for voxel-token cross attention.

Replaces the reference's dense O(N²) softmax over N = H·W·D voxel tokens
(attention_fusion.py:144-155). Design:

- grid ``(B·heads, n_q_blocks, n_kv_blocks)`` — the KV dimension is the
  innermost (sequential) grid axis, so the running-softmax state (m, l,
  acc) lives in VMEM scratch and persists across KV steps; the output
  block is written once at the last KV step (``pl.when``);
- scores computed on the MXU in fp32 (``preferred_element_type``);
- explicit length masking for padded KV positions (both scores and
  probabilities);
- head_dim padded to the 128-lane width.

Backward: ``jax.custom_vjp`` whose bwd re-runs the numerically identical
XLA blockwise implementation (ops/attention.py) under ``jax.vjp`` — exact
gradients with O(N·block) memory, no second hand-written kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, n_k, block_kv
):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # [bq, d]
    k = k_ref[0].astype(jnp.float32)  # [bkv, d]
    v = v_ref[0].astype(jnp.float32)  # [bkv, d]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, bkv]

    # mask padded kv positions
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
    valid = col < n_k
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:, 0]  # [bq]
    l_prev = l_scr[:, 0]
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new[:, None])
    p = jnp.where(valid, p, 0.0)

    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1)

    acc_scr[:] = acc_scr[:] * corr[:, None] + jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)

    @pl.when(kv_idx == n_kv - 1)
    def _emit():
        l = l_scr[:, 0]
        denom = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / denom[:, None]).astype(o_ref.dtype)


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_kv: int = 512,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """q, k, v: [B, N, H, D] → [B, N, H, D]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    scale = scale if scale is not None else d**-0.5

    # [B, N, H, D] → [B·H, N, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    block_q = min(block_q, max(128, 1 << (n_q - 1).bit_length()))
    block_kv = min(block_kv, max(128, 1 << (n_k - 1).bit_length()))

    # do NOT pad head_dim in HBM: Mosaic pads the lane dim inside VMEM for
    # free, while an HBM pad (this kernel forced 128 in round 1) multiplies
    # q/k/v DMA traffic 8x at the cross-attention-fusion head_dim of 16 —
    # ~20ms of pure padding DMA at the /4 fusion stage of a 96³ SwinUNETR.
    # Same fix and rationale as ops/pallas/window_attention.py.
    d_pad = d
    nq_pad = ((n_q + block_q - 1) // block_q) * block_q
    nk_pad = ((n_k + block_kv - 1) // block_kv) * block_kv

    qb = _pad_to(_pad_to(qb, nq_pad, 1), d_pad, 2)
    kb = _pad_to(_pad_to(kb, nk_pad, 1), d_pad, 2)
    vb = _pad_to(_pad_to(vb, nk_pad, 1), d_pad, 2)

    grid = (b * h, nq_pad // block_q, nk_pad // block_kv)

    kernel = functools.partial(
        _flash_kernel, scale=scale, n_k=n_k, block_kv=block_kv
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_q * n_k * d,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=b * h * n_q * n_k,
        ),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :n_q, :d].reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_kv: int = 512,
) -> jax.Array:
    """Flash multi-head attention over ``[B, N, H, D]`` tokens."""
    return _flash_forward(q, k, v, block_q, block_kv)


def _fwd(q, k, v, block_q, block_kv):
    return _flash_forward(q, k, v, block_q, block_kv), (q, k, v)


def _bwd(block_q, block_kv, residuals, g):
    # exact gradients through the numerically identical XLA blockwise path
    from multimodal_organ_segmentation_tpu.ops.attention import blockwise_attention

    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: blockwise_attention(q, k, v, kv_block=block_kv), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
