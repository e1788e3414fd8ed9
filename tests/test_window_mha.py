"""Pallas fused window-MHA: parity with the dense formula (interpret mode).

Covers the kernel the SwinUNETR encoder dispatches on TPU
(models/swin_unetr.py:176-184): forward parity with/without the shift
mask, non-multiple-of-128 token counts (7³=343 like the real model),
small head_dim (16, the fs=48 SwinUNETR head width — the round-2 kernel
stopped padding it to 128 in HBM), bf16 inputs, and the custom-vjp
gradient path (which routes through the dense formula).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.ops.pallas.window_attention import (
    _window_mha_fwd_impl,
    dense_window_mha,
    window_mha,
)


def _inputs(bw, n, h, d, nw, with_mask, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(bw, n, h, d)), dtype)
    k = jnp.asarray(rng.normal(size=(bw, n, h, d)), dtype)
    v = jnp.asarray(rng.normal(size=(bw, n, h, d)), dtype)
    bias = jnp.asarray(rng.normal(size=(h, n, n)) * 0.1, jnp.float32)
    mask = None
    if with_mask:
        # shift-style mask: blocks of 0 / -100 like the real swin mask
        m = rng.choice([0.0, -100.0], size=(nw, n, n), p=[0.8, 0.2])
        mask = jnp.asarray(m, jnp.float32)
    return q, k, v, bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize(
    "bw,n,h,d,nw",
    [
        (8, 343, 3, 16, 4),  # stage-1 96³/7³ geometry: N=343, head_dim 16
        (6, 27, 2, 8, 3),  # tiny odd shapes
        (4, 128, 4, 32, 2),  # exact lane multiples
    ],
)
def test_forward_matches_dense(bw, n, h, d, nw, with_mask):
    q, k, v, bias, mask = _inputs(bw, n, h, d, nw, with_mask)
    fused = _window_mha_fwd_impl(q, k, v, bias, mask, nw, interpret=True)
    dense = dense_window_mha(q, k, v, bias, mask, nw)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(dense), rtol=2e-5, atol=2e-5
    )


def test_forward_bf16_dtype():
    q, k, v, bias, mask = _inputs(8, 343, 3, 16, 4, True, dtype=jnp.bfloat16)
    fused = _window_mha_fwd_impl(q, k, v, bias, mask, 4, interpret=True)
    assert fused.dtype == jnp.bfloat16
    dense = dense_window_mha(q, k, v, bias, mask, 4)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(dense, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_gradient_matches_dense():
    q, k, v, bias, mask = _inputs(4, 27, 2, 8, 2, True)

    def loss_fused(q, k, v, bias):
        return jnp.sum(window_mha(q, k, v, bias, mask, 2) ** 2)

    def loss_dense(q, k, v, bias):
        return jnp.sum(dense_window_mha(q, k, v, bias, mask, 2) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_jit_composes():
    q, k, v, bias, mask = _inputs(4, 27, 2, 8, 2, True)
    f = jax.jit(lambda *a: window_mha(*a, mask, 2))
    out = f(q, k, v, bias)
    dense = dense_window_mha(q, k, v, bias, mask, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), rtol=2e-5, atol=2e-5)
