"""Pallas flash-attention tests (interpret mode on CPU; compiled path is
exercised on real TPU in bench/verify runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.ops.attention import (
    dense_attention,
    multi_head_attention,
)
from multimodal_organ_segmentation_tpu.ops.pallas.flash_attention import (
    flash_attention,
)


def _qkv(nq, nk, h, d, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(2, nq, h, d)).astype(dtype)),
        jnp.asarray(rng.normal(size=(2, nk, h, d)).astype(dtype)),
        jnp.asarray(rng.normal(size=(2, nk, h, d)).astype(dtype)),
    )


class TestFlashAttention:
    @pytest.mark.parametrize(
        "nq,nk,h,d",
        [(300, 300, 4, 8), (729, 729, 2, 32), (100, 257, 3, 16), (64, 1500, 1, 64)],
    )
    def test_matches_dense(self, nq, nk, h, d):
        q, k, v = _qkv(nq, nk, h, d)
        ref = dense_attention(q, k, v)
        out = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16(self):
        q, k, v = _qkv(128, 128, 2, 16, dtype=np.float32)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ref = dense_attention(q, k, v)
        out = flash_attention(qb, kb, vb).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    def test_gradients_match_dense(self):
        q, k, v = _qkv(96, 96, 2, 8)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        def loss_dense(q, k, v):
            return jnp.sum(dense_attention(q, k, v) ** 2)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_dispatcher_forced_pallas(self):
        q, k, v = _qkv(200, 200, 2, 8)
        out = multi_head_attention(q, k, v, use_pallas=True)
        ref = dense_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
