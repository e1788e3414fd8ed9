"""Ring attention == dense attention on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.ops.attention import dense_attention
from multimodal_organ_segmentation_tpu.parallel.mesh import make_mesh
from multimodal_organ_segmentation_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(None)


class TestRingAttention:
    def test_equals_dense(self, mesh):
        n_dev = mesh.shape["data"]
        rng = np.random.default_rng(0)
        n = n_dev * 16  # divisible by the ring size
        q = jnp.asarray(rng.normal(size=(2, n, 2, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, n, 2, 8)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, n, 2, 8)).astype(np.float32))

        ref = dense_attention(q, k, v)
        out = ring_attention(q, k, v, mesh, axis_name="data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_sharded_output(self, mesh):
        n_dev = mesh.shape["data"]
        rng = np.random.default_rng(1)
        n = n_dev * 8
        q = jnp.asarray(rng.normal(size=(1, n, 1, 8)).astype(np.float32))
        out = ring_attention(q, q, q, mesh)
        # output keeps the token-axis sharding
        assert out.shape == (1, n, 1, 8)
        spec = out.sharding.spec
        assert "data" in str(spec)

    def test_jit_composable(self, mesh):
        """ring_attention must compose under jit (one XLA program)."""
        n_dev = mesh.shape["data"]
        rng = np.random.default_rng(2)
        n = n_dev * 8
        q = jnp.asarray(rng.normal(size=(1, n, 2, 8)).astype(np.float32))

        @jax.jit
        def f(q):
            return jnp.sum(ring_attention(q, q, q, mesh))

        ref = float(jnp.sum(dense_attention(q, q, q)))
        assert float(f(q)) == pytest.approx(ref, rel=1e-5)
