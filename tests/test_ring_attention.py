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


class TestModelWiring:
    """Ring attention wired INTO the models (VERDICT round-1 item 3)."""

    def test_cross_attention_fusion_ring_matches_flash(self, mesh):
        from multimodal_organ_segmentation_tpu.models.fusion import (
            CrossAttentionFusion,
        )

        rng = np.random.default_rng(3)
        # 8³ level → 512 tokens, divisible by the 8-device ring
        q_feat = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)).astype(np.float32))
        kv_feat = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)).astype(np.float32))

        base = CrossAttentionFusion(num_heads=2)
        ringed = CrossAttentionFusion(
            num_heads=2, sequence_axis="data", mesh=mesh
        )
        variables = base.init(jax.random.key(0), q_feat, kv_feat, train=False)
        ref = base.apply(variables, q_feat, kv_feat, train=False)
        out = ringed.apply(variables, q_feat, kv_feat, train=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_cross_attention_fusion_ring_fallback_indivisible(self, mesh):
        """Token counts that don't divide the ring fall back to flash."""
        from multimodal_organ_segmentation_tpu.models.fusion import (
            CrossAttentionFusion,
        )

        rng = np.random.default_rng(4)
        # 3³ = 27 tokens, not divisible by 8
        f1 = jnp.asarray(rng.normal(size=(1, 3, 3, 3, 4)).astype(np.float32))
        ringed = CrossAttentionFusion(num_heads=2, sequence_axis="data", mesh=mesh)
        variables = ringed.init(jax.random.key(0), f1, f1, train=False)
        out = ringed.apply(variables, f1, f1, train=False)
        assert out.shape == f1.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_dual_encoder_xattn_ring_matches_dense(self, mesh):
        """DualEncoder cross_attention forward: ring == single-device path.

        The capability called for in SURVEY.md §2.10 / VERDICT item 3: the
        128³ config routes its voxel-token cross attention through the mesh.
        """
        from multimodal_organ_segmentation_tpu.models.dual_encoder import (
            DualEncoder,
        )

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 2)).astype(np.float32))

        kwargs = dict(
            num_modalities=2,
            out_channels=4,
            features=(4, 8),
            fusion_type="cross_attention",
            cross_attn_heads=2,
        )
        base = DualEncoder(**kwargs)
        ringed = DualEncoder(**kwargs, sequence_axis="data", mesh=mesh)

        variables = base.init(jax.random.key(0), x, train=False)
        ref = base.apply(variables, x, train=False)
        out = ringed.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_config_selects_ring(self):
        """configs/dual_encoder_xattn_128.yaml wires sequence_axis=data."""
        from multimodal_organ_segmentation_tpu.utils.config import load_config
        from multimodal_organ_segmentation_tpu.models.build import build_model

        cfg = load_config("configs/dual_encoder_xattn_128.yaml")
        model = build_model(cfg)
        backbone = model.backbone
        assert backbone.sequence_axis == "data"
        assert backbone.mesh is not None
        assert dict(backbone.mesh.shape)["data"] > 1

    def test_mesh_scales_xattn_budget(self):
        """A sequence-parallel mesh multiplies the O(N²) token budget by the
        axis size (the K/V ring shards memory AND compute), engaging cross
        attention at pyramid levels a single device's budget would gate."""
        import numpy as np_
        from jax.sharding import Mesh
        from multimodal_organ_segmentation_tpu.models.dual_encoder import DualEncoder

        kwargs = dict(
            num_modalities=2, out_channels=2, features=(4, 8),
            fusion_type="cross_attention", cross_attn_heads=2,
            xattn_max_tokens=100,  # < 8³=512 level-0 tokens
        )
        x = jnp.zeros((1, 8, 8, 8, 2))

        solo = DualEncoder(**kwargs)
        solo_params = solo.init(jax.random.key(0), x, train=False)["params"]
        assert "fusion_xattn0" not in solo_params  # gated: 512 > 100

        mesh = Mesh(np_.asarray(jax.devices()[:8]), ("seq",))
        ringed = DualEncoder(**kwargs, sequence_axis="seq", mesh=mesh)
        ring_params = ringed.init(jax.random.key(0), x, train=False)["params"]
        assert "fusion_xattn0" in ring_params  # 512 <= 100 * 8
