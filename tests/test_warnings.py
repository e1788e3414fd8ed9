"""Silent-degradation guards (VERDICT r2 weak #3): configured parallelism
that can't engage must WARN, not silently fall back."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.parallel.mesh import make_mesh
from multimodal_organ_segmentation_tpu.utils.config import default_config


class TestStackAccumWarning:
    def test_warns_when_replicating(self):
        from multimodal_organ_segmentation_tpu.train.trainer import Trainer

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        cfg = default_config()
        cfg.set("model.name", "unet3d")
        cfg.set("model.backbone.features", [4, 8])
        cfg.set("data.modalities", ["CT"])
        t = Trainer(cfg, mesh=make_mesh(None))
        n = t.mesh.shape["data"]
        micro = n + 1  # not divisible -> replication fallback
        batch = {
            "image": np.zeros((micro, 8, 8, 8, 1), np.float32),
            "label": np.zeros((micro, 8, 8, 8), np.int32),
        }
        with pytest.warns(UserWarning, match="data parallelism is OFF"):
            t._stack_accum([batch])
        # warned once only
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("error")
            t._stack_accum([batch])

    def test_no_warning_when_divisible(self):
        from multimodal_organ_segmentation_tpu.train.trainer import Trainer

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        cfg = default_config()
        cfg.set("model.name", "unet3d")
        cfg.set("data.modalities", ["CT"])
        t = Trainer(cfg, mesh=make_mesh(None))
        n = t.mesh.shape["data"]
        batch = {
            "image": np.zeros((n, 8, 8, 8, 1), np.float32),
            "label": np.zeros((n, 8, 8, 8), np.int32),
        }
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("error")
            im, lb = t._stack_accum([batch])
        assert im.shape[1] == n


class TestRingFallbackWarning:
    def test_warns_when_tokens_not_shardable(self):
        import multimodal_organ_segmentation_tpu.models.fusion as fusion

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        mesh = make_mesh(None)
        fusion._RING_FALLBACK_WARNED.clear()
        mod = fusion.CrossAttentionFusion(
            num_heads=2, sequence_axis="data", mesh=mesh
        )
        # 3*3*3 = 27 tokens does not divide an even-sized axis
        x = jnp.zeros((1, 3, 3, 3, 4), jnp.float32)
        with pytest.warns(UserWarning, match="Sequence parallelism is OFF"):
            variables = mod.init(jax.random.key(0), x, x, False)
        # behavior unchanged: forward still runs (single-device flash path)
        out = mod.apply(variables, x, x, False)
        assert out.shape == x.shape

    def test_no_warning_when_ring_engages(self):
        import multimodal_organ_segmentation_tpu.models.fusion as fusion

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        mesh = make_mesh(None)
        n = mesh.shape["data"]
        fusion._RING_FALLBACK_WARNED.clear()
        mod = fusion.CrossAttentionFusion(
            num_heads=2, sequence_axis="data", mesh=mesh
        )
        x = jnp.zeros((1, n, 2, 4, 4), jnp.float32)  # n*2*4 tokens divide n
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("error")
            variables = mod.init(jax.random.key(0), x, x, False)
            out = mod.apply(variables, x, x, False)
        assert out.shape == x.shape
