"""Tests for resize (scipy parity), attention, sliding-window inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.ops.resize import (
    resize_linear,
    resize_nearest,
    resize_volume,
)
from multimodal_organ_segmentation_tpu.ops.attention import (
    blockwise_attention,
    dense_attention,
)
from multimodal_organ_segmentation_tpu.ops.sliding_window import (
    gaussian_importance_map,
    sliding_window_inference,
    _scan_starts,
)


class TestResize:
    @pytest.mark.parametrize("out_shape", [(8, 10, 12), (3, 4, 5), (7, 7, 7)])
    def test_linear_matches_scipy(self, out_shape):
        from scipy.ndimage import zoom

        rng = np.random.default_rng(0)
        vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
        factors = [o / i for o, i in zip(out_shape, vol.shape)]
        ref = zoom(vol, factors, order=1)
        assert ref.shape == out_shape
        ours = np.asarray(resize_linear(jnp.asarray(vol), out_shape))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    @pytest.mark.parametrize("out_shape", [(8, 10, 12), (3, 4, 5)])
    def test_nearest_matches_scipy(self, out_shape):
        from scipy.ndimage import zoom

        rng = np.random.default_rng(1)
        vol = rng.integers(0, 8, size=(5, 6, 7)).astype(np.int32)
        factors = [o / i for o, i in zip(out_shape, vol.shape)]
        ref = zoom(vol, factors, order=0)
        ours = np.asarray(resize_nearest(jnp.asarray(vol), out_shape))
        np.testing.assert_array_equal(ours, ref)

    def test_identity(self):
        vol = np.random.default_rng(2).normal(size=(4, 5, 6)).astype(np.float32)
        out = np.asarray(resize_volume(jnp.asarray(vol), (4, 5, 6)))
        np.testing.assert_allclose(out, vol, atol=1e-6)

    def test_batched_channels(self):
        vol = np.random.default_rng(3).normal(size=(2, 8, 8, 8, 3)).astype(np.float32)
        out = resize_linear(jnp.asarray(vol), (4, 4, 4), spatial_axes=(1, 2, 3))
        assert out.shape == (2, 4, 4, 4, 3)


class TestAttention:
    def test_blockwise_equals_dense(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 100, 4, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 100, 4, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 100, 4, 16)).astype(np.float32))
        dense = dense_attention(q, k, v)
        block = blockwise_attention(q, k, v, kv_block=32)
        np.testing.assert_allclose(np.asarray(block), np.asarray(dense), atol=1e-5)

    def test_blockwise_nondivisible(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 37, 2, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 53, 2, 8)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 53, 2, 8)).astype(np.float32))
        dense = dense_attention(q, k, v)
        block = blockwise_attention(q, k, v, kv_block=16)
        np.testing.assert_allclose(np.asarray(block), np.asarray(dense), atol=1e-5)

    def test_torch_parity(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        q = rng.normal(size=(1, 24, 2, 8)).astype(np.float32)
        k = rng.normal(size=(1, 24, 2, 8)).astype(np.float32)
        v = rng.normal(size=(1, 24, 2, 8)).astype(np.float32)
        # reference semantics (attention_fusion.py:144-155): bhdn layout
        qt = torch.tensor(q).permute(0, 2, 3, 1)  # [b,h,d,n]
        kt = torch.tensor(k).permute(0, 2, 3, 1)
        vt = torch.tensor(v).permute(0, 2, 3, 1)
        scale = 8 ** -0.5
        attn = torch.einsum("bhdn,bhdm->bhnm", qt, kt) * scale
        attn = torch.softmax(attn, dim=-1)
        ref = torch.einsum("bhnm,bhdm->bhdn", attn, vt).permute(0, 3, 1, 2).numpy()
        ours = np.asarray(dense_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestSlidingWindow:
    def test_scan_starts(self):
        # dim <= roi -> single tile at 0
        assert _scan_starts(8, 16, 0.5) == [0]
        # 32 long, roi 16, overlap .5 -> interval 8, starts 0..16
        assert _scan_starts(32, 16, 0.5) == [0, 8, 16]
        # non-divisible: final start clamped to dim - roi
        assert _scan_starts(30, 16, 0.5) == [0, 8, 14]

    def test_gaussian_map(self):
        g = gaussian_importance_map((16, 16, 16))
        assert g.shape == (16, 16, 16)
        assert g.max() == pytest.approx(1.0)
        assert g.min() > 0
        # symmetric and peaked in the center region (even size: two centers)
        assert g[7, 7, 7] == pytest.approx(g[8, 8, 8], rel=1e-5)

    def test_equals_whole_volume_when_single_tile(self):
        """Volume == roi: sliding window must equal direct forward."""
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.normal(size=(16, 16, 16, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))

        def predict(patches):
            return jnp.einsum("nhwdc,ck->nhwdk", patches, w)

        out = sliding_window_inference(
            vol, predict, roi_size=(16, 16, 16), num_classes=5
        )
        ref = predict(vol[None])[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_linear_model_tiling_invariance(self):
        """For a voxel-wise (tiling-invariant) model, blended output equals
        the direct forward regardless of tile layout."""
        rng = np.random.default_rng(1)
        vol = jnp.asarray(rng.normal(size=(24, 20, 28, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))

        def predict(patches):
            return jnp.einsum("nhwdc,ck->nhwdk", patches, w)

        for mode in ("gaussian", "constant"):
            out = sliding_window_inference(
                vol, predict, roi_size=(16, 16, 16), num_classes=4,
                overlap=0.5, sw_batch_size=3, mode=mode,
            )
            ref = predict(vol[None])[0]
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-4,
                err_msg=f"mode={mode}",
            )

    def test_batched_volume(self):
        rng = np.random.default_rng(2)
        vol = jnp.asarray(rng.normal(size=(2, 20, 20, 20, 1)).astype(np.float32))

        def predict(patches):
            return jnp.concatenate([patches, -patches], axis=-1)

        out = sliding_window_inference(
            vol, predict, roi_size=(16, 16, 16), num_classes=2
        )
        assert out.shape == (2, 20, 20, 20, 2)

    def test_small_volume_padding(self):
        """Volume smaller than roi gets padded and unpadded correctly."""
        rng = np.random.default_rng(3)
        vol = jnp.asarray(rng.normal(size=(10, 12, 9, 1)).astype(np.float32))

        def predict(patches):
            return patches * 2.0

        out = sliding_window_inference(
            vol, predict, roi_size=(16, 16, 16), num_classes=1
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol) * 2.0, atol=1e-5)


class TestSlidingWindowRunner:
    """Shape bucketing: O(buckets) compiles, bit-parity with the static path."""

    def _predict(self):
        rng = np.random.default_rng(11)
        w = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32))
        return {"w": w}, lambda prm, p: jnp.tanh(
            jnp.einsum("nhwdc,ck->nhwdk", p, prm["w"])
        )

    def test_bucket_shape(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import bucket_shape

        # roi 16, overlap .5 -> interval 8; dims (roi, roi+8k] share a bucket
        assert bucket_shape((10, 16, 17), (16, 16, 16), 0.5) == (16, 16, 24)
        assert bucket_shape((24, 25, 32), (16, 16, 16), 0.5) == (24, 32, 32)

    def test_same_bucket_one_compile_identical_logits(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            SlidingWindowRunner,
        )

        prm, predict = self._predict()
        runner = SlidingWindowRunner(
            predict, roi_size=(16, 16, 16), num_classes=3, overlap=0.5,
            sw_batch_size=3,
        )
        rng = np.random.default_rng(12)
        # 18 and 23 both bucket to 24 on every axis (tile counts match)
        for shape in ((18, 23, 20), (23, 18, 24)):
            vol = jnp.asarray(rng.normal(size=(*shape, 1)).astype(np.float32))
            out = runner(vol, prm)
            assert out.shape == (*shape, 3)
            ref = sliding_window_inference(
                vol, lambda p: predict(prm, p), roi_size=(16, 16, 16),
                num_classes=3, overlap=0.5, sw_batch_size=3,
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5,
                err_msg=f"shape={shape}",
            )
        assert runner.num_compiled == 1  # both shapes share one program

    def test_different_bucket_new_program(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            SlidingWindowRunner,
        )

        prm, predict = self._predict()
        runner = SlidingWindowRunner(
            predict, roi_size=(16, 16, 16), num_classes=3, sw_batch_size=4
        )
        rng = np.random.default_rng(13)
        runner(jnp.asarray(rng.normal(size=(20, 20, 20, 1)).astype(np.float32)), prm)
        runner(jnp.asarray(rng.normal(size=(40, 20, 20, 1)).astype(np.float32)), prm)
        assert runner.num_compiled == 2


class TestAutoSwBatch:
    """Divisor-search chunk sizing: minimal padded slots, then largest chunk."""

    def test_policy(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            auto_sw_batch_size,
        )

        # the flagship case: 45 tiles, cap 16 → 15 (0 padded beats 3 padded)
        assert auto_sw_batch_size(45, 16) == 15
        # 36 tiles: 12 divides exactly within the slack window
        assert auto_sw_batch_size(36, 16) == 12
        # exact fit keeps the cap
        assert auto_sw_batch_size(48, 16) == 16
        # fewer tiles than the cap: clamp to n (one exact chunk, zero waste)
        assert auto_sw_batch_size(5, 8) == 5
        assert auto_sw_batch_size(1, 16) == 1
        assert auto_sw_batch_size(8, 16) == 8
        # nothing divides: least-waste candidate wins (27 → 14: 1 padded)
        assert auto_sw_batch_size(27, 16) == 14

    def test_policy_mesh(self):
        """With a data mesh the chunk count rounds up to the mesh size, so
        the waste metric must include that rounding."""
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            auto_sw_batch_size,
        )

        # 45 tiles on 8 devices: sw 6 → 8 chunks (48 slots, 3 padded);
        # the single-device pick (15) would round 3 chunks → 8 (75 padded)
        assert auto_sw_batch_size(45, 16, chunk_multiple=8) == 6
        # 100 tiles on 2 devices: sw 10 → 10 chunks, zero waste
        assert auto_sw_batch_size(100, 16, chunk_multiple=2) == 10
        # fewer tiles than devices: sw 1, padding is unavoidable
        assert auto_sw_batch_size(3, 16, chunk_multiple=8) == 1

    def test_resolve(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            resolve_sw_batch,
            tile_count,
        )

        roi, ov = (96, 96, 96), 0.5
        assert tile_count((192, 192, 256), roi, ov) == 45
        assert resolve_sw_batch("auto", (192, 192, 256), roi, ov) == 15
        assert resolve_sw_batch("auto:8", (192, 192, 256), roi, ov) == 5
        assert resolve_sw_batch(7, (192, 192, 256), roi, ov) == 7
        assert resolve_sw_batch(None, (192, 192, 256), roi, ov, default=4) == 4
        # mesh-aware: the chunk multiple reshapes the waste landscape
        assert (
            resolve_sw_batch("auto", (192, 192, 256), roi, ov, chunk_multiple=8)
            == 6
        )

    def test_runner_accepts_auto(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            SlidingWindowRunner,
        )

        rng = np.random.default_rng(11)
        w = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32))
        prm = {"w": w}
        predict = lambda p, x: jnp.tanh(jnp.einsum("nhwdc,ck->nhwdk", x, p["w"]))
        runner = SlidingWindowRunner(
            predict, roi_size=(16, 16, 16), num_classes=3, overlap=0.5,
            sw_batch_size="auto:4",
        )
        # 32^3 / roi 16 / overlap 0.5 → 3 starts per axis = 27 tiles;
        # auto:4 must pick sw 3 (27 % 3 == 0; sw 4 pads 1 slot)
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            resolve_sw_batch,
            tile_count,
        )

        assert tile_count((32, 32, 32), (16, 16, 16), 0.5) == 27
        assert resolve_sw_batch("auto:4", (32, 32, 32), (16, 16, 16), 0.5) == 3
        vol = jnp.asarray(rng.normal(size=(32, 32, 32, 1)).astype(np.float32))
        out = runner(vol, prm)
        ref = sliding_window_inference(
            vol, lambda x: predict(prm, x), roi_size=(16, 16, 16),
            num_classes=3, overlap=0.5, sw_batch_size=3,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestSlidingWindowBatchInvariance:
    def test_output_independent_of_sw_batch(self):
        """Blended logits must be identical for any sw_batch_size, even when
        tile padding occurs and the model is non-linear (a padded duplicate
        tile must contribute zero weight)."""
        rng = np.random.default_rng(7)
        vol = jnp.asarray(rng.normal(size=(24, 24, 24, 1)).astype(np.float32))

        def predict(p):
            # non-linear so double-counting a tile would change the blend
            return jnp.concatenate([jnp.tanh(p) ** 2 + p, -p], axis=-1)

        ref = sliding_window_inference(
            vol, predict, roi_size=(16, 16, 16), num_classes=2,
            overlap=0.5, sw_batch_size=1,
        )
        for swb in (3, 4, 16):
            out = sliding_window_inference(
                vol, predict, roi_size=(16, 16, 16), num_classes=2,
                overlap=0.5, sw_batch_size=swb,
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5,
                err_msg=f"sw_batch_size={swb}",
            )


class TestPostprocess:
    """Largest-connected-component filtering (inference.postprocess)."""

    def _mask(self):
        m = np.zeros((16, 16, 16), np.uint8)
        m[2:8, 2:8, 2:8] = 1       # class 1: big blob (216 vox)
        m[12:14, 12:14, 12:14] = 1  # class 1: island (8 vox)
        m[10:13, 2:5, 2:5] = 2     # class 2: single blob
        return m

    def test_keeps_largest_per_class(self):
        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            keep_largest_components,
        )

        out = keep_largest_components(self._mask())
        assert out[3, 3, 3] == 1          # big blob kept
        assert out[12, 12, 12] == 0       # island removed
        assert out[11, 3, 3] == 2         # other class untouched
        assert (out == 1).sum() == 6 ** 3

    def test_min_voxels_drops_tiny_class(self):
        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            keep_largest_components,
        )

        out = keep_largest_components(self._mask(), min_voxels=100)
        assert (out == 1).sum() == 6 ** 3   # 216 ≥ 100: kept
        assert (out == 2).sum() == 0        # 27 < 100: dropped

    def test_classes_restriction_and_purity(self):
        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            keep_largest_components,
        )

        m = self._mask()
        before = m.copy()
        out = keep_largest_components(m, classes=[2])
        np.testing.assert_array_equal(m, before)  # input untouched
        assert out[12, 12, 12] == 1               # class 1 not filtered

    def test_config_gate(self):
        from multimodal_organ_segmentation_tpu.ops.postprocess import (
            postprocess_from_config,
        )
        from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

        m = self._mask()
        off = postprocess_from_config(m, ConfigNode({}))
        np.testing.assert_array_equal(off, m)  # default: no-op
        on = postprocess_from_config(
            m,
            ConfigNode({"inference": {"postprocess": {"largest_component": True}}}),
        )
        assert on[12, 12, 12] == 0
