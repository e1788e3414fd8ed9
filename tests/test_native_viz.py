"""Tests for the native EDT kernel and visualization utils."""

from pathlib import Path

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.ops.edt import distance_transform_edt
from multimodal_organ_segmentation_tpu.utils.visualization import Visualizer


class TestNativeEDT:
    @pytest.mark.parametrize(
        "shape,sampling",
        [((16, 16, 16), (1, 1, 1)), ((12, 20, 9), (1.5, 1.5, 2.0))],
    )
    def test_matches_scipy(self, shape, sampling):
        from scipy.ndimage import distance_transform_edt as scipy_edt

        rng = np.random.default_rng(0)
        x = (rng.random(shape) > 0.1).astype(np.uint8)  # sparse zero seeds
        ref = scipy_edt(x, sampling=sampling)
        ours = distance_transform_edt(x, sampling=sampling)
        np.testing.assert_allclose(ours, ref, atol=1e-9)

    def test_all_foreground(self):
        x = np.ones((8, 8, 8), np.uint8)  # no zero voxels anywhere
        out = distance_transform_edt(x)
        assert np.all(np.isinf(out))

    def test_all_zero(self):
        x = np.zeros((8, 8, 8), np.uint8)
        out = distance_transform_edt(x)
        np.testing.assert_allclose(out, 0.0)

    def test_hausdorff_uses_it(self):
        from multimodal_organ_segmentation_tpu.train.metrics import HausdorffDistance

        rng = np.random.default_rng(1)
        pred = (rng.random((1, 12, 12, 12)) > 0.7).astype(np.int64)
        target = (rng.random((1, 12, 12, 12)) > 0.7).astype(np.int64)
        m = HausdorffDistance()
        m.update(pred, target)
        r = m.compute()
        assert np.isfinite(r["hausdorff_distance"])


class TestVisualizer:
    def test_plot_slice(self, tmp_path):
        viz = Visualizer(tmp_path)
        out = viz.plot_slice(np.random.rand(16, 16, 16), save_path="s.png")
        assert Path(out).stat().st_size > 500

    def test_plot_multimodal(self, tmp_path):
        viz = Visualizer(tmp_path)
        out = viz.plot_multimodal(
            {"CT": np.random.rand(8, 8, 8), "PET": np.random.rand(8, 8, 8)},
            save_path="m.png",
        )
        assert Path(out).exists()

    def test_plot_segmentation(self, tmp_path):
        viz = Visualizer(tmp_path)
        img = np.random.rand(16, 16, 16)
        lbl = np.random.randint(0, 8, (16, 16, 16))
        out = viz.plot_segmentation(img, lbl, save_path="seg.png")
        assert Path(out).exists()

    def test_training_curves(self, tmp_path):
        viz = Visualizer(tmp_path)
        hist = {"train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6], "val_dice": [0.2, 0.4]}
        out = viz.plot_training_curves(hist, save_path="curves.png")
        assert Path(out).exists()

    def test_confusion_matrix(self, tmp_path):
        viz = Visualizer(tmp_path)
        m = np.random.randint(0, 100, (8, 8))
        out = viz.plot_confusion_matrix(m, save_path="cm.png")
        assert Path(out).exists()

    def test_montage(self):
        vol = np.random.rand(16, 16, 16)
        m = Visualizer.create_montage(vol, n_slices=8, cols=4)
        assert m.shape == (2 * 16, 4 * 16)

    def test_label_to_rgb(self):
        viz = Visualizer()
        lbl = np.array([[0, 1], [5, 7]])
        rgb = viz.label_to_rgb(lbl)
        assert rgb.shape == (2, 2, 3)
        np.testing.assert_allclose(rgb[0, 0], (0, 0, 0))
