"""Metric parity tests vs the PyTorch reference implementation."""

import sys

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.train.metrics import (
    ConfusionMatrix,
    DiceMetric,
    HausdorffDistance,
    SurfaceDice,
    get_metrics,
)
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from src.trainer import metrics as ref_metrics  # noqa: E402


def _rand_preds(n_classes=4, shape=(2, 8, 7, 6), seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.integers(0, n_classes, size=shape).astype(np.int64)
    target = rng.integers(0, n_classes, size=shape).astype(np.int64)
    return pred, target


def test_dice_metric_parity():
    pred, target = _rand_preds()
    ref = ref_metrics.DiceMetric(num_classes=4)
    ref.update(torch.tensor(pred), torch.tensor(target))
    ref.update(torch.tensor(target), torch.tensor(target))  # second batch
    ref_result = ref.compute()

    ours = DiceMetric(num_classes=4)
    ours.update(pred, target)
    ours.update(target, target)
    result = ours.compute()

    assert result["dice"] == pytest.approx(ref_result["dice"], abs=1e-5)
    np.testing.assert_allclose(
        result["dice_per_class"], ref_result["dice_per_class"], atol=1e-5
    )


def test_dice_metric_perfect():
    pred, _ = _rand_preds()
    m = DiceMetric(num_classes=4)
    m.update(pred, pred)
    assert m.compute()["dice"] == pytest.approx(1.0, abs=1e-4)


def test_confusion_matrix_parity():
    pred, target = _rand_preds()
    ref = ref_metrics.ConfusionMatrix(num_classes=4)
    ref.update(torch.tensor(pred), torch.tensor(target))
    ref_result = ref.compute()

    ours = ConfusionMatrix(num_classes=4)
    ours.update(pred, target)
    result = ours.compute()

    np.testing.assert_array_equal(
        result["confusion_matrix"], ref_result["confusion_matrix"]
    )
    assert result["accuracy"] == pytest.approx(ref_result["accuracy"], abs=1e-8)
    assert result["f1"] == pytest.approx(ref_result["f1"], abs=1e-8)


def test_hausdorff_parity():
    rng = np.random.default_rng(1)
    pred = (rng.random((1, 16, 16, 16)) > 0.7).astype(np.int64)
    target = (rng.random((1, 16, 16, 16)) > 0.7).astype(np.int64)

    ref = ref_metrics.HausdorffDistance(percentile=95)
    ref.update(torch.tensor(pred), torch.tensor(target))
    ref_result = ref.compute()

    ours = HausdorffDistance(percentile=95)
    ours.update(pred, target)
    result = ours.compute()

    assert result["hausdorff_distance"] == pytest.approx(
        ref_result["hausdorff_distance"], abs=1e-6
    )


def test_hausdorff_empty():
    m = HausdorffDistance()
    m.update(np.zeros((1, 4, 4, 4)), np.ones((1, 4, 4, 4)))
    assert m.compute()["hausdorff_distance"] == float("inf")


class TestSurfaceDice:
    """NSD semantics (DeepMind surface-distance protocol); the reference
    has no surface metric, so these are behavioral contracts, not parity."""

    def _cube(self, shape=(16, 16, 16), lo=4, hi=10, shift=0):
        m = np.zeros((1,) + shape, np.int64)
        m[0, lo + shift : hi + shift, lo:hi, lo:hi] = 1
        return m

    def test_identical_masks_score_one(self):
        m = SurfaceDice(num_classes=2, tolerance_mm=1.0)
        cube = self._cube()
        m.update(cube, cube)
        assert m.compute()["surface_dice"] == pytest.approx(1.0)

    def test_one_voxel_shift_within_tolerance(self):
        m = SurfaceDice(num_classes=2, tolerance_mm=1.0)
        m.update(self._cube(shift=1), self._cube())
        assert m.compute()["surface_dice"] == pytest.approx(1.0)

    def test_one_voxel_shift_beyond_tight_tolerance(self):
        m = SurfaceDice(num_classes=2, tolerance_mm=0.5)
        m.update(self._cube(shift=1), self._cube())
        s = m.compute()["surface_dice"]
        assert 0.0 < s < 1.0

    def test_spacing_scales_distances(self):
        # 1-voxel shift at 2 mm spacing = 2 mm surface distance
        tight = SurfaceDice(num_classes=2, tolerance_mm=1.0)
        tight.update(self._cube(shift=1), self._cube(), spacing=(2.0, 2.0, 2.0))
        loose = SurfaceDice(num_classes=2, tolerance_mm=2.0)
        loose.update(self._cube(shift=1), self._cube(), spacing=(2.0, 2.0, 2.0))
        assert tight.compute()["surface_dice"] < 1.0
        assert loose.compute()["surface_dice"] == pytest.approx(1.0)

    def test_missed_structure_scores_zero(self):
        m = SurfaceDice(num_classes=2, tolerance_mm=1.0)
        m.update(np.zeros((1, 16, 16, 16), np.int64), self._cube())
        assert m.compute()["surface_dice"] == 0.0

    def test_absent_class_is_not_scored(self):
        # class 2 appears in neither volume → nan per-class, excluded from mean
        m = SurfaceDice(num_classes=3, tolerance_mm=1.0)
        cube = self._cube()
        m.update(cube, cube)
        out = m.compute()
        assert np.isnan(out["surface_dice_per_class"][2])
        assert out["surface_dice"] == pytest.approx(1.0)

    def test_brute_force_cross_check(self):
        """EDT-based NSD == brute-force pairwise surface distances on a
        random small mask (independent of the EDT implementation)."""
        rng = np.random.default_rng(7)
        pred = np.zeros((10, 10, 10), bool)
        gt = np.zeros((10, 10, 10), bool)
        pred[2:7, 3:8, 2:6] = True
        gt[3:8, 2:7, 3:7] = True
        # roughen the surfaces
        for m in (pred, gt):
            idx = rng.integers(2, 8, size=(6, 3))
            for i, j, k in idx:
                m[i, j, k] ^= True
        spacing = (1.0, 1.5, 2.0)
        tol = 2.0

        from multimodal_organ_segmentation_tpu.train.metrics import (
            _boundary_voxels,
        )

        bp = np.argwhere(_boundary_voxels(pred)).astype(np.float64) * spacing
        bg = np.argwhere(_boundary_voxels(gt)).astype(np.float64) * spacing
        d_pg = np.sqrt(((bp[:, None] - bg[None]) ** 2).sum(-1)).min(1)
        d_gp = np.sqrt(((bg[:, None] - bp[None]) ** 2).sum(-1)).min(1)
        expected = ((d_pg <= tol).sum() + (d_gp <= tol).sum()) / (
            len(bp) + len(bg)
        )

        m = SurfaceDice(num_classes=2, tolerance_mm=tol)
        m.update(
            pred[None].astype(np.int64), gt[None].astype(np.int64),
            spacing=spacing,
        )
        assert m.compute()["surface_dice"] == pytest.approx(expected, abs=1e-9)

    def test_multiclass_mean(self):
        # class 1 perfect, class 2 missed entirely → mean 0.5
        pred = self._cube()
        target = self._cube()
        target[0, 12:14, 12:14, 12:14] = 2
        m = SurfaceDice(num_classes=3, tolerance_mm=0.5)
        m.update(pred, target)
        out = m.compute()
        assert out["surface_dice_per_class"][1] == pytest.approx(1.0)
        assert out["surface_dice_per_class"][2] == 0.0
        assert out["surface_dice"] == pytest.approx(0.5)


class TestAverageSurfaceDistance:
    """ASSD semantics (symmetric mean surface distance, mm). The reference
    has no surface metric, so these are behavioral contracts, not parity."""

    def _cube(self, shape=(16, 16, 16), lo=4, hi=10, shift=0):
        m = np.zeros((1,) + shape, np.int64)
        m[0, lo + shift : hi + shift, lo:hi, lo:hi] = 1
        return m

    def test_identical_masks_score_zero(self):
        from multimodal_organ_segmentation_tpu.train.metrics import (
            AverageSurfaceDistance,
        )

        m = AverageSurfaceDistance(num_classes=2)
        cube = self._cube()
        m.update(cube, cube)
        assert m.compute()["assd"] == pytest.approx(0.0)

    def test_shift_increases_distance_and_spacing_scales_it(self):
        from multimodal_organ_segmentation_tpu.train.metrics import (
            AverageSurfaceDistance,
        )

        unit = AverageSurfaceDistance(num_classes=2)
        unit.update(self._cube(shift=1), self._cube())
        a = unit.compute()["assd"]
        assert 0.0 < a <= 1.0  # a 1-voxel shift moves surfaces ≤ 1 mm

        scaled = AverageSurfaceDistance(num_classes=2)
        scaled.update(
            self._cube(shift=1), self._cube(), spacing=(2.0, 2.0, 2.0)
        )
        assert scaled.compute()["assd"] == pytest.approx(2.0 * a, rel=1e-9)

    def test_one_sided_miss_is_skipped(self):
        from multimodal_organ_segmentation_tpu.train.metrics import (
            AverageSurfaceDistance,
        )

        m = AverageSurfaceDistance(num_classes=2)
        m.update(np.zeros((1, 16, 16, 16), np.int64), self._cube())
        assert np.isnan(m.compute()["assd"])

    def test_brute_force_cross_check(self):
        """EDT-based ASSD == brute-force pairwise surface distances."""
        rng = np.random.default_rng(7)
        pred = np.zeros((10, 10, 10), bool)
        gt = np.zeros((10, 10, 10), bool)
        pred[2:7, 3:8, 2:6] = True
        gt[3:8, 2:7, 3:7] = True
        for m in (pred, gt):
            idx = rng.integers(2, 8, size=(6, 3))
            for i, j, k in idx:
                m[i, j, k] ^= True
        spacing = (1.0, 1.5, 2.0)

        from multimodal_organ_segmentation_tpu.train.metrics import (
            AverageSurfaceDistance,
            _boundary_voxels,
        )

        bp = np.argwhere(_boundary_voxels(pred)).astype(np.float64) * spacing
        bg = np.argwhere(_boundary_voxels(gt)).astype(np.float64) * spacing
        d_pg = np.sqrt(((bp[:, None] - bg[None]) ** 2).sum(-1)).min(1)
        d_gp = np.sqrt(((bg[:, None] - bp[None]) ** 2).sum(-1)).min(1)
        expected = (d_pg.sum() + d_gp.sum()) / (len(bp) + len(bg))

        m = AverageSurfaceDistance(num_classes=2)
        m.update(
            pred[None].astype(np.int64), gt[None].astype(np.int64),
            spacing=spacing,
        )
        assert m.compute()["assd"] == pytest.approx(expected, abs=1e-9)

    def test_distance_cache_shared_with_nsd(self):
        """NSD and ASSD fed the same cache compute the EDT pair once and
        produce the same scores as uncached runs."""
        from multimodal_organ_segmentation_tpu.train import metrics as M

        pred, gt = self._cube(shift=1), self._cube()

        calls = []
        orig = M._distance_transform

        def counting(mask, spacing):
            calls.append(1)
            return orig(mask, spacing)

        cache: dict = {}
        nsd_c = M.SurfaceDice(num_classes=2, tolerance_mm=0.5)
        assd_c = M.AverageSurfaceDistance(num_classes=2)
        try:
            M._distance_transform = counting
            nsd_c.update(pred, gt, distance_cache=cache)
            assd_c.update(pred, gt, distance_cache=cache)
        finally:
            M._distance_transform = orig
        assert len(calls) == 2  # one EDT per direction, shared by both

        nsd_u = M.SurfaceDice(num_classes=2, tolerance_mm=0.5)
        assd_u = M.AverageSurfaceDistance(num_classes=2)
        nsd_u.update(pred, gt)
        assd_u.update(pred, gt)
        assert nsd_c.compute()["surface_dice"] == pytest.approx(
            nsd_u.compute()["surface_dice"]
        )
        assert assd_c.compute()["assd"] == pytest.approx(
            assd_u.compute()["assd"]
        )


class TestLesionDetection:
    """Per-lesion TP/FP/FN semantics (autoPET-style component matching).
    The reference has no detection metric — behavioral contracts only."""

    def _make(self, **kw):
        from multimodal_organ_segmentation_tpu.train.metrics import (
            LesionDetectionMetric,
        )

        return LesionDetectionMetric(num_classes=2, **kw)

    def _vol(self, *blobs, shape=(20, 20, 20), cls=1):
        v = np.zeros((1,) + shape, np.int64)
        for (z, y, x), r in blobs:
            v[0, z : z + r, y : y + r, x : x + r] = cls
        return v

    def test_perfect_detection(self):
        m = self._make()
        gt = self._vol(((2, 2, 2), 3), ((10, 10, 10), 4))
        m.update(gt, gt)
        out = m.compute()
        assert out["lesion_tp"] == 2 and out["lesion_fp"] == 0
        assert out["lesion_f1"] == pytest.approx(1.0)

    def test_missed_lesion_and_false_positive(self):
        m = self._make()
        gt = self._vol(((2, 2, 2), 3), ((10, 10, 10), 4))
        pred = self._vol(((2, 2, 2), 3), ((15, 15, 15), 3))  # hits 1, invents 1
        rows = m.update(pred, gt)
        out = m.compute()
        assert (out["lesion_tp"], out["lesion_fp"], out["lesion_fn"]) == (1, 1, 1)
        assert out["lesion_precision"] == pytest.approx(0.5)
        assert out["lesion_recall"] == pytest.approx(0.5)
        assert rows[0] == {"lesion_tp": 1, "lesion_fp": 1, "lesion_fn": 1}

    def test_overlap_threshold(self):
        # pred covers 1 of 27 voxels of the GT lesion: detected at the
        # any-overlap default, missed at a 50% requirement
        gt = self._vol(((5, 5, 5), 3))
        pred = self._vol(((5, 5, 5), 1))
        loose = self._make()
        loose.update(pred, gt)
        assert loose.compute()["lesion_tp"] == 1
        strict = self._make(overlap_threshold=0.5)
        strict.update(pred, gt)
        out = strict.compute()
        # the under-covering pred component touches GT, so it's not an FP
        assert (out["lesion_tp"], out["lesion_fp"], out["lesion_fn"]) == (0, 0, 1)

    def test_one_pred_component_spanning_two_gt_lesions(self):
        # a single merged prediction detects both lesions, no FP
        gt = self._vol(((5, 5, 5), 2), ((5, 5, 9), 2))
        pred = np.zeros_like(gt)
        pred[0, 5:7, 5:7, 5:11] = 1  # bridge across both
        m = self._make()
        m.update(pred, gt)
        out = m.compute()
        assert (out["lesion_tp"], out["lesion_fp"], out["lesion_fn"]) == (2, 0, 0)

    def test_empty_case_is_nan(self):
        m = self._make()
        z = np.zeros((1, 8, 8, 8), np.int64)
        m.update(z, z)
        assert np.isnan(m.compute()["lesion_f1"])

    def test_classes_restriction(self):
        from multimodal_organ_segmentation_tpu.train.metrics import (
            LesionDetectionMetric,
        )

        gt = self._vol(((2, 2, 2), 3), cls=1) + self._vol(((10, 10, 10), 3), cls=2)
        pred = self._vol(((2, 2, 2), 3), cls=1)  # class 2 entirely missed
        m = LesionDetectionMetric(num_classes=3, classes=[1])
        m.update(pred, gt)
        out = m.compute()
        assert out["lesion_f1"] == pytest.approx(1.0)  # class 2 not scored
        assert np.isnan(out["lesion_f1_per_class"][2])


class TestCalibrationError:
    """Voxel-level ECE semantics (Guo et al. binning). The reference has
    no calibration readout — behavioral contracts only."""

    def _make(self, n_bins=10):
        from multimodal_organ_segmentation_tpu.train.metrics import (
            CalibrationError,
        )

        return CalibrationError(n_bins=n_bins)

    def _probs(self, conf, n, c=4):
        """n voxels, all with max-class confidence ``conf`` on class 0."""
        p = np.full((n, c), (1.0 - conf) / (c - 1), np.float32)
        p[:, 0] = conf
        return p

    def test_perfect_confidence_and_accuracy(self):
        m = self._make()
        m.update(self._probs(1.0, 64), np.zeros(64, np.int32))
        assert m.compute()["ece"] == pytest.approx(0.0, abs=1e-6)

    def test_overconfident_model(self):
        # confidence 1.0 everywhere, half the voxels wrong → ECE 0.5
        m = self._make()
        labels = np.zeros(64, np.int32)
        labels[32:] = 1
        m.update(self._probs(1.0, 64), labels)
        assert m.compute()["ece"] == pytest.approx(0.5, abs=1e-6)

    def test_calibrated_bin(self):
        # confidence 0.75 with 75% empirical accuracy → gap 0 in its bin
        m = self._make()
        labels = np.zeros(64, np.int32)
        labels[48:] = 1  # 25% wrong
        case = m.update(self._probs(0.75, 64), labels)
        assert case == pytest.approx(0.0, abs=1e-6)
        assert m.compute()["ece"] == pytest.approx(0.0, abs=1e-6)

    def test_pooled_equals_weighted_cases(self):
        # cohort ECE pools bins across cases (not a mean of case ECEs):
        # two single-bin cases with gaps 0.25 and 0.05 in DIFFERENT bins
        # pool to (64·0.25 + 192·0.05) / 256
        m = self._make()
        l1 = np.zeros(64, np.int32); l1[32:] = 1          # acc .5 @ conf .75
        l2 = np.zeros(192, np.int32); l2[96:] = 1         # acc .5 @ conf .55
        m.update(self._probs(0.75, 64), l1)
        m.update(self._probs(0.55, 192), l2)
        expected = (64 * 0.25 + 192 * 0.05) / 256
        assert m.compute()["ece"] == pytest.approx(expected, abs=1e-6)

    def test_empty_is_nan(self):
        assert np.isnan(self._make().compute()["ece"])


def test_get_metrics_factory():
    cfg = ConfigNode({"model": {"out_channels": 8}})
    metrics = get_metrics(cfg)
    assert isinstance(metrics["dice"], DiceMetric)
    assert isinstance(metrics["confusion"], ConfusionMatrix)
    assert metrics["dice"].num_classes == 8
