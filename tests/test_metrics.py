"""Metric parity tests vs the PyTorch reference implementation."""

import sys

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.train.metrics import (
    ConfusionMatrix,
    DiceMetric,
    HausdorffDistance,
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


def test_get_metrics_factory():
    cfg = ConfigNode({"model": {"out_channels": 8}})
    metrics = get_metrics(cfg)
    assert isinstance(metrics["dice"], DiceMetric)
    assert isinstance(metrics["confusion"], ConfusionMatrix)
    assert metrics["dice"].num_classes == 8
