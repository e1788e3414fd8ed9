"""Loss parity tests vs the PyTorch reference implementation.

The reference repo is imported read-only (it's the spec); our JAX losses
must match its numbers on random tensors. Layout differs: reference is
[B, C, H, W, D], ours is [B, H, W, D, C].
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.train import losses as L
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from src.trainer import losses as ref_losses  # noqa: E402


def _rand(shape_bchwd=(2, 4, 6, 5, 7), n_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=shape_bchwd).astype(np.float32)
    labels = rng.integers(0, n_classes, size=(shape_bchwd[0],) + shape_bchwd[2:])
    # ours: channels-last
    logits_cl = np.moveaxis(logits, 1, -1)
    return logits, labels.astype(np.int64), logits_cl


@pytest.mark.parametrize("include_background", [True, False])
def test_dice_loss_parity(include_background):
    logits, labels, logits_cl = _rand()
    ref = ref_losses.DiceLoss(include_background=include_background)(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    ours = float(
        L.dice_loss(
            jnp.asarray(logits_cl), jnp.asarray(labels), include_background=include_background
        )
    )
    assert ours == pytest.approx(ref, abs=1e-5)


def test_ce_loss_parity():
    logits, labels, logits_cl = _rand()
    ref = torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(labels)).item()
    ours = float(L.cross_entropy_loss(jnp.asarray(logits_cl), jnp.asarray(labels)))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_ce_loss_weighted_parity():
    logits, labels, logits_cl = _rand()
    w = np.array([0.2, 1.0, 2.0, 0.5], dtype=np.float32)
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    ours = float(
        L.cross_entropy_loss(jnp.asarray(logits_cl), jnp.asarray(labels), class_weights=w)
    )
    assert ours == pytest.approx(ref, abs=1e-5)


def test_focal_loss_parity():
    logits, labels, logits_cl = _rand()
    ref = ref_losses.FocalLoss()(torch.tensor(logits), torch.tensor(labels)).item()
    ours = float(L.focal_loss(jnp.asarray(logits_cl), jnp.asarray(labels)))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_tversky_loss_parity():
    logits, labels, logits_cl = _rand()
    ref = ref_losses.TverskyLoss(alpha=0.3, beta=0.7)(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    ours = float(
        L.tversky_loss(jnp.asarray(logits_cl), jnp.asarray(labels), alpha=0.3, beta=0.7)
    )
    assert ours == pytest.approx(ref, abs=1e-5)


def test_dice_ce_loss_parity():
    logits, labels, logits_cl = _rand()
    ref = ref_losses.DiceCELoss(dice_weight=0.6, ce_weight=0.4)(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    ours = float(
        L.dice_ce_loss(
            jnp.asarray(logits_cl), jnp.asarray(labels), dice_weight=0.6, ce_weight=0.4
        )
    )
    assert ours == pytest.approx(ref, abs=1e-5)


@pytest.mark.parametrize(
    "name", ["dice", "ce", "dice_ce", "focal", "tversky", "unknown_falls_back"]
)
def test_get_loss_factory(name):
    cfg = ConfigNode(
        {"training": {"loss": {"name": name, "dice_weight": 0.5, "ce_weight": 0.5}}}
    )
    fn = L.get_loss(cfg)
    logits, labels, logits_cl = _rand()
    val = float(fn(jnp.asarray(logits_cl), jnp.asarray(labels)))
    assert np.isfinite(val) and val > 0


def test_losses_differentiable():
    import jax

    logits, labels, logits_cl = _rand()
    for fn in [
        lambda x: L.dice_loss(x, jnp.asarray(labels)),
        lambda x: L.cross_entropy_loss(x, jnp.asarray(labels)),
        lambda x: L.focal_loss(x, jnp.asarray(labels)),
        lambda x: L.tversky_loss(x, jnp.asarray(labels)),
    ]:
        g = jax.grad(fn)(jnp.asarray(logits_cl))
        assert np.all(np.isfinite(np.asarray(g)))
