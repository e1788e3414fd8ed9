"""Segmentation losses as pure JAX functions.

Numerical contracts match the reference (src/trainer/losses.py):

- ``dice_loss``     — softmax + one-hot + (2∩+s)/(∪+s), smooth=1.0, background
                      included by default, mean over (batch, class)
                      (losses.py:12-80).
- ``cross_entropy`` — torch ``nn.CrossEntropyLoss`` semantics incl. the
                      weighted-mean normalization by Σw over target voxels.
- ``focal_loss``    — CE → pt=exp(−CE) → (1−pt)^γ·CE, γ=2 (losses.py:83-125).
- ``tversky_loss``  — TP/(TP+αFP+βFN), α=β=0.5 (losses.py:128-185).
- ``dice_ce_loss``  — 0.5/0.5 weighted combo (losses.py:188-228).

Layout: logits are channels-last ``[B, H, W, D, C]`` (TPU-native NDHWC);
labels are integer ``[B, H, W, D]``. All functions are jit-able and
differentiable; reductions happen in fp32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _at_least_f32(x: jax.Array) -> jax.Array:
    """Cast up to f32 for reductions, preserving f64 under jax x64 —
    the float64 step-parity test (test_step_parity.py) pins the update
    math at ~1e-16 through this path."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def _one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    smooth: float = 1.0,
    include_background: bool = True,
    apply_softmax: bool = True,
    reduction: str = "mean",
) -> jax.Array:
    """Soft Dice loss over ``[B, ..., C]`` logits and integer labels."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(_at_least_f32(logits), axis=-1) if apply_softmax else (
        _at_least_f32(logits)
    )
    target = _one_hot(labels, num_classes)

    if not include_background:
        probs = probs[..., 1:]
        target = target[..., 1:]

    # Flatten spatial dims: [B, N, C]
    b, c = probs.shape[0], probs.shape[-1]
    probs_flat = probs.reshape(b, -1, c)
    target_flat = target.reshape(b, -1, c)

    intersection = jnp.sum(probs_flat * target_flat, axis=1)  # [B, C]
    union = jnp.sum(probs_flat, axis=1) + jnp.sum(target_flat, axis=1)

    dice = (2.0 * intersection + smooth) / (union + smooth)
    loss = 1.0 - dice
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    reduction: str = "mean",
) -> jax.Array:
    """Softmax cross entropy with torch-compatible weighted-mean reduction."""
    logp = jax.nn.log_softmax(_at_least_f32(logits), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    nll = nll[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=jnp.float32)[labels]
        nll = nll * w
        if reduction == "mean":
            return jnp.sum(nll) / jnp.maximum(jnp.sum(w), 1e-12)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    gamma: float = 2.0,
    alpha: Optional[jax.Array] = None,
    reduction: str = "mean",
) -> jax.Array:
    """Focal loss; ``alpha`` maps to torch CE's per-class ``weight``."""
    ce = cross_entropy_loss(logits, labels, class_weights=None, reduction="none")
    if alpha is not None:
        w = jnp.asarray(alpha, dtype=jnp.float32)[labels]
        ce = ce * w
    pt = jnp.exp(-ce)
    fl = (1.0 - pt) ** gamma * ce
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def tversky_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.5,
    beta: float = 0.5,
    smooth: float = 1.0,
    reduction: str = "mean",
) -> jax.Array:
    """Tversky loss (generalized Dice with FP/FN control)."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(_at_least_f32(logits), axis=-1)
    target = _one_hot(labels, num_classes)

    b, c = probs.shape[0], probs.shape[-1]
    p = probs.reshape(b, -1, c)
    t = target.reshape(b, -1, c)

    tp = jnp.sum(p * t, axis=1)
    fp = jnp.sum(p * (1.0 - t), axis=1)
    fn = jnp.sum((1.0 - p) * t, axis=1)

    tversky = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    loss = 1.0 - tversky
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def dice_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    dice_weight: float = 0.5,
    ce_weight: float = 0.5,
    class_weights: Optional[jax.Array] = None,
    include_background: bool = True,
) -> jax.Array:
    """Weighted Dice + CE combination."""
    d = dice_loss(logits, labels, include_background=include_background)
    ce = cross_entropy_loss(logits, labels, class_weights=class_weights)
    return dice_weight * d + ce_weight * ce


LossFn = Callable[[jax.Array, jax.Array], jax.Array]


def get_loss(config) -> LossFn:
    """Loss factory keyed by ``training.loss.name``
    (reference: losses.py:231-267). Returns a jit-able closure."""
    loss_cfg = config.get("training.loss", {}) or {}
    name = str(loss_cfg.get("name", "dice_ce")).lower()

    cw = loss_cfg.get("class_weights")
    class_weights = jnp.asarray(cw, dtype=jnp.float32) if cw is not None else None

    if name == "dice":
        return lambda logits, labels: dice_loss(logits, labels)
    if name in ("ce", "cross_entropy"):
        return lambda logits, labels: cross_entropy_loss(
            logits, labels, class_weights=class_weights
        )
    if name == "focal":
        return lambda logits, labels: focal_loss(logits, labels, alpha=class_weights)
    if name == "tversky":
        a = float(loss_cfg.get("tversky_alpha", 0.5))
        b = float(loss_cfg.get("tversky_beta", 0.5))
        return lambda logits, labels: tversky_loss(logits, labels, alpha=a, beta=b)
    # dice_ce and fallback default
    dw = float(loss_cfg.get("dice_weight", 0.5))
    cew = float(loss_cfg.get("ce_weight", 0.5))
    return lambda logits, labels: dice_ce_loss(
        logits, labels, dice_weight=dw, ce_weight=cew, class_weights=class_weights
    )


def with_deep_supervision(loss_fn: LossFn) -> LossFn:
    """Wrap a ``(logits, labels)`` loss so it also accepts a LIST of
    multi-scale logits ``[main, aux_fine, ..., aux_coarse]`` (all upsampled
    to the label grid): the nnU-Net-weighted sum ``Σ 2^-k · L_k / Σ 2^-k``.
    Single-array logits pass through untouched, so the same wrapped loss
    serves both the deep-supervision train path and the (always
    single-output) eval path. The reference ships DeepSupervisionHead as
    dead code (segmentation.py:62-115 — never reached by the trainer); here
    ``model.head.type: deep_supervision`` actually trains with it."""

    def wrapped(logits, labels):
        if isinstance(logits, (list, tuple)):
            weights = [0.5**i for i in range(len(logits))]
            total = sum(
                w * loss_fn(lg, labels) for w, lg in zip(weights, logits)
            )
            return total / sum(weights)
        return loss_fn(logits, labels)

    return wrapped
