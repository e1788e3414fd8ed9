"""Optimizers and LR schedules (reference: src/trainer/trainer.py:104-148).

Optimizers via optax (adam / adamw / sgd+momentum). The reference steps its
scheduler once per epoch (trainer.py:199-203), so the schedule here is a
host-side function ``lr(epoch)`` injected into the optimizer through
``optax.inject_hyperparams`` — this also supports the metric-driven
plateau schedule, which cannot be a pure function of the step count.

Parity notes:
- cosine: torch ``CosineAnnealingLR(T_max=epochs-warmup, eta_min=min_lr)``
  — the reference never applies an actual warmup ramp, it only shortens
  T_max (a quirk we preserve; a real linear warmup is available with
  ``warmup: true``).
- step: ``StepLR(step_size, gamma)``.
- plateau: ``ReduceLROnPlateau(mode=max, patience, factor)``.
- poly: lr·(1 − e/E)^power — no reference analog (nnU-Net's standard
  schedule, the usual companion of ``data.patch_based`` training).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import optax


def make_optimizer(config) -> optax.GradientTransformation:
    """Build the optax optimizer with an injectable learning rate.

    ``training.grad_clip_norm`` > 0 prepends global-norm gradient clipping
    (``optax.clip_by_global_norm``) — the standard stabilizer for large-ROI
    3D segmentation; the reference has no clipping at all."""
    opt_cfg = config.get("training.optimizer", {}) or {}
    name = str(opt_cfg.get("name", "adamw")).lower()
    lr = float(opt_cfg.get("lr", 1e-4))
    wd = float(opt_cfg.get("weight_decay", 0) or 0)
    clip = float(config.get("training.grad_clip_norm", 0.0) or 0.0)

    if name == "adam":
        # torch Adam's weight_decay is L2-added-to-grad, not decoupled
        def base(learning_rate):
            tx = optax.adam(learning_rate)
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
            return tx
    elif name == "sgd":
        momentum = float(opt_cfg.get("momentum", 0.9))

        def base(learning_rate):
            tx = optax.sgd(learning_rate, momentum=momentum)
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
            return tx
    elif name == "adafactor":
        # the TPU-native memory-efficient optimizer: second moments stored
        # as factored row/column statistics, so optimizer HBM is ~O(rows +
        # cols) per matrix instead of Adam's 2× full-parameter copies.
        # The reference (torch) offers adam/adamw/sgd only.
        def base(learning_rate):
            return optax.adafactor(
                learning_rate=learning_rate,
                weight_decay_rate=wd if wd else None,
            )
    else:  # adamw (and fallback)
        b1, b2 = tuple(opt_cfg.get("betas", [0.9, 0.999]))

        def base(learning_rate):
            return optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=wd)

    # ALWAYS chain a leading stage (identity when clipping is off): both
    # clip_by_global_norm and identity carry EmptyState, so the opt-state
    # pytree structure is invariant to the grad_clip_norm setting — a
    # checkpoint written with clipping on restores with it off and vice
    # versa (orbax hard-fails on any structure change)
    inner = base

    def base(learning_rate):
        head = optax.clip_by_global_norm(clip) if clip > 0 else optax.identity()
        return optax.chain(head, inner(learning_rate))

    return optax.inject_hyperparams(base)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Write a new LR into an inject_hyperparams optimizer state."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class LRScheduler:
    """Per-epoch LR controller (host side)."""

    def __init__(self, config):
        sched = config.get("training.scheduler", {}) or {}
        self.name = str(sched.get("name", "cosine")).lower()
        self.base_lr = float(config.get("training.optimizer.lr", 1e-4))
        self.epochs = int(config.get("training.epochs", 300))
        self.warmup = int(sched.get("warmup_epochs", 0) or 0)
        self.min_lr = float(sched.get("min_lr", 1e-6))
        self.step_size = int(sched.get("step_size", 30))
        self.gamma = float(sched.get("gamma", 0.1))
        self.power = float(sched.get("power", 0.9))  # poly only
        self.patience = int(sched.get("patience", 10))
        self.factor = float(sched.get("factor", 0.1))
        self.use_warmup_ramp = bool(sched.get("warmup", False))

        # plateau state
        self._best = -math.inf
        self._bad = 0
        self._scale = 1.0

    def lr_for_epoch(self, epoch: int, metric: Optional[float] = None) -> float:
        """LR to use during ``epoch`` (0-indexed); for plateau, ``metric`` is
        the previous epoch's monitored value."""
        if self.use_warmup_ramp and epoch < self.warmup:
            return self.base_lr * (epoch + 1) / max(self.warmup, 1)

        if self.name == "cosine":
            t_max = max(self.epochs - self.warmup, 1)
            e = min(epoch, t_max)
            return self.min_lr + (self.base_lr - self.min_lr) * (
                1 + math.cos(math.pi * e / t_max)
            ) / 2
        if self.name == "step":
            return self.base_lr * (self.gamma ** (epoch // self.step_size))
        if self.name == "poly":
            # nnU-Net-standard polynomial decay: lr·(1 − e/E)^power (the
            # conventional companion of patch-based training; the reference
            # offers cosine/step/plateau only). E excludes warmup epochs,
            # matching how the cosine branch treats its ramp.
            t_max = max(self.epochs - self.warmup, 1)
            e = min(max(epoch - (self.warmup if self.use_warmup_ramp else 0), 0), t_max)
            return max(
                self.base_lr * (1.0 - e / t_max) ** self.power, self.min_lr
            )
        if self.name == "plateau":
            if metric is not None:
                if metric > self._best:
                    self._best = metric
                    self._bad = 0
                else:
                    self._bad += 1
                    if self._bad > self.patience:
                        self._scale *= self.factor
                        self._bad = 0
            return max(self.base_lr * self._scale, self.min_lr)
        return self.base_lr
