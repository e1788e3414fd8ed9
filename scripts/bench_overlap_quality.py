#!/usr/bin/env python3
"""Quality cost of the fast-serving overlap settings (CPU-runnable).

The sliding-window stride is the one serving knob that cuts tile count
directly: on the 192×192×256 bench volume, overlap 0.5 → 45 tiles,
0.25 → 36, 0.125 → 27 (see scripts/bench_flagship.py for the matching
throughput probes). The reference default (and parity bar) is 0.5
(/root/reference/configs/default.yaml:127-132); lower overlaps are this
framework's documented "fast" profile — this script measures what they
cost in Dice.

Protocol: train a tiny UNet3D on synthetic multi-organ volumes on their
native 32×32×48 grid (img_size == data shape, so the reference's
always-resize is a no-op), then sliding-window segment held-out volumes
with ROI 16³ at each overlap and score mean foreground Dice vs ground
truth + voxel agreement vs the overlap-0.5 output. The ROI:volume ratio
(16³ over 32×32×48) mirrors the production geometry (96³ over clinical
grids): every voxel is covered by multiple tiles at overlap 0.5.

Usage: JAX_PLATFORMS=cpu python scripts/bench_overlap_quality.py
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OVERLAPS = (0.5, 0.25, 0.125)
ROI = (16, 16, 16)
VOL_SHAPE = (32, 32, 48)
NUM_CLASSES = 4


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    # the axon sitecustomize pins jax_platforms; override AFTER import,
    # BEFORE any backend-initializing call (see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodal_organ_segmentation_tpu.data import get_dataloader
    from multimodal_organ_segmentation_tpu.data.synthetic import (
        generate_synthetic_dataset,
    )
    from multimodal_organ_segmentation_tpu.data.transforms import modality_normalize
    from multimodal_organ_segmentation_tpu.models.build import build_model
    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        sliding_window_inference,
    )
    from multimodal_organ_segmentation_tpu.train.trainer import Trainer
    from multimodal_organ_segmentation_tpu.utils.config import ConfigNode
    from multimodal_organ_segmentation_tpu.utils.io import load_nifti

    tmp = Path(tempfile.mkdtemp(prefix="overlap_quality_"))
    root, out = tmp / "data", tmp / "out"
    generate_synthetic_dataset(
        root, n_train=8, n_val=2, n_test=3, shape=VOL_SHAPE,
        num_classes=NUM_CLASSES, seed=0,
    )
    log(f"dataset at {root}")

    cfg = ConfigNode({
        "experiment": {"name": "overlap_quality", "seed": 42,
                       "output_dir": str(out), "log_dir": str(out)},
        "data": {
            "modalities": ["CT", "PET"],
            "primary_modality": "CT",
            "data_root": str(root),
            "train_csv": "train.csv", "val_csv": "val.csv", "test_csv": "test.csv",
            "preprocessing": {
                "ct": {"window_center": -100, "window_width": 700, "normalize": True},
                "pet": {"suv_type": "bw", "normalize": True},
            },
            "registration": {"enabled": False},
            "augmentation": {"enabled": False},
        },
        "model": {
            "name": "unet3d", "in_channels": 2, "out_channels": NUM_CLASSES,
            # train on the NATIVE grid (img_size == data shape → resize is a
            # no-op) with enough capacity to escape the all-background
            # optimum of reference-parity dice_ce (foreground ≈ 3% of
            # voxels); the fully-convolutional net then serves ROI-sized tiles
            "backbone": {"features": [16, 32], "img_size": list(VOL_SHAPE),
                         "norm": "instance"},
            "fusion": {"type": "early"},
            "head": {"type": "conv", "dropout": 0.0},
        },
        "training": {
            "epochs": 30, "batch_size": 2, "accumulation_steps": 1,
            "optimizer": {"name": "adamw", "lr": 1.0e-3, "weight_decay": 1.0e-5},
            "scheduler": {"name": "cosine", "warmup_epochs": 0, "min_lr": 1.0e-6},
            "loss": {"name": "dice_ce", "dice_weight": 0.5, "ce_weight": 0.5},
            "early_stopping": {"enabled": False},
            "checkpoint": {"save_best": False, "save_last": False,
                           "save_every": 100},
        },
        "inference": {"sliding_window": {"roi_size": list(ROI), "overlap": 0.5,
                                         "mode": "gaussian"}, "batch_size": 2},
        "parallel": {"mesh": {"data": 1, "model": 1}},
        "hardware": {"platform": "cpu", "num_workers": 0, "prefetch_depth": 1,
                     "device": "cpu", "pin_memory": False},
    })

    trainer = Trainer(
        cfg,
        train_loader=get_dataloader(cfg, split="train"),
        val_loader=get_dataloader(cfg, split="val"),
    )
    hist = trainer.train()
    log("val_dice trajectory: "
        + " ".join(f"{d:.3f}" for d in hist["val_dice"]))
    if hist["val_dice"][-1] < 0.2:
        log("WARNING: fixture model barely learned; Dice deltas below are "
            "still comparable across overlaps but small in absolute terms")

    model = build_model(cfg)
    variables = {"params": trainer.state.params}

    def predict_fn(v, patches):
        return model.apply(v, patches, train=False)

    import pandas as pd

    test_df = pd.read_csv(root / "test.csv")
    prep = cfg["data"]["preprocessing"]

    results = {ov: {"dice": [], "agree": []} for ov in OVERLAPS}
    for _, row in test_df.iterrows():
        chans = [np.asarray(load_nifti(root / row[m])) for m in ("CT", "PET")]
        image = np.stack(chans, axis=-1).astype(np.float32)
        label = np.asarray(load_nifti(root / row["label"])).astype(np.int32)
        x = np.asarray(modality_normalize(jnp.asarray(image), ["CT", "PET"], prep))

        preds = {}
        for ov in OVERLAPS:
            logits = sliding_window_inference(
                jnp.asarray(x), predict_fn, roi_size=ROI,
                num_classes=NUM_CLASSES, overlap=ov, sw_batch_size=4,
                mode="gaussian", params=variables,
            )
            preds[ov] = np.asarray(jnp.argmax(logits, axis=-1))

        for ov in OVERLAPS:
            p = preds[ov]
            dices = []
            for c in range(1, NUM_CLASSES):
                inter = np.sum((p == c) & (label == c))
                denom = np.sum(p == c) + np.sum(label == c)
                if denom > 0:
                    dices.append(2.0 * inter / denom)
            results[ov]["dice"].append(float(np.mean(dices)))
            results[ov]["agree"].append(float(np.mean(p == preds[0.5])))

    print()
    print(f"{'overlap':>8} {'mean_fg_dice':>13} {'vs_0.5_agree':>13}")
    base = float(np.mean(results[0.5]["dice"]))
    for ov in OVERLAPS:
        d = float(np.mean(results[ov]["dice"]))
        a = float(np.mean(results[ov]["agree"]))
        print(f"{ov:>8} {d:>13.4f} {a:>13.4f}   (delta vs 0.5: {d - base:+.4f})")


if __name__ == "__main__":
    main()
