#!/usr/bin/env python3
"""TPU A/B: an imported 7³-window reference checkpoint served as-is vs
bias-resampled onto the 6³ perf window (VERDICT r4 #4).

The production story: reference SwinUNETR checkpoints are trained at
MONAI's 7³ window (/root/reference/src/models/backbones/swin_unetr.py:30-35);
our import can resample the relative-position-bias tables onto 6³
(models/torch_import.py::resample_rel_pos_bias), whose window grid divides
every stage of a 96³ ROI with zero padding — the measured perf window.
This script builds a replica .pth at the PRODUCTION scale (fs=48, depths
(2,2,2,2), heads (3,6,12,24), window 7³ — weights random: serving
throughput is value-independent), imports it both ways, and times the full
sliding-window serve of each on the bench volume. Quality equivalence of
the transfer is CI-pinned separately (tests/test_swin_import.py::
TestWindowTransferServing, trained checkpoints, Dice within 0.5%).

Run: python scripts/bench_window_transfer.py [sw_batch] [overlap]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

VOL_SHAPE = (192, 192, 256)
ROI = (96, 96, 96)
NUM_CLASSES = 8
IN_CH = 2
FS = 48
DEPTHS = (2, 2, 2, 2)
HEADS = (3, 6, 12, 24)

sw_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 15
overlap = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import numpy as np
    import torch

    from monai_swin_replica import MonaiSwinUNETR

    log("building 7^3 replica checkpoint (production scale, random init)")
    torch.manual_seed(0)
    tmodel = MonaiSwinUNETR(
        in_channels=IN_CH,
        out_channels=NUM_CLASSES,
        feature_size=FS,
        depths=DEPTHS,
        num_heads=HEADS,
        window_size=(7, 7, 7),
        merge_order="monai_v1",
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    del tmodel

    import jax
    import jax.numpy as jnp

    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
    from multimodal_organ_segmentation_tpu.models.torch_import import (
        from_torch_swin_unetr,
    )
    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        sliding_window_inference,
    )

    volume = jax.jit(
        lambda key: jax.random.normal(key, (*VOL_SHAPE, IN_CH), jnp.float32)
    )(jax.random.key(1))

    results = {}
    for window in ((7, 7, 7), (6, 6, 6)):
        log(f"importing checkpoint at target window {window}")
        params = from_torch_swin_unetr(
            sd, depths=DEPTHS, target_window=window
        )
        model = SwinUNETR(
            out_channels=NUM_CLASSES,
            feature_size=FS,
            depths=DEPTHS,
            num_heads=HEADS,
            window_size=window,
            dtype=jnp.bfloat16,
            use_fused=False,
            monai_compat=True,
            merge_order="monai_v1",
        )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

        def predict_fn(v, patches, model=model):
            return model.apply(v, patches, train=False)

        @jax.jit
        def run(v, vol, predict_fn=predict_fn):
            logits = sliding_window_inference(
                vol,
                predict_fn,
                roi_size=ROI,
                num_classes=NUM_CLASSES,
                overlap=overlap,
                sw_batch_size=sw_batch,
                mode="gaussian",
                params=v,
            )
            return jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32))

        t0 = time.perf_counter()
        float(run(variables, volume))
        log(f"window {window}: compile+warm {time.perf_counter() - t0:.0f}s")
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            float(run(variables, volume))
        dt = (time.perf_counter() - t0) / n
        results[window] = 60.0 / dt
        log(f"RESULT imported-checkpoint serve window={window}: "
            f"{60.0 / dt:.2f} vol/min ({dt * 1e3:.0f} ms/vol)")

    v7, v6 = results[(7, 7, 7)], results[(6, 6, 6)]
    log(f"A/B: 7^3 as-trained {v7:.2f} vs 6^3 transferred {v6:.2f} vol/min "
        f"({(v6 / v7 - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
