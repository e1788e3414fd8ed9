#!/usr/bin/env python3
"""Benchmark: SwinUNETR PET/CT sliding-window inference, volumes/min/chip.

North star (BASELINE.md): ≥10 volumes/min/chip at roi 96³, overlap 0.5,
gaussian blending, sw_batch 4, bf16 — on one TPU v5e chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/min/chip", "vs_baseline": N}
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        sliding_window_inference,
    )

    # workload: realistic whole-body PET/CT grid, reference inference envelope
    vol_shape = (192, 192, 256)
    roi = (96, 96, 96)
    overlap = 0.5
    # tiles per forward: 16 keeps the MXU fed (35ms/tile vs 89ms at 4);
    # blending output is identical for any batching — tiles are independent
    sw_batch = 16
    num_classes = 8

    model = SwinUNETR(
        out_channels=num_classes,
        feature_size=48,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=(7, 7, 7),
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, *roi, 2), jnp.float32)
    # jit the init: eager init dispatches hundreds of tiny ops (minutes
    # through the axon relay)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))

    def predict_fn(v, patches):
        return model.apply(v, patches, train=False)

    # generate the volume ON DEVICE: host→device bulk transfer through the
    # axon relay is ~0.1 MB/s, a 75MB upload would dominate the bench
    volume = jax.jit(
        lambda key: jax.random.normal(key, (*vol_shape, 2), jnp.float32)
    )(jax.random.key(1))

    # Reduce to a scalar on device and fetch 4 bytes: on the axon relay,
    # block_until_ready() does not actually block, and fetching the full
    # logits volume through the tunnel is not the measured workload.
    # The volume MUST be a jit argument — closing over it embeds a 75MB
    # constant in the HLO (the remote compiler rejects it with HTTP 413).
    @jax.jit
    def run(v, vol):
        logits = sliding_window_inference(
            vol,
            predict_fn,
            roi_size=roi,
            num_classes=num_classes,
            overlap=overlap,
            sw_batch_size=sw_batch,
            mode="gaussian",
            params=v,
        )
        return jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    # warmup/compile (value fetch forces completion)
    float(run(variables, volume))

    # timed steady-state
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        float(run(variables, volume))
    dt = (time.perf_counter() - t0) / n_iters

    vols_per_min = 60.0 / dt
    result = {
        "metric": "volumes/min/chip sliding-window inference (SwinUNETR 96^3 roi, "
        f"{vol_shape[0]}x{vol_shape[1]}x{vol_shape[2]} PET/CT volume, bf16)",
        "value": round(vols_per_min, 3),
        "unit": "volumes/min/chip",
        "vs_baseline": round(vols_per_min / 10.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
