#!/usr/bin/env python3
"""SlidingWindowRunner (dynamic tile offsets) vs the static-grid program.

The runner is the default serving path (shape bucketing); its tile starts
are runtime data instead of compile-time constants. This measures what
that costs on the flagship workload — and demonstrates the bucketing win:
a second, differently-shaped volume in the same bucket reuses the program
(no second multi-minute compile).

Usage: python scripts/bench_runner.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VOL_SHAPE = (192, 192, 256)
VOL_SHAPE_B = (180, 170, 250)  # same bucket as (192,192,256): per-axis tile
# counts (3,3,5) match under the roi-96/interval-48 rule
ROI = (96, 96, 96)
SW_BATCH = 15
NUM_CLASSES = 8


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        SlidingWindowRunner,
        bucket_shape,
        sliding_window_inference,
    )

    model = SwinUNETR(
        out_channels=NUM_CLASSES,
        feature_size=48,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=(6, 6, 6),
        dtype=jnp.bfloat16,
        modality_fusion="cross_attention",
        fusion_stages=(1, 2, 3),
    )
    x0 = jnp.zeros((1, *ROI, 2), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))
    volume = jax.jit(
        lambda key: jax.random.normal(key, (*VOL_SHAPE, 2), jnp.float32)
    )(jax.random.key(1))
    log(f"init done; bucket({VOL_SHAPE_B}) = "
        f"{bucket_shape(VOL_SHAPE_B, ROI, 0.5)} vs {VOL_SHAPE}")

    def predict_fn(v, patches):
        return model.apply(v, patches, train=False)

    # --- static-grid program (the bench.py path) ---
    @jax.jit
    def run_static(v, vol):
        logits = sliding_window_inference(
            vol, predict_fn, roi_size=ROI, num_classes=NUM_CLASSES,
            overlap=0.5, sw_batch_size=SW_BATCH, mode="gaussian", params=v,
        )
        return jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    t0 = time.time()
    float(run_static(variables, volume))
    log(f"static compile+warm {time.time() - t0:.0f}s")
    t0 = time.perf_counter()
    for _ in range(3):
        float(run_static(variables, volume))
    dt_static = (time.perf_counter() - t0) / 3
    log(f"static: {60.0 / dt_static:.2f} vol/min")

    # --- runner (dynamic offsets, bucketed) ---
    runner = SlidingWindowRunner(
        predict_fn, roi_size=ROI, num_classes=NUM_CLASSES, overlap=0.5,
        sw_batch_size=SW_BATCH, mode="gaussian",
    )

    def run_runner(vol):
        logits = runner(vol, variables)
        return float(jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32)))

    t0 = time.time()
    run_runner(volume)
    log(f"runner compile+warm {time.time() - t0:.0f}s "
        f"(programs={runner.num_compiled})")
    t0 = time.perf_counter()
    for _ in range(3):
        run_runner(volume)
    dt_runner = (time.perf_counter() - t0) / 3
    log(f"runner: {60.0 / dt_runner:.2f} vol/min "
        f"({dt_runner / dt_static * 100 - 100:+.1f}% vs static)")

    # --- bucketing: different shape, same bucket → no new compile ---
    vol_b = jax.jit(
        lambda key: jax.random.normal(key, (*VOL_SHAPE_B, 2), jnp.float32)
    )(jax.random.key(2))
    t0 = time.time()
    run_runner(vol_b)
    dt_b = time.time() - t0
    log(
        f"second shape {VOL_SHAPE_B}: {dt_b:.1f}s first call, "
        f"programs={runner.num_compiled} "
        f"({'REUSED — no recompile' if runner.num_compiled == 1 else 'recompiled!'})"
    )


if __name__ == "__main__":
    main()
