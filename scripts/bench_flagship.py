#!/usr/bin/env python3
"""A/B the flagship sliding-window config: window size × fusion × stages.

VERDICT r2 item 4: the bench headline should be the best honest
configuration of this framework's own model (checkpoint parity does not
constrain the native flagship). 6³ windows give zero padding at every
stage of a 96³ ROI (96/2=48, /4=24, /8=12, /16=6 — all divide 6);
fusion_stages trades the expensive /4 cross-attention for throughput.

Usage: python scripts/bench_flagship.py [window] [fusion 0|1] [stages csv|-] [sw_batch] [overlap] [feature_size]

overlap sets the tile stride (reference default 0.5 → 45 tiles on the
192×192×256 bench volume; 0.25 → 36 tiles; 0.125 → 27) — the fast-serving
trade-off: fewer tiles, less Gaussian averaging at seams.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

window = int(sys.argv[1]) if len(sys.argv) > 1 else 6
fusion = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
stages = (
    tuple(int(s) for s in sys.argv[3].split(","))
    if len(sys.argv) > 3 and sys.argv[3] != "-"
    else (0, 1, 2, 3)
)
sw_batch = int(sys.argv[4]) if len(sys.argv) > 4 else 15
overlap = float(sys.argv[5]) if len(sys.argv) > 5 else 0.5
# feature_size A/B (VERDICT r4 item 5 — lane alignment): 48 (reference
# envelope; C∈{48,96} pads to 128 lanes in the decoder convs) vs 64
# (C∈{64,128} = exact 128-lane halves). Heads scale to keep head_dim 16.
fs = int(sys.argv[6]) if len(sys.argv) > 6 else 48

VOL_SHAPE = (192, 192, 256)
ROI = (96, 96, 96)
NUM_CLASSES = 8


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        sliding_window_inference,
    )

    log(f"window={window} fusion={fusion} stages={stages} sw_batch={sw_batch} "
        f"overlap={overlap} fs={fs}")
    model = SwinUNETR(
        out_channels=NUM_CLASSES,
        feature_size=fs,
        depths=(2, 2, 2, 2),
        num_heads=(fs // 16, fs // 8, fs // 4, fs // 2),
        window_size=(window, window, window),
        dtype=jnp.bfloat16,
        modality_fusion="cross_attention" if fusion else None,
        fusion_stages=stages,
    )
    volume = jax.jit(
        lambda key: jax.random.normal(key, (*VOL_SHAPE, 2), jnp.float32)
    )(jax.random.key(1))
    x0 = jnp.zeros((1, *ROI, 2), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))
    log("init done")

    def predict_fn(v, patches):
        return model.apply(v, patches, train=False)

    @jax.jit
    def run(v, vol):
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
    log(f"compile+warm {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        float(run(variables, volume))
    dt = (time.perf_counter() - t0) / n
    log(
        f"RESULT window={window} fusion={int(fusion)} stages={stages} "
        f"sw_batch={sw_batch} overlap={overlap} fs={fs}: "
        f"{60.0 / dt:.2f} vol/min ({dt * 1e3:.0f} ms/vol)"
    )


if __name__ == "__main__":
    main()
