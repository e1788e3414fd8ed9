#!/usr/bin/env python3
"""Throughput for all five BASELINE.json workload configs on one TPU chip.

SURVEY.md §7 step 11: "volumes/min/chip measurement for the 5 BASELINE.json
configs". Each config's model is built at full size from its YAML (bf16
compute), then timed on sliding-window inference over the same whole-body
192×192×256 grid the headline bench uses, with the config's own roi/overlap/
blending. Results land in BENCH_CONFIGS.json (one entry per config).

Axon-relay rules: volumes generated on device, inits jitted, completion via
device-scalar fetch, params passed as jit arguments.

Run: python scripts/bench_configs.py [--quick]
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

VOL_SHAPE = (192, 192, 256)
SW_BATCH = 16

CONFIGS = [
    "unet3d_ct_64",
    "unet3d_earlyfusion_96",
    "swin_unetr_ct_96",
    "dual_encoder_xattn_128",
    "full_pipeline_4mod",
    "swin_unetr_xattn_flagship",  # tuned native flagship (6³ windows, /8+ fusion)
]


def bench_config(name, jax, jnp, n_iters=2):
    from multimodal_organ_segmentation_tpu.models.build import (
        build_model,
        model_input_channels,
    )
    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        sliding_window_inference,
    )
    from multimodal_organ_segmentation_tpu.utils.config import load_config

    cfg = load_config(ROOT / "configs" / f"{name}.yaml")
    cfg.set("hardware.mixed_precision", "bf16")  # one chip, one precision
    model = build_model(cfg)
    in_ch = model_input_channels(cfg)
    roi = tuple(cfg.get("inference.sliding_window.roi_size", [96, 96, 96]))
    overlap = float(cfg.get("inference.sliding_window.overlap", 0.5))
    mode = str(cfg.get("inference.sliding_window.mode", "gaussian"))
    num_classes = int(cfg.get("model.out_channels", 8))
    # sw_batch capped: big-roi / many-encoder configs otherwise exceed the
    # dev box's remote-compile program-size limit (CLAUDE.md env limits) —
    # and the 128³ roi also has HBM to respect. A config may pin its own
    # tuned value ≥8 (e.g. the flagship's 15 divides the 45-tile grid).
    cfg_sw = int(cfg.get("inference.batch_size", 0) or 0)
    if max(roi) > 96:
        sw_batch = 1
    elif in_ch >= 4:
        sw_batch = 8
    elif cfg_sw >= 8:
        sw_batch = cfg_sw
    else:
        sw_batch = SW_BATCH

    x0 = jnp.zeros((1, *roi, in_ch), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))

    def predict_fn(v, patches):
        return model.apply(v, patches, train=False)

    volume = jax.jit(
        lambda key: jax.random.normal(key, (*VOL_SHAPE, in_ch), jnp.float32)
    )(jax.random.key(1))

    @jax.jit
    def run(v, vol):
        logits = sliding_window_inference(
            vol, predict_fn, roi_size=roi, num_classes=num_classes,
            overlap=overlap, sw_batch_size=sw_batch, mode=mode, params=v,
        )
        return jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    t0 = time.time()
    float(run(variables, volume))  # compile + warm
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        float(run(variables, volume))
    dt = (time.perf_counter() - t0) / n_iters
    return {
        "config": name,
        "roi": list(roi),
        "overlap": overlap,
        "sw_batch": sw_batch,
        "in_channels": in_ch,
        "volumes_per_min_per_chip": round(60.0 / dt, 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    import jax
    import jax.numpy as jnp

    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    todo = [c for c in CONFIGS if not only or c in only]
    out = ROOT / "BENCH_CONFIGS.json"
    prev = {}
    if out.exists():
        prev = {r["config"]: r for r in json.loads(out.read_text())["results"]}

    results = []
    for name in todo:
        t0 = time.time()
        try:
            r = bench_config(name, jax, jnp)
        except Exception as e:  # keep going; record the failure honestly
            r = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# {name}: {json.dumps(r)} ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        results.append(r)

    for r in results:
        prev[r["config"]] = r
    merged = [prev[c] for c in CONFIGS if c in prev]
    out.write_text(json.dumps({"volume": list(VOL_SHAPE), "results": merged},
                              indent=1))
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
