#!/usr/bin/env python3
"""Measure SwinUNETR train-step compile + runtime vs scan_blocks/microbatch.

VERDICT r2 weak #1: at 96³ fs=48 the unrolled encoder's backward HLO was
too large for the axon remote compiler at micro ≥ 2. scan_blocks rolls
each stage into one lax.scan body; this script measures whether batched
backward now compiles, and at what ms/step and MFU.

Usage: python scripts/bench_train_scan.py [micro] [scan:0|1] [accum] [fs] [roi] [window] [remat:0|1]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

micro = int(sys.argv[1]) if len(sys.argv) > 1 else 2
scan = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
accum = int(sys.argv[3]) if len(sys.argv) > 3 else 1
fs = int(sys.argv[4]) if len(sys.argv) > 4 else 48
roi = int(sys.argv[5]) if len(sys.argv) > 5 else 96
window = int(sys.argv[6]) if len(sys.argv) > 6 else 7
remat = bool(int(sys.argv[7])) if len(sys.argv) > 7 else True
NUM_CLASSES = 8
V5E_PEAK_BF16 = 197e12


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
    from multimodal_organ_segmentation_tpu.train.losses import dice_ce_loss
    from multimodal_organ_segmentation_tpu.train.optim import make_optimizer
    from multimodal_organ_segmentation_tpu.train.trainer import (
        TrainState,
        make_train_step,
    )
    from multimodal_organ_segmentation_tpu.utils.config import default_config

    log(f"micro={micro} scan_blocks={scan} accum={accum} fs={fs} roi={roi} "
        f"window={window} remat={remat}")
    model = SwinUNETR(
        out_channels=NUM_CLASSES,
        feature_size=fs,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=(window, window, window),
        dtype=jnp.bfloat16,
        use_remat=remat,
        scan_blocks=scan,
    )
    tx = make_optimizer(default_config())
    x0 = jnp.zeros((1, roi, roi, roi, 2), jnp.float32)
    log("init...")
    variables = dict(
        jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))
    )
    params = variables.pop("params")
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    log(f"init done ({n_params / 1e6:.1f}M params)")
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        extra={},
    )
    step = make_train_step(
        model, tx, lambda lg, lb: dice_ce_loss(lg, lb), accum_steps=accum
    )

    @jax.jit
    def make_batch(key):
        img = jax.random.normal(key, (accum, micro, roi, roi, roi, 2), jnp.float32)
        lbl = jax.random.randint(key, (accum, micro, roi, roi, roi), 0, NUM_CLASSES)
        return img, lbl

    img, lbl = make_batch(jax.random.key(1))

    flops = None
    try:
        lowered = step.lower(state, img, lbl, jax.random.key(2))
        log(f"lowered; HLO chars={len(lowered.as_text()) / 1e6:.1f}M")
        t0 = time.perf_counter()
        compiled = lowered.compile()
        log(f"compiled in {time.perf_counter() - t0:.0f}s")
        cost = compiled.cost_analysis()
        if cost:
            ca = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        log(f"COMPILE FAILED: {type(e).__name__}: {str(e)[:300]}")
        return

    # Chain k async dispatches of the (donated) step and fetch ONE scalar at
    # the end; differencing two chain lengths cancels the relay fetch cost.
    # (A jitted fori_loop wrapper hangs the remote compile helper for
    # scan_blocks programs — the step itself compiles fine.)
    keys = [jax.random.key(100 + i) for i in range(16)]

    def chain(st, k):
        m = None
        for i in range(k):
            st, m = compiled(st, img, lbl, keys[i])  # reuse the executable
        return st, float(m["loss"])

    log("warm...")
    state, loss = chain(state, 1)
    log(f"warm done loss={loss:.4f}")
    t0 = time.perf_counter()
    state, _ = chain(state, 1)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, _ = chain(state, 6)
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / 5
    mfu = (flops / dt / V5E_PEAK_BF16) if flops else None
    voxels = accum * micro * roi**3
    log(
        f"RESULT micro={micro} scan={int(scan)} accum={accum}: {dt * 1e3:.1f} ms/step "
        f"mfu={mfu if mfu is None else round(mfu, 4)} "
        f"({voxels / dt / 1e6:.1f} Mvox/s)"
    )


if __name__ == "__main__":
    main()
