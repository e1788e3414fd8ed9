#!/usr/bin/env python3
"""TPU A/B: Pallas fused window-MHA vs XLA dense at real SwinUNETR shapes.

Stages of the 96³ fs=48 window-7³ model (tokens 343, head_dim 16):
  stage1: 48³ → 343 windows × h3,  stage2: 24³(pad 28) → 64 × h6,
  stage3: 12³(pad 14) → 8 × h12,   stage4: 6³(pad 7) → 1 × h24.
Plus the full-model forward with use_fused on/off (bs=8 tiles).

Axon-relay rules: data generated on device, jitted init, completion via
device scalar fetch. Run: python scripts/bench_window_mha.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.ops.pallas.window_attention import (
    dense_window_mha,
    window_mha,
)

BS = 8
DT = jnp.bfloat16


def timeit(name, fn, *args, iters=5):
    float(fn(*args))  # compile + force
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:48s} {dt:8.2f} ms", flush=True)
    return dt


def stage(name, nw, h, d=16, n=343):
    bw = BS * nw

    @jax.jit
    def make(key):
        ks = jax.random.split(key, 5)
        q = jax.random.normal(ks[0], (bw, n, h, d), DT)
        k = jax.random.normal(ks[1], (bw, n, h, d), DT)
        v = jax.random.normal(ks[2], (bw, n, h, d), DT)
        bias = jax.random.normal(ks[3], (h, n, n), jnp.float32) * 0.1
        mask = jnp.where(
            jax.random.uniform(ks[4], (nw, n, n)) < 0.2, -100.0, 0.0
        ).astype(jnp.float32)
        return q, k, v, bias, mask

    q, k, v, bias, mask = make(jax.random.key(0))

    @jax.jit
    def fused(q, k, v, bias, mask):
        return jnp.sum(window_mha(q, k, v, bias, mask, nw).astype(jnp.float32))

    @jax.jit
    def dense(q, k, v, bias, mask):
        return jnp.sum(
            dense_window_mha(q, k, v, bias, mask, nw).astype(jnp.float32)
        )

    tf = timeit(f"{name} fused  (bw={bw} h={h})", fused, q, k, v, bias, mask)
    td = timeit(f"{name} dense  (bw={bw} h={h})", dense, q, k, v, bias, mask)
    print(f"  -> speedup {td / tf:.2f}x", flush=True)
    return tf, td


def full_model(use_fused):
    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR

    model = SwinUNETR(
        out_channels=8, feature_size=48, depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24), window_size=(7, 7, 7), dtype=DT,
        use_fused=use_fused,
    )
    x = jax.jit(
        lambda k: jax.random.normal(k, (BS, 96, 96, 96, 2), jnp.float32)
    )(jax.random.key(1))
    v = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 96, 96, 96, 2)), train=False)
    )(jax.random.key(0))

    @jax.jit
    def f(v, x):
        return jnp.sum(model.apply(v, x, train=False).astype(jnp.float32))

    return timeit(f"full forward bs=8 96^3 use_fused={use_fused}", f, v, x)


def main():
    t0 = time.time()
    stage("stage1 48^3", 343, 3)
    stage("stage2 28^3", 64, 6)
    stage("stage3 14^3", 8, 12)
    stage("stage4 7^3", 1, 24)
    print(f"# stages done ({time.time()-t0:.0f}s)", flush=True)
    tf = full_model(True)
    tx = full_model(False)
    print(f"full-model speedup from fused kernel: {tx / tf:.2f}x", flush=True)


if __name__ == "__main__":
    main()
