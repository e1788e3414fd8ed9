#!/usr/bin/env python3
"""Decoder hot-spot profile on the real TPU (VERDICT r1 item 5 groundwork).

Times each structural piece of the SwinUNETR inference tile path at the
bench shape (96³ roi, bs=8 tiles, bf16): full forward, encoder-only,
decoder blocks at each pyramid level, and the raw conv / instance-norm
costs at full resolution. All timings use the axon-relay rules: on-device
data, jitted init, completion forced by fetching a scalar.

Run: python scripts/profile_decoder.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_organ_segmentation_tpu.models.swin_unetr import (
    SwinUNETR,
    _UnetrResBlock,
    _UnetrUpBlock,
)
from multimodal_organ_segmentation_tpu.models.layers import Norm3D

BS = 8
ROI = (96, 96, 96)
FS = 48
DT = jnp.bfloat16


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    float(out)  # compile + force
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)

    def data(shape, k=0):
        return jax.jit(
            lambda key: jax.random.normal(key, shape, jnp.float32).astype(DT)
        )(jax.random.key(k))

    # ---- full model ----
    model = SwinUNETR(
        out_channels=8, feature_size=FS, depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24), window_size=(7, 7, 7), dtype=DT,
    )
    x = data((BS, *ROI, 2))
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, *ROI, 2)), train=False))(key)

    @jax.jit
    def full_fwd(v, x):
        return jnp.sum(model.apply(v, x, train=False).astype(jnp.float32))

    t_full = timeit("full forward (bs=8, 96^3)", full_fwd, variables, x)

    # ---- decoder blocks per level (pieces timed standalone) ----
    shapes = [
        ("encoder0  resblock 2->48 @96^3", (BS, 96, 96, 96, 2), 48),
        ("encoder1  resblock 48->48 @48^3", (BS, 48, 48, 48, FS), FS),
        ("encoder2  resblock 96->96 @24^3", (BS, 24, 24, 24, 2 * FS), 2 * FS),
        ("encoder3  resblock 192->192 @12^3", (BS, 12, 12, 12, 4 * FS), 4 * FS),
        ("encoder4  resblock 384->384 @6^3", (BS, 6, 6, 6, 8 * FS), 8 * FS),
        ("encoder10 resblock 768->768 @3^3", (BS, 3, 3, 3, 16 * FS), 16 * FS),
    ]
    total_res = 0.0
    for name, shape, feats in shapes:
        blk = _UnetrResBlock(feats, "instance", DT)
        xi = data(shape, 1)
        v = jax.jit(lambda k, s=shape, b=blk: b.init(k, jnp.zeros((1, *s[1:])), train=False))(key)

        @jax.jit
        def f(v, xi, b=blk):
            return jnp.sum(b.apply(v, xi, train=False).astype(jnp.float32))

        total_res += timeit(name, f, v, xi)

    ups = [
        ("decoder5 up 768->384 @3->6", (BS, 3, 3, 3, 16 * FS), (BS, 6, 6, 6, 8 * FS), 8 * FS),
        ("decoder4 up 384->192 @6->12", (BS, 6, 6, 6, 8 * FS), (BS, 12, 12, 12, 4 * FS), 4 * FS),
        ("decoder3 up 192->96 @12->24", (BS, 12, 12, 12, 4 * FS), (BS, 24, 24, 24, 2 * FS), 2 * FS),
        ("decoder2 up 96->48 @24->48", (BS, 24, 24, 24, 2 * FS), (BS, 48, 48, 48, FS), FS),
        ("decoder1 up 48->48 @48->96", (BS, 48, 48, 48, FS), (BS, 96, 96, 96, FS), FS),
    ]
    total_up = 0.0
    for name, xshape, sshape, feats in ups:
        blk = _UnetrUpBlock(feats, "instance", DT)
        xi, sk = data(xshape, 2), data(sshape, 3)
        v = jax.jit(
            lambda k, b=blk, a=xshape, s=sshape: b.init(
                k, jnp.zeros((1, *a[1:])), jnp.zeros((1, *s[1:])), train=False
            )
        )(key)

        @jax.jit
        def f(v, xi, sk, b=blk):
            return jnp.sum(b.apply(v, xi, sk, train=False).astype(jnp.float32))

        total_up += timeit(name, f, v, xi, sk)

    # ---- primitive costs at full res ----
    conv = nn.Conv(FS, (3, 3, 3), padding="SAME", dtype=DT)
    xi = data((BS, 96, 96, 96, 2 * FS), 4)
    vc = jax.jit(lambda k: conv.init(k, jnp.zeros((1, 96, 96, 96, 2 * FS))))(key)

    @jax.jit
    def conv_f(v, xi):
        return jnp.sum(conv.apply(v, xi).astype(jnp.float32))

    timeit("conv 3^3 96->48 @96^3", conv_f, vc, xi)

    norm = Norm3D("instance", dtype=DT)
    xn = data((BS, 96, 96, 96, FS), 5)
    vn = jax.jit(lambda k: norm.init(k, jnp.zeros((1, 96, 96, 96, FS)), False))(key)

    @jax.jit
    def norm_f(v, xn):
        return jnp.sum(norm.apply(v, xn, False).astype(jnp.float32))

    timeit("instance norm 48ch @96^3", norm_f, vn, xn)

    @jax.jit
    def norm_lrelu_f(v, xn):
        y = norm.apply(v, xn, False)
        return jnp.sum(nn.leaky_relu(y, 0.01).astype(jnp.float32))

    timeit("instance norm + lrelu 48ch @96^3", norm_lrelu_f, vn, xn)

    print(f"\nsum resblocks {total_res:.2f} ms, sum upblocks {total_up:.2f} ms, "
          f"full {t_full:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
