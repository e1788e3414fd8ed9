#!/usr/bin/env python3
"""Is XLA-TPU 3D conv refetch-bound while 2D conv reuses input?

bench_conv.py showed conv3³ cost ≈ 5× its bandwidth floor (37ms vs the
7.6ms conv1 reference; MXU at 24%). If 2D 3×3 convs DO reuse input, then
    conv3d(x, w) = Σ_kh conv2d(x[:, h+kh-1], w[kh])
(3 shifted 2D convs over merged [B·H, W, D] planes) cuts refetch 3×.
This script checks the decomposition numerically at small f32 shape, then
times: native 3D, single 2D at merged shape (lower bound), the 3-way 2D
decomposition — all at the decoder1 shape (96→48 @96³ bs=8, bf16).

Run: python scripts/bench_conv2.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

BS = 8
R = 96
CIN = 96
COUT = 48
DT = jnp.bfloat16


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def conv3_via_2d(xi, w, r):
    bs, cin = xi.shape[0], xi.shape[-1]
    xp = jnp.pad(xi, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    acc = None
    for kh in range(3):
        xs = xp[:, kh : kh + r].reshape(bs * r, r, r, cin)
        y = jax.lax.conv_general_dilated(
            xs, w[kh], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        acc = y if acc is None else acc + y
    return acc.reshape(bs, r, r, r, -1)


def chain_time(name, make_step, x, flops_per_iter, k1=1, k2=6):
    @jax.jit
    def run(x, n):
        def body(i, s):
            return make_step(x, s)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(run(x, 1))
    t0 = time.perf_counter()
    float(run(x, k1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x, k2))
    t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (k2 - k1)
    print(f"{name:46s} {dt*1e3:8.2f} ms  {flops_per_iter/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    return dt


def main():
    # ---- correctness at small f32 shape (bf16 differs by rounding only) ----
    rs = 16
    xs = jax.jit(
        lambda k: jax.random.normal(k, (1, rs, rs, rs, 8), jnp.float32)
    )(jax.random.key(7))
    ws = jax.jit(
        lambda k: jax.random.normal(k, (3, 3, 3, 8, 8), jnp.float32) * 0.1
    )(jax.random.key(8))
    err = jax.jit(
        lambda x, w: jnp.max(jnp.abs(conv3d(x, w) - conv3_via_2d(x, w, rs)))
    )(xs, ws)
    print(f"decomp-2d f32 max err (16^3): {float(err):.2e}", flush=True)
    del xs, ws, err

    # ---- timing at the decoder1 shape ----
    x = jax.jit(
        lambda k: jax.random.normal(k, (BS, R, R, R, CIN), jnp.float32).astype(DT)
    )(jax.random.key(0))
    w = jax.jit(
        lambda k: (jax.random.normal(k, (3, 3, 3, CIN, COUT), jnp.float32) * 0.05).astype(DT)
    )(jax.random.key(1))

    voxels = BS * R * R * R
    flops3 = 2 * voxels * CIN * COUT * 27

    def step3(x, s):
        xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
        return jnp.sum(conv3d(xi, w).astype(jnp.float32)) * 1e-9

    x2 = jax.jit(lambda x: x.reshape(BS * R, R, R, CIN))(x)

    def step2(x2, s):
        xi = x2.at[0, 0, 0, 0].add(s * 1e-20)
        y = jax.lax.conv_general_dilated(
            xi, w[1], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    def step_dec(x, s):
        xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
        return jnp.sum(conv3_via_2d(xi, w, R).astype(jnp.float32)) * 1e-9

    chain_time("native conv3d 96->48", step3, x, flops3)
    chain_time("single 2D 3x3 (1/3 of work)", step2, x2, flops3 // 3)
    chain_time("conv3d = 3 shifted 2D", step_dec, x, flops3)


if __name__ == "__main__":
    main()
