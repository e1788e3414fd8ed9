#!/usr/bin/env python3
"""Tap-packed conv decomposition: fill the lane dim with kd-taps.

bench_conv2.py: naive 3×2D split loses (3 convs at COUT=48 each underfill
lanes AND triple the accumulator traffic). bench_conv.py: zero-padding
COUT 48→128 is FREE (37.8ms either way). So pack the 3 kd kernel slices
into output channels: ONE conv with kernel [1,3,3,CIN,3·COUT] (kd trivial),
then out[h] = Σ_kh ybig[h+kh-1, kh·COUT:(kh+1)·COUT] — 3 shifted slice-adds
XLA can fuse. Matrix here: lane-fill scaling of 2D conv, the packed conv3d
[1,3,3] variant, and the full packed pipeline vs native.

Run: python scripts/bench_conv3.py
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


def packed_conv3d(x, w):
    """3³ conv via kd-tap packing: one [1,3,3,CIN,3·COUT] conv + 3 shifted adds.

    w: [3, 3, 3, CIN, COUT] (native layout). Returns SAME-padded conv3d(x, w).
    """
    cout = w.shape[-1]
    # [1, 3, 3, CIN, 3*COUT]: kd slices stacked along output channels
    wp = jnp.concatenate([w[kd] for kd in range(3)], axis=-1)[None]
    ybig = jax.lax.conv_general_dilated(
        x, wp, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    # out[:, h] = Σ_kd ybig[:, h+kd-1, ..., kd-block]  (zeros beyond edges)
    h = x.shape[1]
    z = jnp.zeros_like(ybig[:, :1, ..., :cout])
    y0 = jnp.concatenate([z, ybig[:, : h - 1, ..., 0:cout]], axis=1)
    y1 = ybig[..., cout : 2 * cout]
    y2 = jnp.concatenate([ybig[:, 1:, ..., 2 * cout : 3 * cout], z], axis=1)
    return y0 + y1 + y2


def chain_time(name, make_step, x, flops_per_iter, k1=1, k2=5):
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
    print(f"{name:52s} {dt*1e3:8.2f} ms  {flops_per_iter/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    return dt


def main():
    # ---- correctness: packed == native (f32, 16³) ----
    rs = 16
    xs = jax.jit(lambda k: jax.random.normal(k, (1, rs, rs, rs, 8), jnp.float32))(
        jax.random.key(7)
    )
    ws = jax.jit(lambda k: jax.random.normal(k, (3, 3, 3, 8, 8), jnp.float32) * 0.1)(
        jax.random.key(8)
    )
    err = jax.jit(lambda x, w: jnp.max(jnp.abs(conv3d(x, w) - packed_conv3d(x, w))))(
        xs, ws
    )
    print(f"packed f32 max err (16^3): {float(err):.2e}", flush=True)
    del xs, ws, err

    x = jax.jit(
        lambda k: jax.random.normal(k, (BS, R, R, R, CIN), jnp.float32).astype(DT)
    )(jax.random.key(0))
    w = jax.jit(
        lambda k: (jax.random.normal(k, (3, 3, 3, CIN, COUT), jnp.float32) * 0.05).astype(DT)
    )(jax.random.key(1))

    voxels = BS * R * R * R
    flops3 = 2 * voxels * CIN * COUT * 27

    def step_native(x, s):
        xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
        return jnp.sum(conv3d(xi, w).astype(jnp.float32)) * 1e-9

    def step_packed(x, s):
        xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
        return jnp.sum(packed_conv3d(xi, w).astype(jnp.float32)) * 1e-9

    # lane-fill scaling of the [1,3,3] conv alone (no shift-add)
    def mk_13x3(co):
        wp = jax.jit(
            lambda k: (jax.random.normal(k, (1, 3, 3, CIN, co), jnp.float32) * 0.05).astype(DT)
        )(jax.random.key(2))

        def step(x, s):
            xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
            y = jax.lax.conv_general_dilated(
                xi, wp, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        return step

    chain_time("native conv3d 96->48 (baseline)", step_native, x, flops3)
    for co in (48, 128, 144, 256):
        chain_time(f"conv3d [1,3,3] 96->{co}", mk_13x3(co), x,
                   2 * voxels * CIN * co * 9)
    chain_time("PACKED conv3d 96->48 (kd->lanes + shiftadd)", step_packed, x, flops3)

    # gradient path matters for training: time the vjp of both
    def loss_native(w, x):
        return jnp.sum(conv3d(x, w).astype(jnp.float32)) * 1e-9

    def loss_packed(w, x):
        return jnp.sum(packed_conv3d(x, w).astype(jnp.float32)) * 1e-9

    def mk_grad(loss):
        g = jax.grad(loss)

        def step(x, s):
            xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
            return jnp.sum(g(w, xi).astype(jnp.float32)[0]) * 1e-9

        return step

    chain_time("native conv3d dW grad", mk_grad(loss_native), x, 2 * flops3)
    chain_time("packed conv3d dW grad", mk_grad(loss_packed), x, 2 * flops3)


if __name__ == "__main__":
    main()
