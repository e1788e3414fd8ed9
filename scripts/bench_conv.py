#!/usr/bin/env python3
"""TPU conv microbenchmarks with in-jit serialized chains (no relay floor).

Each variant runs K iterations inside ONE jit (serialized by threading a
scalar through the input so XLA cannot hoist or parallelize), timed at two
trip counts; the difference cancels dispatch+fetch+loop constants exactly.

Questions answered:
  1. What does conv3³ 96->48 @96³ bs=8 bf16 really cost? (decoder1 conv1)
  2. Is N=48 MXU lane fill the cap? (same conv with C_out zero-padded 128)
  3. conv3³ 48->48 (encoder0 conv2 / decoder1 conv2)
  4. pointwise 96->48 (bandwidth reference)
  5. big clean GEMM (chip sanity ceiling)

Run: python scripts/bench_conv.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

BS = 8
R = 96
DT = jnp.bfloat16


def chain_time(name, make_step, x, flops_per_iter, k1=1, k2=6):
    """make_step(x, s) -> scalar; serialized via s."""

    @jax.jit
    def run(x, n):
        def body(i, s):
            return make_step(x, s)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(run(x, 1))  # compile+warm
    t0 = time.perf_counter()
    float(run(x, k1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x, k2))
    t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (k2 - k1)
    tf = flops_per_iter / dt / 1e12
    print(f"{name:44s} {dt*1e3:8.2f} ms  {tf:6.1f} TFLOP/s", flush=True)
    return dt


def conv_variant(name, cin, cout, kernel=(3, 3, 3)):
    key = jax.random.key(0)
    x = jax.jit(lambda k: jax.random.normal(k, (BS, R, R, R, cin), jnp.float32).astype(DT))(key)
    w = jax.jit(
        lambda k: (jax.random.normal(k, (*kernel, cin, cout), jnp.float32) * 0.05).astype(DT)
    )(jax.random.key(1))

    def step(x, s):
        xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)  # serialize on s
        y = jax.lax.conv_general_dilated(
            xi, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    voxels = BS * R * R * R
    flops = 2 * voxels * cin * cout * kernel[0] * kernel[1] * kernel[2]
    return chain_time(name, step, x, flops)


def padded_out_conv(cin=96, cout=48, cpad=128):
    """Same conv but kernel zero-padded to cpad output lanes, result sliced."""
    x = jax.jit(lambda k: jax.random.normal(k, (BS, R, R, R, cin), jnp.float32).astype(DT))(
        jax.random.key(0)
    )
    w = jax.jit(
        lambda k: jnp.pad(
            (jax.random.normal(k, (3, 3, 3, cin, cout), jnp.float32) * 0.05),
            ((0, 0),) * 4 + ((0, cpad - cout),),
        ).astype(DT)
    )(jax.random.key(1))

    def step(x, s):
        xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
        y = jax.lax.conv_general_dilated(
            xi, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[..., :cout]
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    voxels = BS * R * R * R
    flops = 2 * voxels * cin * cpad * 27  # padded FLOPs actually issued
    return chain_time(f"conv3 {cin}->{cout} zero-pad {cpad}", step, x, flops)


def gemm_sanity(m=8192, k=8192, n=8192):
    a = jax.jit(lambda key: jax.random.normal(key, (m, k), jnp.float32).astype(DT))(
        jax.random.key(0)
    )
    b = jax.jit(lambda key: jax.random.normal(key, (k, n), jnp.float32).astype(DT))(
        jax.random.key(1)
    )

    def step(a, s):
        ai = a.at[0, 0].add(s * 1e-20)
        y = ai @ b
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    return chain_time(f"GEMM {m}x{k}x{n} bf16", step, a, 2 * m * k * n)


def main():
    gemm_sanity()
    conv_variant("conv3 96->48 @96^3 (decoder1 c1)", 96, 48)
    padded_out_conv(96, 48, 128)
    padded_out_conv(96, 48, 64)
    conv_variant("conv3 48->48 @96^3", 48, 48)
    conv_variant("conv3 2->48 @96^3 (encoder0 c1)", 2, 48)
    conv_variant("conv1 96->48 @96^3 (bandwidth ref)", 96, 48, (1, 1, 1))


if __name__ == "__main__":
    main()
