#!/usr/bin/env python3
"""Lane-alignment microbench: the decoder hot conv at fs=48 vs fs=64
channel shapes (VERDICT r4 #5).

The decoder's 3^3 conv at fs=48 (96->48 @96^3 bs=8) measures 47 TFLOP/s —
the known practical limit (CLAUDE.md perf log, r2 closure): XLA refetches
the input per tap and C in {48, 96} pads to 128 lanes. fs=64 makes
C in {64, 128} exact 128-lane halves. This script times both shapes with
6-way in-jit chaining (per-call cost is near the relay dispatch floor).

Measured (r5, TPU v5e): 96->48 38.2 ms 46.1 TFLOP/s; 128->64 38.5 ms
81.4 TFLOP/s — 1.77x the FLOPs in the SAME wall time. The conv is bound
by input tap-refetch HBM traffic (lane- and dtype-insensitive), so lane
alignment is free FLOPs, not speed: the full-model A/B
(scripts/bench_flagship.py ... 64) lands at 43.0 vol/min vs 43.6 for
fs=48 — fs=64 is a capacity-per-time win, NOT a throughput win.

Run: python scripts/bench_conv_fs.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from flax import linen as nn

BS, S = 8, 96


def bench(cin, cout):
    conv = nn.Conv(cout, (3, 3, 3), padding="SAME", use_bias=False,
                   dtype=jnp.bfloat16)
    x = jax.jit(
        lambda k: jax.random.normal(k, (BS, S, S, S, cin), jnp.bfloat16)
    )(jax.random.key(0))
    v = jax.jit(lambda k: conv.init(k, x))(jax.random.key(1))
    f = jax.jit(lambda v, x: jnp.sum(conv.apply(v, x).astype(jnp.float32)))
    float(f(v, x))
    # one call sits at the ~27 ms relay dispatch floor; difference a
    # 6-chain against a single call so the constant cancels (the jnp.roll
    # feeding each link is a copy, identical cost at both channel widths)
    g = jax.jit(lambda v, x: sum(
        jnp.sum(conv.apply(v, jnp.roll(x, i, 1)).astype(jnp.float32))
        for i in range(6)
    ))
    float(g(v, x))
    t0 = time.perf_counter(); float(f(v, x)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(v, x)); t6 = time.perf_counter() - t0
    dt = (t6 - t1) / 5
    fl = 2 * 27 * BS * S**3 * cin * cout
    print(f"{cin}->{cout}: {dt * 1e3:.1f} ms, {fl / dt / 1e12:.1f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    bench(96, 48)   # fs=48 decoder1 shape (pads to 128 lanes)
    bench(128, 64)  # fs=64 decoder1 shape (exact 128-lane halves)
