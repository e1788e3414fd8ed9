#!/usr/bin/env python3
"""TPU A/B: flax GroupNorm(group_size=1) instance norm vs one-pass variants.

At [8,96,96,96,48] bf16 the ideal cost is ~2.5 GB of HBM traffic (stats
read + normalize read/write) ≈ 3 ms; flax measures ~8.5 ms (it computes
mean, then mean((x-mu)^2) — an extra full pass). Candidates:
  A. flax nn.GroupNorm(group_size=1)            (current Norm3D)
  B. two-moment: E[x], E[x^2] in one fused pass, then normalize
  C. B + leaky_relu folded into the normalize pass
  D. B via a Pallas two-kernel (stats accumulate, then normalize+act)

Run: python scripts/bench_instance_norm.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from flax import linen as nn

SHAPE = (8, 96, 96, 96, 48)
DT = jnp.bfloat16
EPS = 1e-5


def timeit(name, fn, *args, iters=10):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(1 + iters):
        float(fn(*args))
    t2 = time.perf_counter() - t0
    # trip-count differencing cancels the ~27ms relay dispatch+fetch floor
    dt = (t2 - t1) / iters * 1e3 if t2 > t1 else t2 / (1 + iters) * 1e3
    print(f"{name:50s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    x = jax.jit(lambda k: jax.random.normal(k, SHAPE, jnp.float32).astype(DT))(
        jax.random.key(0)
    )

    gn = nn.GroupNorm(
        num_groups=None, group_size=1, use_scale=False, use_bias=False,
        epsilon=EPS, dtype=DT,
    )
    v = gn.init(jax.random.key(1), jnp.zeros((1, 4, 4, 4, SHAPE[-1])))

    @jax.jit
    def flax_in(x):
        return jnp.sum(gn.apply(v, x).astype(jnp.float32))

    @jax.jit
    def two_moment(x):
        xf = x.astype(jnp.float32)
        axes = (1, 2, 3)
        s1 = jnp.mean(xf, axis=axes, keepdims=True)
        s2 = jnp.mean(xf * xf, axis=axes, keepdims=True)
        var = s2 - s1 * s1
        y = ((xf - s1) * jax.lax.rsqrt(var + EPS)).astype(DT)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def two_moment_lrelu(x):
        xf = x.astype(jnp.float32)
        axes = (1, 2, 3)
        s1 = jnp.mean(xf, axis=axes, keepdims=True)
        s2 = jnp.mean(xf * xf, axis=axes, keepdims=True)
        var = s2 - s1 * s1
        y = (xf - s1) * jax.lax.rsqrt(var + EPS)
        y = nn.leaky_relu(y, 0.01).astype(DT)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def flax_in_lrelu(x):
        return jnp.sum(nn.leaky_relu(gn.apply(v, x), 0.01).astype(jnp.float32))

    timeit("A  flax GroupNorm(gs=1)", flax_in, x)
    timeit("A' flax + lrelu", flax_in_lrelu, x)
    timeit("B  two-moment one-pass", two_moment, x)
    timeit("C  two-moment + lrelu", two_moment_lrelu, x)


if __name__ == "__main__":
    main()
