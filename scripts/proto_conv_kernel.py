#!/usr/bin/env python3
"""Prototype: Pallas 3³ conv kernel vs native XLA conv on TPU.

XLA's 3D conv refetches the input from HBM once per kernel tap
(measured: 27 taps ≈ 27 × 1.6 ms at decoder1 shape — bench_conv.py),
leaving the MXU at 24%. This kernel reads each input tile ONCE into
VMEM, then runs 9 matmuls — one per (kd, kh) shift, which are free
views on untiled dims — with the 3 kw-taps packed into the matmul N
dim (N = 3·C_out fills the 128-lane MXU columns that C_out=48 alone
wastes), and accumulates w-shifted output slabs in an f32 scratch.

Mosaic DMA alignment: copied shapes need minor dim ≡ 0 (mod 128) and
second-minor ≡ 0 (mod 16 for bf16), so the input is pre-padded in HBM
to [B, D+2, H+2, Wp, Cp] with Cp=⌈C/128⌉·128, Wp=⌈(W+2)/16⌉·16.

Run: python scripts/proto_conv_kernel.py [--interpret]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, wp_ref, out_ref, xt, acc, sem, *, dt, ht, W, cout, mode):
    """One (b, d-block, h-block) program.

    xp_ref: HBM [B, D+2, H+2, Wp, Cp]    (pre-padded input)
    wp_ref: VMEM [9, Cp, 3*cout]          (per-(kd,kh): kw taps packed in N)
    out_ref: VMEM block [1, dt, ht, W, cout]
    xt:  VMEM scratch [dt+2, ht+2, Wp, Cp]

    Computes one output h-row per loop step (keeps the f32 intermediate
    at [dt, Wp, 3*cout] — VMEM-light) with 9 (kd,kh) matmuls whose A
    operands are free views into xt (shifts live on untiled dims).
    """
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)

    cp = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(di * dt, dt + 2), pl.ds(hi * ht, ht + 2)],
        xt,
        sem,
    )
    cp.start()
    cp.wait()

    Wp = xt.shape[2]
    cpch = xt.shape[3]
    acc[...] = jnp.zeros_like(acc)

    def tap(i, _):
        kd = i // 3
        kh = i % 3
        # [dt, ht, Wp, Cp] → [dt*ht*Wp, Cp]: dims 0,1 are untiled and Wp is
        # a whole number of sublane tiles, so the merge is free — ONE big-M
        # matmul instead of dt*ht tiny ones. fori_loop bounds live temps to
        # a single (kd,kh) iteration (full unroll blew scoped VMEM).
        a = xt[pl.ds(kd, dt), pl.ds(kh, ht)].reshape(dt * ht * Wp, cpch)
        y = jax.lax.dot_general(
            a,
            wp_ref[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(dt, ht, Wp, 3 * cout)
        if mode == "mxu_only":  # diagnostic: skip the shifted slab adds
            acc[...] += y[:, :, :W, :cout]
        else:
            for kw in range(3):
                acc[...] += y[:, :, kw : kw + W, kw * cout : (kw + 1) * cout]
        return 0

    jax.lax.fori_loop(0, 9, tap, 0)
    out_ref[0] = acc[...].astype(out_ref.dtype)


def _rup(v, m):
    return (v + m - 1) // m * m


def conv3x3x3_pallas(x, w, *, dt=8, ht=8, mode="full", interpret=False):
    """SAME 3³ conv, NDHWC x [B,D,H,W,C] · w [3,3,3,C,cout] → [B,D,H,W,cout]."""
    B, D, H, W, C = x.shape
    cout = w.shape[-1]
    assert D % dt == 0 and H % ht == 0
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Cp = _rup(C, 128)
    Wp = _rup(W + 2, sub)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, Wp - W - 1), (0, Cp - C)))
    # [9, Cp, 3*cout]: (kd,kh) major, kw packed into columns
    wp = w.reshape(9, 3, C, cout).transpose(0, 2, 1, 3).reshape(9, C, 3 * cout)
    wp = jnp.pad(wp, ((0, 0), (0, Cp - C), (0, 0)))
    kern = functools.partial(_kernel, dt=dt, ht=ht, W=W, cout=cout, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(B, D // dt, H // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, dt, ht, W, cout), lambda b, d, h: (b, d, h, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((dt + 2, ht + 2, Wp, Cp), x.dtype),
            pltpu.VMEM((dt, ht, W, cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, wp)


def conv3d_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def chain_time(name, make_step, x, flops, k1=1, k2=5):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, s: make_step(x, s), jnp.zeros((), jnp.float32))

    float(run(x, 1))
    t0 = time.perf_counter(); float(run(x, k1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, k2)); t2 = time.perf_counter() - t0
    dt_ = (t2 - t1) / (k2 - k1)
    print(f"{name:48s} {dt_*1e3:8.2f} ms  {flops/dt_/1e12:6.1f} TFLOP/s", flush=True)
    return dt_


def main():
    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    # correctness (f32, 16³)
    ks = jax.random.split(jax.random.key(0), 2)
    xs = jax.random.normal(ks[0], (2, 16, 16, 16, 8), jnp.float32)
    ws = jax.random.normal(ks[1], (3, 3, 3, 8, 8), jnp.float32) * 0.1
    ref = conv3d_native(xs, ws)
    got = conv3x3x3_pallas(xs, ws, dt=8, ht=8, interpret=interpret)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"f32 16^3 max err: {err:.2e}", flush=True)
    assert err < 1e-4
    if interpret:
        print("interpret OK")
        return

    # timing at decoder shapes, bf16
    for (cin, cout) in ((96, 48), (48, 48)):
        x = jax.jit(
            lambda k: jax.random.normal(k, (8, 96, 96, 96, cin), jnp.float32).astype(jnp.bfloat16)
        )(jax.random.key(1))
        w = jax.jit(
            lambda k: (jax.random.normal(k, (3, 3, 3, cin, cout), jnp.float32) * 0.05).astype(jnp.bfloat16)
        )(jax.random.key(2))
        flops = 2 * 8 * 96**3 * cin * cout * 27

        def step_nat(x, s, w=w):
            xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
            return jnp.sum(conv3d_native(xi, w).astype(jnp.float32)) * 1e-9

        def mk_pal(dt, ht, mode="full", w=w):
            def step(x, s):
                xi = x.at[0, 0, 0, 0, 0].add(s * 1e-20)
                return jnp.sum(
                    conv3x3x3_pallas(xi, w, dt=dt, ht=ht, mode=mode).astype(jnp.float32)
                ) * 1e-9
            return step

        # bf16 correctness spot-check vs native
        d = jax.jit(
            lambda x, w: jnp.max(jnp.abs(
                conv3d_native(x, w).astype(jnp.float32)
                - conv3x3x3_pallas(x, w).astype(jnp.float32)
            ))
        )(x, w)
        print(f"bf16 {cin}->{cout} max |diff| vs native: {float(d):.3e}", flush=True)

        chain_time(f"native conv3d {cin}->{cout}", step_nat, x, flops)
        chain_time(f"pallas conv3d {cin}->{cout} dt8 ht8", mk_pal(8, 8), x, flops)
        chain_time(f"pallas conv3d {cin}->{cout} dt4 ht16", mk_pal(4, 16), x, flops)
        chain_time(f"pallas {cin}->{cout} mxu-only (diagnostic)", mk_pal(8, 8, "mxu_only"), x, flops)
        del x, w


if __name__ == "__main__":
    main()
