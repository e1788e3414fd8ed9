#!/usr/bin/env python3
"""One-command batched-training MFU measurement for a REAL TPU host.

Why this exists: on the axon dev box the remote compile helper hard-fails
on the 96³ fs=48 microbatch ≥ 2 backward (HTTP 500 in the
tpu_compile_helper subprocess — an env limit, re-verified after the r3
relay outage), and HBM oversubscription pages through a 0.1 MB/s relay, so
the only honest batched-training numbers measurable THERE are 96³ micro=1
(~178 ms/step) and 64³ micro=2 scan_blocks (~184 ms/step). This script is
the deployment artifact for the day a real TPU host exists: it proves the
scan_blocks train step is numerically identical to the unrolled one, then
measures the production shapes that the dev box cannot compile.

What it does, in order:
  1. NUMERICS GATE — builds a small SwinUNETR twice (scan_blocks on/off),
     transfers the unrolled init into the stacked layout, runs one full
     train step (forward+backward+adamw) with each, and asserts the losses
     and updated parameters agree to ~1e-5. A perf number for a program
     that computes something else is worthless, so this runs first and a
     failure aborts the sweep.
  2. MFU SWEEP — times the 96³ feature-48 bf16+remat scan_blocks train
     step at micro ∈ {1, 2, 4} (and any extra sizes you pass), reporting
     ms/step, model FLOPs from XLA cost analysis, MFU vs the v5e bf16
     peak, and Mvox/s. Timing differencing (two chained lengths) cancels
     the dispatch constant, so the numbers are honest on both a local
     host and a relay.

Usage (on the TPU host):
    python scripts/real_host_train_bench.py              # micro 1,2,4
    python scripts/real_host_train_bench.py 1,2,4,8      # custom sweep
    python scripts/real_host_train_bench.py 2 64 32      # micro, roi, fs

Reference workload match: /root/reference/src/trainer/trainer.py:241-258
(the torch AMP loop at batch_size=2, accumulation=4 — micro=2 here IS
that inner batch; accum is a lax.scan around this same step and scales
linearly once micro=2 compiles).

Output: human-readable progress on stderr, ONE JSON line on stdout:
    {"numerics_gate": {...}, "sweep": [{"micro": 1, "ms_per_step": ...,
     "mfu": ..., "mvox_per_s": ...}, ...], "peak_flops": 1.97e14}
Set PEAK_FLOPS_BF16 in the environment for non-v5e chips.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

NUM_CLASSES = 8
PEAK = float(os.environ.get("PEAK_FLOPS_BF16", 197e12))  # v5e bf16 peak


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _build(jnp, fs, roi, scan_blocks, window=7, dtype=None):
    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR

    return SwinUNETR(
        out_channels=NUM_CLASSES,
        feature_size=fs,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=(window, window, window),
        dtype=dtype if dtype is not None else jnp.bfloat16,
        use_remat=True,
        scan_blocks=scan_blocks,
    )


def _state_and_step(jax, jnp, model, roi, params=None):
    from multimodal_organ_segmentation_tpu.train.losses import dice_ce_loss
    from multimodal_organ_segmentation_tpu.train.optim import make_optimizer
    from multimodal_organ_segmentation_tpu.train.trainer import (
        TrainState,
        make_train_step,
    )
    from multimodal_organ_segmentation_tpu.utils.config import default_config

    tx = make_optimizer(default_config())
    if params is None:
        x0 = jnp.zeros((1, roi, roi, roi, 2), jnp.float32)
        params = dict(
            jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))
        )["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        extra={},
    )
    step = make_train_step(
        model, tx, lambda lg, lb: dice_ce_loss(lg, lb), accum_steps=1
    )
    return state, step


def _unstack(scan_params, depths):
    """stage{s}/blocks (stacked on depth) → stage{s}_block{bi} trees
    (the layout the unrolled model takes — tests/test_scan_blocks.py)."""
    import jax

    out = {}
    for k, v in scan_params.items():
        if k.startswith("stage") and "_block" not in k:
            s = int(k.removeprefix("stage"))
            stacked = v["blocks"]
            for bi in range(depths[s]):
                out[f"stage{s}_block{bi}"] = jax.tree_util.tree_map(
                    lambda a: a[bi], stacked
                )
        else:
            out[k] = v
    return out


def numerics_gate(jax, jnp, fs=12, roi=32):
    """scan_blocks step == unrolled step on identical weights/batch.

    Runs in f32: the scan is a parameter-layout/program-size transform and
    must match exactly there; in bf16 the different op association orders
    produce harmless ~1e-5 loss noise that Adam's normalized update
    amplifies to ~2·lr in the params, which would mask a real bug."""
    unrolled = _build(jnp, fs, roi, scan_blocks=False, dtype=jnp.float32)
    scanned = _build(jnp, fs, roi, scan_blocks=True, dtype=jnp.float32)

    # SAME weights: init the scan layout once, unstack for the unrolled model
    x0 = jnp.zeros((1, roi, roi, roi, 2), jnp.float32)
    params_s = dict(
        jax.jit(lambda k: scanned.init(k, x0, train=False))(jax.random.key(0))
    )["params"]
    params_u = _unstack(
        jax.tree_util.tree_map(jnp.copy, params_s), (2, 2, 2, 2)
    )
    state_s, step_s = _state_and_step(jax, jnp, scanned, roi, params=params_s)
    state_u, step_u = _state_and_step(jax, jnp, unrolled, roi, params=params_u)

    @jax.jit
    def make_batch(key):
        k_img, k_lbl = jax.random.split(key)
        img = jax.random.normal(k_img, (1, 1, roi, roi, roi, 2), jnp.float32)
        lbl = jax.random.randint(k_lbl, (1, 1, roi, roi, roi), 0, NUM_CLASSES)
        return img, lbl

    img, lbl = make_batch(jax.random.key(1))
    key = jax.random.key(2)
    new_u, m_u = step_u(state_u, img, lbl, key)
    new_s, m_s = step_s(state_s, img, lbl, key)

    loss_u, loss_s = float(m_u["loss"]), float(m_s["loss"])
    loss_err = abs(loss_u - loss_s)

    # compare updated params in the COMMON (unrolled) layout
    upd_s = _unstack(
        jax.tree_util.tree_map(np.asarray, new_s.params), (2, 2, 2, 2)
    )
    upd_u = jax.tree_util.tree_map(np.asarray, new_u.params)
    errs = [
        float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))
        for a, b in zip(
            jax.tree_util.tree_leaves(upd_u), jax.tree_util.tree_leaves(upd_s)
        )
    ]
    param_err = max(errs)
    gate = {
        "loss_unrolled": loss_u,
        "loss_scan": loss_s,
        "loss_abs_err": loss_err,
        "updated_param_max_abs_err": param_err,
        # loss is the sharp signal (measured 1.2e-7 on CPU f32); the param
        # bound allows Adam's normalization to amplify reassociation noise
        # on near-zero grads (measured 3.1e-5; 2·lr = 2e-4 is a sign flip)
        "ok": bool(loss_err < 1e-5 and param_err < 1e-4),
    }
    log(f"numerics gate: loss {loss_u:.6f} vs {loss_s:.6f} "
        f"(err {loss_err:.2e}), param max err {param_err:.2e} → "
        f"{'OK' if gate['ok'] else 'FAIL'}")
    return gate


def measure(jax, jnp, micro, roi=96, fs=48, n_iters=5):
    model = _build(jnp, fs, roi, scan_blocks=True)
    state, step = _state_and_step(jax, jnp, model, roi)

    @jax.jit
    def make_batch(key):
        k_img, k_lbl = jax.random.split(key)
        img = jax.random.normal(k_img, (1, micro, roi, roi, roi, 2), jnp.float32)
        lbl = jax.random.randint(k_lbl, (1, micro, roi, roi, roi), 0, NUM_CLASSES)
        return img, lbl

    img, lbl = make_batch(jax.random.key(1))
    rec = {"micro": micro, "roi": roi, "feature_size": fs}
    try:
        t0 = time.perf_counter()
        compiled = step.lower(state, img, lbl, jax.random.key(2)).compile()
        rec["compile_s"] = round(time.perf_counter() - t0, 1)
        log(f"micro={micro}: compiled in {rec['compile_s']}s")
        cost = compiled.cost_analysis()
        ca = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(ca.get("flops", 0.0)) or None if ca else None
    except Exception as e:
        rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        log(f"micro={micro}: COMPILE FAILED {rec['error']}")
        return rec

    # chain executions and difference two lengths: the dispatch+fetch
    # constant cancels (works identically on a local host and a relay)
    keys = [jax.random.key(100 + i) for i in range(2 + 2 * n_iters)]

    def chain(st, k0, k):
        m = None
        for i in range(k):
            st, m = compiled(st, img, lbl, keys[k0 + i])
        return st, float(m["loss"])

    state, _ = chain(state, 0, 1)  # warm
    t0 = time.perf_counter()
    state, _ = chain(state, 1, 1)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, _ = chain(state, 2, 1 + n_iters)
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / n_iters
    rec["ms_per_step"] = round(dt * 1e3, 1)
    rec["flops"] = flops
    rec["mfu"] = round(flops / dt / PEAK, 4) if flops else None
    rec["mvox_per_s"] = round(micro * roi**3 / dt / 1e6, 2)
    log(f"micro={micro}: {rec['ms_per_step']} ms/step "
        f"mfu={rec['mfu']} ({rec['mvox_per_s']} Mvox/s)")
    return rec


def main():
    micros = (
        [int(m) for m in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 2, 4]
    )
    roi = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    fs = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    gate = numerics_gate(jax, jnp)
    out = {"numerics_gate": gate, "sweep": [], "peak_flops": PEAK}
    if not gate["ok"]:
        log("ABORT: scan_blocks != unrolled — fix numerics before timing")
        print(json.dumps(out))
        sys.exit(1)

    for micro in micros:
        out["sweep"].append(measure(jax, jnp, micro, roi=roi, fs=fs))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
