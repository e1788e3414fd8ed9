#!/usr/bin/env python3
"""Benchmark: the BASELINE.json north-star workload on one TPU chip.

Headline metric — "SwinUNETR PET/CT **cross-attention** sliding-window
inference" (BASELINE.json north_star; reference envelope
/root/reference/configs/default.yaml:62-75,127-133): volumes/min/chip at
roi 96³, overlap 0.5, gaussian blending, bf16. Target ≥10.

The single JSON line also reports:
- ``xattn_7x7_ref_envelope_vol_per_min`` — the reference-envelope config
  (7³ windows, fusion at every stage; r2 headline, for continuity);
- ``train_step_ms`` / ``train_mfu`` — one 96³ feature-48 bf16+remat training
  step (forward+backward+adamw), micro=1 (grad-accum scan is env-gated on
  this dev box, see CLAUDE.md);
- ``train_batched_64c_micro2_scan_*`` — the 64³ micro=2 scan_blocks batched
  backward (the program size scan_blocks unblocked; 96³ micro≥2 still
  exceeds this box's remote compile helper).

Axon-relay rules baked in: volumes generated on device, inits jitted,
completion forced by fetching a device-side scalar (block_until_ready does
not block through the relay), params passed as jit arguments (never
closed over — the remote compiler rejects big HLO constants).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

VOL_SHAPE = (192, 192, 256)
ROI = (96, 96, 96)
OVERLAP = 0.5
SW_BATCH = 15  # swept r2: 8→38.2, 12→32.9, 15→40.4, 16→39.4, 24→OOM vol/min
# (the 192×192×256 grid has 45 tiles; 15 divides it exactly — zero padded
# tile slots — and feeds the MXU as well as 16)
NUM_CLASSES = 8
V5E_PEAK_BF16 = 197e12  # FLOP/s, one v5e chip


def _make_model(jnp, modality_fusion=None, window=7, fusion_stages=(0, 1, 2, 3)):
    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR

    return SwinUNETR(
        out_channels=NUM_CLASSES,
        feature_size=48,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=(window, window, window),
        dtype=jnp.bfloat16,
        modality_fusion=modality_fusion,
        fusion_stages=fusion_stages,
    )


def _bench_sliding_window(jax, jnp, model, volume, n_iters=3,
                          overlap=OVERLAP, sw_batch=SW_BATCH):
    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        sliding_window_inference,
    )

    x0 = jnp.zeros((1, *ROI, 2), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))

    def predict_fn(v, patches):
        return model.apply(v, patches, train=False)

    @jax.jit
    def run(v, vol):
        logits = sliding_window_inference(
            vol,
            predict_fn,
            roi_size=ROI,
            num_classes=NUM_CLASSES,
            overlap=overlap,
            sw_batch_size=sw_batch,
            mode="gaussian",
            params=v,
        )
        return jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    float(run(variables, volume))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_iters):
        float(run(variables, volume))
    dt = (time.perf_counter() - t0) / n_iters

    try:
        # second compile is a cache hit; cost_analysis gives program FLOPs
        flops = _flops_of(run.lower(variables, volume).compile())
    except Exception:
        flops = None
    mfu = (flops / dt / V5E_PEAK_BF16) if flops else None
    return 60.0 / dt, mfu


def _flops_of(compiled):
    """Program FLOPs from XLA cost analysis, or None."""
    try:
        cost = compiled.cost_analysis()
        ca = cost[0] if isinstance(cost, (list, tuple)) else cost
        return (float(ca.get("flops", 0.0)) or None) if ca else None
    except Exception:
        return None


def _train_fixture(jax, jnp, roi, micro, scan_blocks):
    """SwinUNETR fs=48 bf16+remat train state/step/batch at (roi, micro)."""
    from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR
    from multimodal_organ_segmentation_tpu.train.losses import dice_ce_loss
    from multimodal_organ_segmentation_tpu.train.optim import make_optimizer
    from multimodal_organ_segmentation_tpu.train.trainer import (
        TrainState,
        make_train_step,
    )
    from multimodal_organ_segmentation_tpu.utils.config import default_config

    model = SwinUNETR(
        out_channels=NUM_CLASSES,
        feature_size=48,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=(7, 7, 7),
        dtype=jnp.bfloat16,
        use_remat=True,
        scan_blocks=scan_blocks,
    )
    tx = make_optimizer(default_config())
    x0 = jnp.zeros((1, roi, roi, roi, 2), jnp.float32)
    variables = dict(
        jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))
    )
    params = variables.pop("params")
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        extra={},
    )
    step = make_train_step(
        model, tx, lambda lg, lb: dice_ce_loss(lg, lb), accum_steps=1
    )

    @jax.jit
    def make_batch(key):
        img = jax.random.normal(key, (1, micro, roi, roi, roi, 2), jnp.float32)
        lbl = jax.random.randint(key, (1, micro, roi, roi, roi), 0, NUM_CLASSES)
        return img, lbl

    img, lbl = make_batch(jax.random.key(1))
    return state, step, img, lbl


def _bench_train_step(jax, jnp, n_iters=5):
    """96³ fs=48 bf16+remat train step (micro=1): ms/step and MFU."""
    state, step, img, lbl = _train_fixture(jax, jnp, ROI[0], 1, scan_blocks=False)

    # Through the axon relay a single 4-byte fetch costs seconds — far more
    # than the ~0.2s step itself. Chain n_steps inside ONE jit (dynamic trip
    # count → while loop, one compile) and difference two trip counts so the
    # dispatch+fetch constant cancels exactly.
    @jax.jit
    def run_steps(state, img, lbl, key, n_steps):
        def body(i, carry):
            st, _ = carry
            st, m = step(st, img, lbl, jax.random.fold_in(key, i))
            return st, m["loss"].astype(jnp.float32)

        _, loss = jax.lax.fori_loop(
            0, n_steps, body, (state, jnp.zeros((), jnp.float32))
        )
        return loss

    try:
        flops = _flops_of(step.lower(state, img, lbl, jax.random.key(2)).compile())
    except Exception:
        flops = None

    float(run_steps(state, img, lbl, jax.random.key(2), 1))  # compile + warm
    k_short, k_long = 1, 1 + n_iters
    t0 = time.perf_counter()
    float(run_steps(state, img, lbl, jax.random.key(3), k_short))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_steps(state, img, lbl, jax.random.key(3), k_long))
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / (k_long - k_short)
    mfu = (flops / dt / V5E_PEAK_BF16) if flops else None
    return dt * 1e3, mfu


def _bench_train_step_batched(jax, jnp, roi=64, micro=2, n_iters=5):
    """Batched backward proof: 64³ fs=48 micro=2 with scan_blocks.

    r2 this never compiled on the dev box; scan_blocks (lax.scan over the
    Swin blocks of each stage) shrank the backward HLO enough. Returns
    (ms/step, mfu, Mvox/s) or (None,)*3 if the remote compiler refuses —
    the headline must survive env flakiness.
    """
    try:
        state, step, img, lbl = _train_fixture(jax, jnp, roi, micro, scan_blocks=True)
        compiled = step.lower(state, img, lbl, jax.random.key(2)).compile()
        flops = _flops_of(compiled)

        # A jitted fori_loop wrapper around a scan_blocks step hangs the
        # remote compile helper (CLAUDE.md) — chain async dispatches of the
        # compiled executable instead and difference two chain lengths so
        # the relay fetch constant cancels.
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
        mfu = (flops / dt / V5E_PEAK_BF16) if flops else None
        return dt * 1e3, mfu, micro * roi**3 / dt / 1e6
    except Exception as e:  # env-dependent remote-compiler limit
        print(f"# batched train step unavailable: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr, flush=True)
        return None, None, None


def _backend_probe(timeout_s: int = 600):
    """Probe the TPU backend in a CHILD process with a hard timeout.

    The axon relay can go hard-down (r3: backend init hung indefinitely
    for >10 h); without this guard the whole bench hangs past any driver
    timeout and records nothing. A child process is the only safe probe —
    a hung backend init in THIS process cannot be cancelled.

    Returns ``(error_kind, detail)``: ``(None, None)`` when healthy;
    ``("tpu_backend_unreachable", ...)`` only on an actual HANG (the relay
    outage signature); ``("backend_probe_failed", stderr_tail)`` when the
    child exits nonzero — that is a code/env regression, NOT the outage,
    and must be surfaced as such."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "print('OK', float(jax.jit(lambda: jnp.sum(jnp.ones((8,8))))()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return "tpu_backend_unreachable", f"probe hung >{timeout_s}s"
    if r.returncode == 0 and b"OK" in r.stdout:
        return None, None
    tail = (r.stderr or r.stdout or b"").decode(errors="replace")[-400:]
    return "backend_probe_failed", f"exit={r.returncode}: {tail}"


def _load_prior_bench(bench_dir=None):
    """Parsed result of the most recent ``BENCH_r*.json`` driver record.

    Returns ``(round_n, parsed_result)`` or ``(None, None)``. The driver
    writes ``{"n": round, "parsed": <our JSON line>}``; an outage round
    (value 0.0 / "error" in extra) is skipped — comparing against it would
    flag everything as an improvement and nothing as a regression.
    """
    if bench_dir is None:
        bench_dir = Path(__file__).resolve().parent
    best = (None, None)
    for p in sorted(Path(bench_dir).glob("BENCH_r*.json")):
        try:
            rec = json.loads(p.read_text())
            parsed = rec.get("parsed") or {}
            n = int(rec.get("n", 0))
        except Exception:
            continue
        if not parsed or not parsed.get("value"):
            continue
        if (parsed.get("extra") or {}).get("error"):
            continue
        if best[0] is None or n > best[0]:
            best = (n, parsed)
    return best


def _check_regressions(result, threshold=0.07, bench_dir=None):
    """Self-report deltas vs the previous round's bench (VERDICT r4 #10).

    Compares the headline ``value`` and every shared numeric ``extra``
    against the latest non-outage ``BENCH_r*.json``. Keys containing
    ``_ms`` are lower-is-better; everything else (vol/min, MFU, Mvox/s)
    is higher-is-better. Any metric worse than ``threshold`` (7%) prints
    an explicit REGRESSION line on stderr; the full delta table lands in
    ``result["regressions"]`` either way so the driver record carries it.
    """
    prior_n, prior = _load_prior_bench(bench_dir)
    if prior is None:
        return
    pairs = [("value", prior.get("value"), result.get("value"))]
    prior_extra = prior.get("extra") or {}
    for k, cur in (result.get("extra") or {}).items():
        pairs.append((k, prior_extra.get(k), cur))
    report = {"vs_round": prior_n, "threshold": threshold, "worse": []}
    for key, old, new in pairs:
        if not isinstance(old, (int, float)) or not isinstance(new, (int, float)):
            continue
        if not old:
            continue
        lower_better = "_ms" in key
        ratio = (old / new) if lower_better else (new / old)
        delta_pct = round((ratio - 1.0) * 100, 2)  # + = better, - = worse
        report.setdefault("deltas", {})[key] = delta_pct
        if ratio < 1.0 - threshold:
            report["worse"].append(
                {"key": key, "prior": old, "current": new, "delta_pct": delta_pct}
            )
            print(
                f"REGRESSION vs r{prior_n}: {key} {old} -> {new} "
                f"({delta_pct:+.1f}%)",
                file=sys.stderr, flush=True,
            )
    result["regressions"] = report


def _install_partial_emitter(result, state):
    """Emit the JSON measured SO FAR if the process is SIGTERMed.

    ``timeout`` (and most drivers) send SIGTERM at their budget; a
    cold-cache run through a slow relay can exceed it mid-extras (r5: one
    run hit 1154s on the flagship compile alone). The headline is measured
    first, so a truncated run still records a valid line instead of
    nothing. ``os._exit`` skips XLA/relay teardown, which can hang."""
    import os
    import signal

    def handler(signum, frame):
        if not state["printed"]:
            state["printed"] = True
            result["extra"]["truncated"] = (
                "SIGTERM mid-bench (budget exceeded); extras measured so far"
            )
            _check_regressions(result)
            print(json.dumps(result), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, handler)


def main():
    err_kind, err_detail = _backend_probe()
    if err_kind == "tpu_backend_unreachable":
        # transient relay blips happen (r5: one probe hang at ~03:45 UTC,
        # healthy again 10 min later) — distinguish a blip from the r3-style
        # hard outage with ONE retry before recording an error bench
        print("# backend probe hung; retrying once in 60s", file=sys.stderr,
              flush=True)
        time.sleep(60)
        err_kind, err_detail = _backend_probe()
    if err_kind is not None:
        # honest failure: report WHICH failure instead of hanging the driver
        print(
            f"# TPU backend probe failed ({err_kind}): {err_detail}",
            file=sys.stderr, flush=True,
        )
        desc = (
            "TPU backend unreachable (axon relay down; backend init hangs)"
            if err_kind == "tpu_backend_unreachable"
            else "backend probe crashed — code/env regression, not the relay"
        )
        print(json.dumps({
            "metric": "volumes/min/chip sliding-window inference (SwinUNETR "
            f"+ PET/CT cross-attention fusion) — NOT MEASURED: {desc}. Last "
            "measured value on this code: 43.53 (see CLAUDE.md perf log).",
            "value": 0.0,
            "unit": "volumes/min/chip",
            "vs_baseline": 0.0,
            "extra": {"error": err_kind, "detail": err_detail},
        }))
        return

    import jax
    import jax.numpy as jnp

    volume = jax.jit(
        lambda key: jax.random.normal(key, (*VOL_SHAPE, 2), jnp.float32)
    )(jax.random.key(1))

    t_start = time.time()
    # headline: the native flagship — fusion ON, 6³ windows (every stage of
    # a 96³ ROI divides 6 → zero window padding), cross-attention from /8
    # (the /4 stage holds 13824 tokens and costs ~6% for little fusion
    # bandwidth; measured A/B r3: 6³ all-stages 41.1, 6³ /8+ 43.6,
    # 7³ all-stages 37.7 vol/min)
    native_vpm, native_mfu = _bench_sliding_window(
        jax,
        jnp,
        _make_model(jnp, "cross_attention", window=6, fusion_stages=(1, 2, 3)),
        volume,
    )
    print(f"# native flagship (6^3, xattn /8+): {native_vpm:.2f} vol/min "
          f"mfu={native_mfu} ({time.time()-t_start:.0f}s)",
          file=sys.stderr, flush=True)
    # headline is in hand: from here on a SIGTERM (driver budget) emits the
    # partial result instead of dying silently
    result = {
        "metric": "volumes/min/chip sliding-window inference (SwinUNETR + PET/CT "
        f"cross-attention fusion, 96^3 roi, {VOL_SHAPE[0]}x{VOL_SHAPE[1]}x"
        f"{VOL_SHAPE[2]} volume, bf16) — the BASELINE.json north-star workload; "
        "native flagship config (6^3 windows = zero padding at every pyramid "
        "stage, cross-attention fusion from /8)",
        "value": round(native_vpm, 3),
        "unit": "volumes/min/chip",
        "vs_baseline": round(native_vpm / 10.0, 3),
        "extra": {
            "inference_mfu": round(native_mfu, 4) if native_mfu else None,
        },
    }
    state = {"printed": False}
    _install_partial_emitter(result, state)
    # the shipped fast-serving preset (configs/swin_unetr_xattn_flagship_
    # fast.yaml): same flagship model, overlap 0.25 + sw_batch 12 (36 tiles
    # divide exactly); quality bound CI-enforced by tests/test_fast_profile.py
    fast_vpm, _ = _bench_sliding_window(
        jax,
        jnp,
        _make_model(jnp, "cross_attention", window=6, fusion_stages=(1, 2, 3)),
        volume,
        overlap=0.25,
        sw_batch=12,
    )
    print(f"# fast preset (overlap 0.25, sw 12): {fast_vpm:.2f} vol/min "
          f"({time.time()-t_start:.0f}s)", file=sys.stderr, flush=True)
    result["extra"]["fast_preset_ov025_sw12_vol_per_min"] = round(fast_vpm, 3)
    # reference-envelope config (7³ windows, fusion at every stage) for
    # round-over-round continuity
    xattn_vpm, _ = _bench_sliding_window(
        jax, jnp, _make_model(jnp, "cross_attention"), volume
    )
    print(f"# xattn 7^3 ref-envelope: {xattn_vpm:.2f} vol/min ({time.time()-t_start:.0f}s)",
          file=sys.stderr, flush=True)
    result["extra"]["xattn_7x7_ref_envelope_vol_per_min"] = round(xattn_vpm, 3)
    train_ms, train_mfu = _bench_train_step(jax, jnp)
    print(f"# train step: {train_ms:.1f} ms mfu={train_mfu} ({time.time()-t_start:.0f}s)",
          file=sys.stderr, flush=True)
    result["extra"]["train_step_ms_96c_fs48_bf16_remat_micro1"] = round(train_ms, 1)
    result["extra"]["train_mfu"] = round(train_mfu, 4) if train_mfu else None
    # live measurement: the batched backward that scan_blocks unblocked
    # (r2: never compiled on this dev box); 96^3 micro>=2 remains an env
    # limit of the remote compile helper, so the headline train number
    # stays 96^3 micro=1
    b_ms, b_mfu, b_mvox = _bench_train_step_batched(jax, jnp)
    print(f"# batched train step (64^3 micro=2 scan_blocks): {b_ms} ms "
          f"mfu={b_mfu} ({time.time()-t_start:.0f}s)",
          file=sys.stderr, flush=True)
    result["extra"]["train_batched_64c_micro2_scan_ms"] = (
        round(b_ms, 1) if b_ms else None
    )
    result["extra"]["train_batched_64c_micro2_scan_mfu"] = (
        round(b_mfu, 4) if b_mfu else None
    )
    result["extra"]["train_batched_64c_micro2_scan_mvox_per_s"] = (
        round(b_mvox, 2) if b_mvox else None
    )

    state["printed"] = True
    _check_regressions(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
