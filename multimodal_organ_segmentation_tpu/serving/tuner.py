"""On-device serving autotuner (``--mode tune``).

The serving throughput of the sliding-window engine is dominated by two
knobs whose best values are hardware- and model-specific: the tile chunk
size (``inference.batch_size`` — how many ROI tiles feed the MXU per
forward) and the window overlap (``inference.sliding_window.overlap`` —
stride vs. blending quality). The perf log shows the spread is large
(sw_batch 4 → 14.5 vs 15 → 40.3 vol/min on the flagship; overlap 0.5 →
43.6 vs 0.125 → 50.7) and NOT monotonic — the chunk must divide the tile
count well and fit HBM, so guessing is wrong on both ends.

The reference has no analog: its MONAI sliding window runs whatever
``sw_batch_size`` the YAML says (/root/reference/src/trainer/trainer.py:
370-395). This tuner measures the candidates ON THE TARGET DEVICE through
the exact serving path (``SlidingWindowRunner``, the same class behind
``--mode serve`` and batch predict) and writes the winner as a config
fragment.

Relay-safe timing: the volume is created on device, each run is fetched
as ONE scalar (a device-side argmax-sum reduce), and compile failures
(HBM OOM at large chunks) are recorded per candidate instead of aborting
the sweep.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional


def tune_serving(
    config,
    logger=None,
    checkpoint: Optional[str] = None,
) -> Dict[str, Any]:
    """Sweep (overlap, sw_batch) serving candidates; return measurements.

    Config surface (all optional, under ``tune:``)::

        tune:
          sw_batches: [4, 8, 12, 16]   # tile-chunk candidates
          overlaps: [0.5, 0.25, 0.125] # window-overlap candidates (default:
                                       # the config's overlap + the measured
                                       # fast profiles 0.25 / 0.125 — see
                                       # configs/swin_unetr_xattn_flagship_fast.yaml
                                       # and tests/test_fast_profile.py's
                                       # quality bound)
          volume_shape: [192, 192, 256]  # representative case shape
          repeats: 3                   # timed runs per candidate

    Returns ``{"results": [...], "best": {...} | None}`` where each result
    carries ``vol_per_min`` or ``error``. Params are loaded from
    ``checkpoint`` when given (timing is value-independent, so a random
    init measures the same program).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_organ_segmentation_tpu.ops.sliding_window import (
        SlidingWindowRunner,
        predict_labels,
    )
    from multimodal_organ_segmentation_tpu.train.trainer import Trainer

    t_cfg = config.get("tune", {}) or {}
    if hasattr(t_cfg, "to_dict"):
        t_cfg = t_cfg.to_dict()
    sw_batches = [int(s) for s in t_cfg.get("sw_batches", [4, 8, 12, 16])]
    default_ov = float(config.get("inference.sliding_window.overlap", 0.5))
    # default sweep proposes the quality-certified fast profiles alongside
    # the config's own overlap (dedup'd, config overlap first)
    fast_default = [default_ov] + [o for o in (0.25, 0.125) if o != default_ov]
    allow_turbo = bool(t_cfg.get("allow_turbo", False))
    overlaps = [float(o) for o in t_cfg.get("overlaps", fast_default)]
    vol_shape = tuple(int(s) for s in t_cfg.get("volume_shape", [192, 192, 256]))
    repeats = max(1, int(t_cfg.get("repeats", 3)))

    roi = tuple(config.get("inference.sliding_window.roi_size", [96, 96, 96]))
    sw_mode = str(config.get("inference.sliding_window.mode", "gaussian"))
    n_mod = len(config.get("data.modalities", ["CT", "PET"]))

    trainer = Trainer(config, logger=logger)
    trainer.init_state(np.zeros((*roi, n_mod), np.float32))
    if checkpoint:
        trainer.load_params(checkpoint)
    elif logger:
        logger.info(
            "tune: no --checkpoint; timing a random init "
            "(throughput is independent of the weight values)"
        )
    members = trainer._inference_members()
    trainer.freeze_for_inference()  # moments off-chip before tile chunks
    predict_fn = trainer._predict_fn
    dp_mesh = trainer._inference_mesh()
    tta = bool(config.get("inference.tta", False))
    is_ensemble = len(members) > 1

    volume = jnp.zeros((*vol_shape, n_mod), jnp.float32)
    results: List[Dict[str, Any]] = []
    for ov in overlaps:
        for sw in sw_batches:
            rec: Dict[str, Any] = {
                "overlap": ov, "sw_batch": sw, "volume_shape": list(vol_shape),
            }
            runner = SlidingWindowRunner(
                predict_fn,
                roi_size=roi,
                num_classes=trainer.num_classes,
                overlap=ov,
                sw_batch_size=sw,
                mode=sw_mode,
                mesh=dp_mesh,
            )

            # the timed program is the DEPLOYED one: same TTA flips and
            # ensemble softmax-average rule as predict_labels serves
            if is_ensemble:
                def run_sw(vol):
                    acc = None
                    for v in members:
                        p = jax.nn.softmax(runner(vol, v), axis=-1)
                        acc = p if acc is None else acc + p
                    return acc / len(members)
            else:
                run_sw = lambda vol: runner(vol, members[0])  # noqa: E731

            def run_once():
                labels_dev = predict_labels(run_sw, volume, tta=tta)
                return float(jnp.sum(labels_dev.astype(jnp.int32)))

            try:
                t0 = time.perf_counter()
                run_once()  # compile + warm
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
                t0 = time.perf_counter()
                for _ in range(repeats):
                    run_once()
                dt = (time.perf_counter() - t0) / repeats
                rec["seconds_per_volume"] = round(dt, 3)
                rec["vol_per_min"] = round(60.0 / dt, 2)
            except Exception as e:  # compile OOM etc.: record, keep sweeping
                rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            results.append(rec)
            if logger:
                logger.info(
                    f"tune: overlap={ov} sw_batch={sw} → "
                    + (
                        f"{rec['vol_per_min']} vol/min "
                        f"(compile {rec['compile_s']}s)"
                        if "vol_per_min" in rec
                        else f"FAILED ({rec['error']})"
                    )
                )

    ok = [r for r in results if "vol_per_min" in r]
    # Quality-aware selection: candidates at overlap >= 0.25 sit inside the
    # CI-bounded 0.5% Dice-parity tier (tests/test_fast_profile.py); 0.125
    # ("turbo", ~1% measured Dice trade — see configs/
    # swin_unetr_xattn_flagship_fast.yaml) is measured but only ELIGIBLE as
    # "best" with ``tune.allow_turbo: true`` — or when every successful
    # candidate is sub-tier (the user swept ONLY turbo overlaps, which is
    # its own opt-in). The full sweep is recorded either way.
    pool = ok
    if not allow_turbo:
        tier = [r for r in ok if r["overlap"] >= 0.25 - 1e-9]
        pool = tier or ok
    best = max(pool, key=lambda r: r["vol_per_min"]) if pool else None
    return {"results": results, "best": best}


def write_profile(report: Dict[str, Any], path) -> None:
    """Write the winning candidate as a pure YAML config fragment.

    The fragment's keys are real config paths — apply with
    ``--set inference.batch_size=... --set
    inference.sliding_window.overlap=...`` or merge into a config file.
    The full sweep record goes to a sibling ``<path>.report.json`` so the
    fragment stays merge-clean.
    """
    import json

    import yaml

    best = report.get("best")
    if best is None:
        raise RuntimeError(
            "every tuning candidate failed; nothing to write "
            f"({[r.get('error') for r in report['results']]})"
        )
    doc = {
        "inference": {
            "batch_size": int(best["sw_batch"]),
            "sliding_window": {"overlap": float(best["overlap"])},
        },
    }
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w") as f:
        f.write(
            "# serving profile measured by --mode tune "
            f"({best['vol_per_min']} vol/min at "
            f"overlap={best['overlap']}, sw_batch={best['sw_batch']})\n"
        )
        if float(best["overlap"]) < 0.25 - 1e-9:
            f.write(
                "# NOTE: overlap < 0.25 is the 'turbo' tier — measured "
                "~1% Dice trade vs overlap 0.5 (see configs/"
                "swin_unetr_xattn_flagship_fast.yaml); opt-in only.\n"
            )
        yaml.safe_dump(doc, f, sort_keys=False)
    with open(p.with_suffix(p.suffix + ".report.json"), "w") as f:
        json.dump(report["results"], f, indent=2)
