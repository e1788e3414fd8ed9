"""CLI: five modes (preprocess / train / eval / inference / analysis).

Reference parity: main.py:41-549 — same mode vocabulary, flags, and
config-override surface, plus an ``explain`` mode that actually wires the
explainability tools (the reference declares them in config but never
invokes them — SURVEY.md §1).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from multimodal_organ_segmentation_tpu.utils.config import (
    load_config,
    merge_config_with_args,
)
from multimodal_organ_segmentation_tpu.utils.logger import setup_logger
from multimodal_organ_segmentation_tpu.utils.prng import set_seed

_DEFAULT_CONFIG = str(Path(__file__).resolve().parents[1] / "configs" / "default.yaml")


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="TPU-native multi-modal medical image segmentation",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument(
        "--mode", required=True,
        choices=[
            "train", "eval", "inference", "preprocess", "analysis", "explain",
            "export", "serve", "tune",
        ],
    )
    parser.add_argument("--config", default=_DEFAULT_CONFIG)
    parser.add_argument("--exp-name", dest="exp_name", default=None)
    parser.add_argument("--output-dir", dest="output_dir", default=None)
    parser.add_argument("--input", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--format",
        default="torch",
        choices=["torch", "stablehlo"],
        help="export mode artifact: 'torch' = reference-loadable .pth state "
        "dict; 'stablehlo' = portable jax.export zip (weights baked in, "
        "symbolic tile-batch dim, serves with no model code)",
    )
    parser.add_argument("--resume", default=None)
    parser.add_argument(
        "--pretrained", default=None,
        help="reference torch .pth to import as initial weights",
    )
    parser.add_argument("--device", default=None, choices=["tpu", "cpu"])
    parser.add_argument("--num-workers", dest="num_workers", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument(
        "--model", default=None,
        choices=["swin_unetr", "unet", "unet3d", "attention_unet", "dual_encoder"],
    )
    parser.add_argument(
        "--fusion", default=None,
        # the reference CLI stops at 4 (main.py:167-173) even though its
        # fusion package exports 6 strategies; all are selectable here
        choices=[
            "early", "late", "attention", "cross_attention",
            "bidirectional", "suv_guided",
        ],
    )
    parser.add_argument("--modalities", nargs="+", default=None)
    parser.add_argument("--suv-analysis", dest="suv_analysis", action="store_true")
    parser.add_argument("--tmtv-analysis", dest="tmtv_analysis", action="store_true")
    parser.add_argument("--histogram", action="store_true")
    parser.add_argument("--generate-report", dest="generate_report", action="store_true")
    parser.add_argument("--gradcam", action="store_true")
    parser.add_argument("--attention-maps", dest="attention_maps", action="store_true")
    parser.add_argument("--tsne", action="store_true")
    parser.add_argument(
        "--port", type=int, default=None, help="HTTP port for serve mode"
    )
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=None,
        metavar="KEY=VALUE",
        help="override any config key by dotted path (repeatable); the "
        "value is YAML-parsed, e.g. --set training.ema_decay=0.999 "
        "--set experiment.tensorboard=true. Keys must exist in the "
        "loaded config or the shipped default.yaml schema (typo "
        "protection); prefix with + to create a new key, e.g. "
        "--set '+model.backbone.features=[16,32,64]'",
    )
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument("--debug", action="store_true")
    return parser.parse_args(argv)


def run_train(config, logger) -> None:
    from multimodal_organ_segmentation_tpu.data import get_dataloader
    from multimodal_organ_segmentation_tpu.train.trainer import Trainer

    logger.info("Starting training pipeline")
    logger.info(f"Experiment: {config.get('experiment.name')}")

    train_loader = get_dataloader(config, split="train")
    val_loader = get_dataloader(config, split="val")
    trainer = Trainer(
        config,
        train_loader=train_loader,
        val_loader=val_loader,
        logger=logger,
        resume_from=config["_args"].get("resume"),
    )
    trainer.train()
    logger.info("Training completed")


def run_eval(config, logger) -> None:
    from multimodal_organ_segmentation_tpu.data import get_dataloader
    from multimodal_organ_segmentation_tpu.train.trainer import Trainer

    ckpt = config["_args"].get("checkpoint")
    if ckpt is None:
        raise ValueError("--checkpoint is required for evaluation mode")
    # the checkpoint is self-sufficient; a model.pretrained left over from
    # the training YAML must not be required (or even read) here
    config.set("model.pretrained", None)

    import numpy as np

    logger.info(f"Evaluating checkpoint: {ckpt}")
    native = bool(config.get("evaluation.sliding_window", False))
    if native:
        # native-grid evaluation: sliding-window on ORIGINAL grids with
        # per-class Dice + HD95 (the reference can only score the
        # resized-96³ quirk grid, src/trainer/trainer.py:265-301)
        from multimodal_organ_segmentation_tpu.data.dataloader import DataLoader
        from multimodal_organ_segmentation_tpu.data.dataset import get_dataset
        from multimodal_organ_segmentation_tpu.data.transforms import get_transforms

        dataset = get_dataset(
            config, split="test", transform=get_transforms(config, mode="native")
        )
        loader = DataLoader(
            dataset,
            batch_size=1,  # native grids vary per case; never pad-collate them
            shuffle=False,
            num_workers=int(config.get("hardware.num_workers", 4)),
        )
        trainer = Trainer(config, logger=logger)
        roi = tuple(config.get("inference.sliding_window.roi_size", [96, 96, 96]))
        n_mod = len(config.get("data.modalities", ["CT", "PET"]))
        trainer.init_state(np.zeros((*roi, n_mod), np.float32))
        trainer.load_params(ckpt)
        metrics = trainer.evaluate_native(loader)
    else:
        test_loader = get_dataloader(config, split="test")
        trainer = Trainer(config, val_loader=test_loader, logger=logger)
        first = next(iter(test_loader))
        trainer.init_state(np.asarray(first["image"][0]))
        trainer.load_params(ckpt)
        metrics = trainer.evaluate()
    logger.info(f"Results: {metrics}")

    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        # cohort-sharded eval merges full metrics onto EVERY process —
        # only process 0 writes them (shared-filesystem write race)
        logger.info("Non-zero process: metrics written by process 0")
        return

    from multimodal_organ_segmentation_tpu.utils.io import save_json

    out = config["_args"].get("output")
    name = "eval_native.json" if native else "eval_metrics.json"
    shard_val = config.get("evaluation.case_shard", "auto")
    if native and isinstance(shard_val, (list, tuple)) and int(shard_val[1]) > 1:
        # explicit [pid, nproc] = coordinator-less job array: every worker
        # is process 0 and carries PARTIAL metrics — suffix the slot so
        # workers on a shared filesystem don't clobber each other
        name = f"eval_native.w{int(shard_val[0])}of{int(shard_val[1])}.json"
    metrics_path = (
        Path(out) / name if out else trainer.output_dir / name
    )
    metrics_path.parent.mkdir(parents=True, exist_ok=True)
    save_json(metrics, metrics_path)
    logger.info(f"Saved metrics: {metrics_path}")

    # native-grid eval: per-case table for clinical review (one row per
    # case, flattened per-class columns) next to the cohort JSON
    if metrics.get("per_case"):
        import csv

        rows = metrics["per_case"]
        csv_path = metrics_path.with_name(metrics_path.stem + "_cases.csv")
        n_cls = len(rows[0]["dice_per_class"])
        cols = ["case", "dice"] + [f"dice_c{c}" for c in range(n_cls)]
        hd_key = next(k for k in rows[0] if k.startswith("hd"))
        cols += [hd_key, "surface_dice"] + [
            f"surface_dice_c{c}" for c in range(n_cls)
        ]
        cols += ["assd"] + [f"assd_c{c}" for c in range(n_cls)]
        # opt-in columns (lesion detection, calibration) appear only when
        # their evaluation.* switches produced them
        opt_cols = [
            k for k in ("lesion_tp", "lesion_fp", "lesion_fn", "ece")
            if k in rows[0]
        ]
        cols += opt_cols
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for r in rows:
                w.writerow(
                    [r["case"], r["dice"], *r["dice_per_class"], r[hd_key],
                     r["surface_dice"], *r["surface_dice_per_class"],
                     r.get("assd"), *r.get("assd_per_class", [None] * n_cls),
                     *[r.get(k) for k in opt_cols]]
                )
        logger.info(f"Saved per-case metrics: {csv_path}")


def run_inference(config, logger) -> None:
    from multimodal_organ_segmentation_tpu.train.trainer import Trainer

    ckpt = config["_args"].get("checkpoint")
    input_path = config["_args"].get("input")
    output_path = config["_args"].get("output") or "outputs/predictions"
    if ckpt is None:
        raise ValueError("--checkpoint is required for inference mode")
    if input_path is None:
        raise ValueError("--input is required for inference mode")

    logger.info(f"Inference: {input_path} → {output_path}")
    trainer = Trainer(config, logger=logger)
    import numpy as np

    roi = tuple(config.get("inference.sliding_window.roi_size", [96, 96, 96]))
    n_mod = len(config.get("data.modalities", ["CT", "PET"]))
    trainer.init_state(np.zeros((*roi, n_mod), np.float32))
    trainer.load_params(ckpt)
    trainer.predict(input_path, output_path)
    logger.info("Inference completed")


def run_preprocess(config, logger) -> None:
    from multimodal_organ_segmentation_tpu.preprocessing import (
        DicomConverter,
        ImageRegistration,
        SUVCalculator,
    )

    input_path = config["_args"].get("input")
    output_path = config["_args"].get("output") or "data/processed"
    if input_path is None:
        raise ValueError("--input is required for preprocess mode")

    logger.info(f"Preprocess: {input_path} → {output_path}")
    os.makedirs(output_path, exist_ok=True)
    converter = DicomConverter(config)
    suv_calc = SUVCalculator(config)
    registrator = ImageRegistration(config)

    modalities = list(config.get("data.modalities", ["CT", "PET"]))
    for modality in modalities:
        mod_in = os.path.join(input_path, modality)
        mod_out = os.path.join(output_path, modality)
        if os.path.exists(mod_in):
            logger.info(f"Processing {modality}")
            nifti_path = converter.convert(mod_in, mod_out, modality=modality)
            if nifti_path is not None:
                # spacing resample if configured (the reference declares
                # target_spacing but never applies it)
                spacing = config.get(
                    f"data.preprocessing.{modality.lower()}.target_spacing"
                )
                if spacing:
                    from multimodal_organ_segmentation_tpu.preprocessing.resample import (
                        resample_file,
                    )

                    resample_file(nifti_path, nifti_path, list(spacing))
            if modality == "PET" and nifti_path is not None:
                # SUV from the converted volume + its saved metadata
                # (the reference passes the raw DICOM dir here, which its
                # own nib.load would reject — conscious fix)
                suv_calc.calculate(nifti_path, mod_out)

    if len(modalities) > 1 and bool(config.get("data.registration.enabled", False)):
        logger.info("Registering images")
        registrator.register(output_path, config.get("data.primary_modality", "CT"))
    logger.info("Preprocessing completed")


def run_analysis(config, logger) -> None:
    from multimodal_organ_segmentation_tpu.analysis import (
        HistogramAnalyzer,
        ReportGenerator,
        SUVAnalyzer,
        TMTVAnalyzer,
    )

    input_path = config["_args"].get("input")
    output_path = config["_args"].get("output") or "outputs/analysis"
    if input_path is None:
        raise ValueError("--input is required for analysis mode")

    logger.info(f"Analysis: {input_path} → {output_path}")
    os.makedirs(output_path, exist_ok=True)
    results = {}
    if bool(config.get("analysis.suv.enabled", False)):
        results["suv"] = SUVAnalyzer(config).analyze(input_path, output_path)
    if bool(config.get("analysis.tmtv.enabled", False)):
        results["tmtv"] = TMTVAnalyzer(config).analyze(input_path, output_path)
    if bool(config.get("analysis.histogram.enabled", False)):
        results["histogram"] = HistogramAnalyzer(config).analyze(
            input_path, output_path
        )
    if config["_args"].get("generate_report", False):
        ReportGenerator(config).generate(results, output_path)
    logger.info("Analysis completed")


def run_export(config, logger) -> None:
    """Export an Orbax checkpoint to a deployment artifact.

    ``--format torch`` (default): reference-loadable ``.pth`` state dict
    (two-way interop; the inverse of ``--pretrained`` import).
    ``--format stablehlo``: portable ``jax.export`` zip — weights baked
    in, symbolic tile-batch dim, serves with no model code.
    """
    import numpy as np

    from multimodal_organ_segmentation_tpu.models.build import build_model
    from multimodal_organ_segmentation_tpu.models.torch_export import (
        export_torch_checkpoint,
    )
    from multimodal_organ_segmentation_tpu.train.checkpoint import load_checkpoint
    from multimodal_organ_segmentation_tpu.train.optim import make_optimizer
    from multimodal_organ_segmentation_tpu.train.trainer import TrainState

    ckpt_path = config["_args"].get("checkpoint")
    out = config["_args"].get("output")
    if ckpt_path is None or out is None:
        raise ValueError("--checkpoint and --output are required for export mode")

    import jax
    import jax.numpy as jnp

    config.set("model.pretrained", None)
    model = build_model(config)
    roi = tuple(config.get("model.backbone.img_size", [96, 96, 96]))
    n_mod = len(config.get("data.modalities", ["CT", "PET"]))
    x0 = jnp.zeros((1, *roi, n_mod), jnp.float32)
    variables = dict(
        jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.key(0))
    )
    tx = make_optimizer(config)
    params0 = variables.pop("params")
    target = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params0,
        opt_state=tx.init(params0),
        extra={
            k: v
            for k, v in variables.items()
            if k not in ("intermediates", "perturbations")
        },
    )
    ckpt = load_checkpoint(ckpt_path, target=target)
    from multimodal_organ_segmentation_tpu.train.trainer import (
        select_infer_params,
    )

    # export what you deploy: the same weight-selection rule as eval/predict
    export_params = select_infer_params(ckpt["tree"], config)
    if export_params is not ckpt["tree"].params:
        logger.info("checkpoint carries EMA params — exporting the EMA weights")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    fmt = config["_args"].get("format", "torch")
    if fmt == "stablehlo":
        from multimodal_organ_segmentation_tpu.models.stablehlo_export import (
            export_stablehlo,
        )

        variables = {"params": export_params, **ckpt["tree"].extra}
        export_stablehlo(
            model,
            variables,
            out,
            roi=roi,
            in_channels=n_mod,
            metadata={
                "model": str(config.get("model.name", "unet3d")),
                "num_classes": int(config.get("model.out_channels", 0) or 0),
                "modalities": list(config.get("data.modalities", [])),
                "epoch": int(ckpt["epoch"]),
                "best_metric": float(ckpt["best_metric"]),
            },
        )
        logger.info(f"Exported stablehlo artifact: {out}")
        return
    export_torch_checkpoint(
        export_params,
        config,
        out,
        epoch=ckpt["epoch"],
        best_metric=ckpt["best_metric"],
        history=ckpt["history"],
    )
    logger.info(f"Exported torch checkpoint: {out}")


def run_serve(config, logger) -> None:
    """Resident HTTP segmentation service over the shape-bucketed runner
    (the reference's only serving surface is the one-shot batch CLI,
    src/trainer/trainer.py:303-368)."""
    from multimodal_organ_segmentation_tpu.serving import run_serve as _serve

    _serve(config, logger)


def run_tune(config, logger) -> None:
    """Measure serving candidates (tile chunk size × overlap) on the
    target device and write the winning profile (the reference runs
    whatever sw_batch_size the YAML says; this measures it)."""
    from multimodal_organ_segmentation_tpu.serving.tuner import (
        tune_serving,
        write_profile,
    )

    ckpt = config["_args"].get("checkpoint")
    report = tune_serving(config, logger=logger, checkpoint=ckpt)
    out = config["_args"].get("output")
    profile_path = (
        Path(out)
        if out
        else Path(config.get("experiment.output_dir", "outputs"))
        / str(config.get("experiment.name", "exp"))
        / "tuned_serving.yaml"
    )
    write_profile(report, profile_path)
    best = report["best"]
    logger.info(
        f"Best: overlap={best['overlap']} sw_batch={best['sw_batch']} → "
        f"{best['vol_per_min']} vol/min; profile saved: {profile_path} "
        "(apply with --set inference.batch_size=... --set "
        "inference.sliding_window.overlap=...)"
    )


def run_explain(config, logger) -> None:
    from multimodal_organ_segmentation_tpu.explainability import run_explainability

    ckpt = config["_args"].get("checkpoint")
    input_path = config["_args"].get("input")
    output_path = config["_args"].get("output") or "outputs/explain"
    if ckpt is None or input_path is None:
        raise ValueError("--checkpoint and --input are required for explain mode")
    run_explainability(config, ckpt, input_path, output_path, logger)


def configure_compilation_cache(config) -> None:
    """Enable JAX's persistent XLA compilation cache when configured.

    TPU compiles of the sliding-window program run minutes; with
    ``hardware.compilation_cache_dir`` set, a server restart or a second
    CLI run on the same volume shapes deserializes the cached executable
    instead of recompiling. The reference has no analog (torch eager never
    compiles).
    """
    cache_dir = config.get("hardware.compilation_cache_dir")
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # default heuristics skip sub-second/small programs; serving warmup
    # wants the small eval/postprocess programs cached too, so persist all
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main(argv=None) -> None:
    args = parse_args(argv)
    config = load_config(args.config)
    # the shipped default.yaml is the documented schema: its keys are valid
    # --set targets even when the loaded config omits them (user configs
    # don't layer over defaults)
    schema = None
    if Path(_DEFAULT_CONFIG).exists() and str(args.config) != _DEFAULT_CONFIG:
        schema = load_config(_DEFAULT_CONFIG)
    config = merge_config_with_args(config, args, schema=schema)

    # multi-host (DCN) bootstrap must precede every other JAX call; the
    # reference's `distributed` stub was dead config (default.yaml:164-167)
    from multimodal_organ_segmentation_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(config)

    platform = args.device or str(config.get("hardware.platform", "") or "")
    if platform == "cpu":
        # must beat the axon sitecustomize hook, which pins jax_platforms=tpu
        import jax

        jax.config.update("jax_platforms", "cpu")

    configure_compilation_cache(config)

    log_dir = Path(config.get("experiment.log_dir", "logs")) / str(
        config.get("experiment.name", "exp")
    )
    logger = setup_logger(
        name="main",
        log_file=str(log_dir / f"{args.mode}.log"),
        level="DEBUG" if args.debug else "INFO",
    )
    set_seed(int(config.get("experiment.seed", 42)))

    logger.info(f"Mode: {args.mode}")
    logger.info(f"Config: {args.config}")

    runners = {
        "train": run_train,
        "eval": run_eval,
        "inference": run_inference,
        "preprocess": run_preprocess,
        "analysis": run_analysis,
        "explain": run_explain,
        "export": run_export,
        "serve": run_serve,
        "tune": run_tune,
    }
    try:
        runners[args.mode](config, logger)
    except KeyboardInterrupt:
        logger.warning("Interrupted by user")
        sys.exit(1)
    except Exception as e:
        logger.error(f"Error: {e}", exc_info=True)
        raise


if __name__ == "__main__":
    main()
