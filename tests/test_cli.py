"""CLI surface tests: arg parsing, mode dispatch errors, config overrides."""

import pytest

from multimodal_organ_segmentation_tpu.cli import parse_args
from multimodal_organ_segmentation_tpu.utils.config import (
    default_config,
    merge_config_with_args,
)


class TestParseArgs:
    def test_minimal(self):
        args = parse_args(["--mode", "train"])
        assert args.mode == "train"
        assert args.config.endswith("default.yaml")

    def test_all_modes(self):
        for mode in ["train", "eval", "inference", "preprocess", "analysis", "explain"]:
            assert parse_args(["--mode", mode]).mode == mode

    def test_invalid_mode(self):
        with pytest.raises(SystemExit):
            parse_args(["--mode", "nope"])

    def test_overrides(self):
        args = parse_args(
            [
                "--mode", "train", "--epochs", "5", "--batch-size", "3",
                "--lr", "0.01", "--model", "dual_encoder",
                "--fusion", "cross_attention", "--modalities", "CT", "PET", "MRI",
                "--exp-name", "e1", "--seed", "7",
            ]
        )
        cfg = merge_config_with_args(default_config(), args)
        assert cfg.training.epochs == 5
        assert cfg.training.batch_size == 3
        assert cfg.training.optimizer.lr == pytest.approx(0.01)
        assert cfg.model.name == "dual_encoder"
        assert cfg.model.fusion.type == "cross_attention"
        assert cfg.data.modalities == ["CT", "PET", "MRI"]
        assert cfg.experiment.name == "e1"
        assert cfg.experiment.seed == 7

    def test_invalid_model_choice(self):
        with pytest.raises(SystemExit):
            parse_args(["--mode", "train", "--model", "resnet"])

    def test_flags(self):
        args = parse_args(
            ["--mode", "analysis", "--suv-analysis", "--tmtv-analysis",
             "--histogram", "--generate-report", "--input", "/x"]
        )
        cfg = merge_config_with_args(default_config(), args)
        assert cfg["_args"]["generate_report"] is True
        assert cfg["_args"]["input"] == "/x"


class TestModeErrors:
    def test_eval_requires_checkpoint(self):
        from multimodal_organ_segmentation_tpu.cli import run_eval
        import logging

        cfg = default_config()
        cfg["_args"] = {"checkpoint": None}
        with pytest.raises(ValueError, match="--checkpoint"):
            run_eval(cfg, logging.getLogger("t"))

    def test_inference_requires_input(self):
        from multimodal_organ_segmentation_tpu.cli import run_inference
        import logging

        cfg = default_config()
        cfg["_args"] = {"checkpoint": "x", "input": None, "output": None}
        with pytest.raises(ValueError, match="--input"):
            run_inference(cfg, logging.getLogger("t"))

    def test_preprocess_requires_input(self):
        from multimodal_organ_segmentation_tpu.cli import run_preprocess
        import logging

        cfg = default_config()
        cfg["_args"] = {"input": None, "output": None}
        with pytest.raises(ValueError, match="--input"):
            run_preprocess(cfg, logging.getLogger("t"))
