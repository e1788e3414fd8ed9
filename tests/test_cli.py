"""CLI surface tests: arg parsing, mode dispatch errors, config overrides."""

import os

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
        for mode in ["train", "eval", "inference", "preprocess", "analysis",
                     "explain", "export", "serve"]:
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

    def test_port_reaches_args_stash(self):
        # serve mode reads the port from config["_args"] (serving/server.py)
        args = parse_args(["--mode", "serve", "--port", "9000"])
        cfg = merge_config_with_args(default_config(), args)
        assert cfg["_args"]["port"] == 9000

    def test_invalid_model_choice(self):
        with pytest.raises(SystemExit):
            parse_args(["--mode", "train", "--model", "resnet"])

    @pytest.mark.parametrize(
        "fusion",
        ["early", "late", "attention", "cross_attention",
         "bidirectional", "suv_guided"],
    )
    def test_every_fusion_choice_builds(self, fusion):
        """SURVEY §1 mandate: all fusion strategies selectable end-to-end
        (CLI choice → config → built model → forward)."""
        import jax
        import jax.numpy as jnp

        from multimodal_organ_segmentation_tpu.models import build_model

        args = parse_args(
            ["--mode", "train", "--model", "dual_encoder", "--fusion", fusion]
        )
        cfg = merge_config_with_args(default_config(), args)
        assert cfg.model.fusion.type == fusion
        cfg.set("hardware.mixed_precision", "none")
        cfg.set("model.backbone.features", [4, 8])
        cfg.set("model.out_channels", 3)
        model = build_model(cfg)
        x = jnp.zeros((1, 8, 8, 8, 2))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 8, 8, 8, 3)

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


class TestBenchProbe:
    """bench.py's backend probe must distinguish a relay HANG from a code
    crash — a regression must never be recorded as 'relay down'."""

    def _probe(self, monkeypatch, behavior):
        import subprocess

        import bench

        if behavior == "hang":
            def fake_run(*a, **k):
                raise subprocess.TimeoutExpired(cmd="probe", timeout=1)
        elif behavior == "crash":
            def fake_run(*a, **k):
                class R:
                    returncode = 1
                    stdout = b""
                    stderr = b"ModuleNotFoundError: jax is broken"
                return R()
        else:
            def fake_run(*a, **k):
                class R:
                    returncode = 0
                    stdout = b"OK 64.0\n"
                    stderr = b""
                return R()
        monkeypatch.setattr(subprocess, "run", fake_run)
        return bench._backend_probe(timeout_s=1)

    def test_hang_is_relay_outage(self, monkeypatch):
        kind, detail = self._probe(monkeypatch, "hang")
        assert kind == "tpu_backend_unreachable"

    def test_crash_is_not_relay_outage(self, monkeypatch):
        kind, detail = self._probe(monkeypatch, "crash")
        assert kind == "backend_probe_failed"
        assert "jax is broken" in detail

    def test_healthy(self, monkeypatch):
        assert self._probe(monkeypatch, "ok") == (None, None)


class TestCompilationCache:
    """hardware.compilation_cache_dir → persistent XLA executable cache.

    Run in a subprocess: jax_compilation_cache_dir is process-global and
    must not leak into the rest of the suite.
    """

    def test_cache_populated_and_reused(self, tmp_path):
        import subprocess
        import sys

        prog = r"""
import sys, os
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode
from multimodal_organ_segmentation_tpu.cli import configure_compilation_cache
import jax
jax.config.update("jax_platforms", "cpu")
cfg = ConfigNode({"hardware": {"compilation_cache_dir": sys.argv[1]}})
configure_compilation_cache(cfg)
import jax.numpy as jnp
out = jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((32, 32)))
print("RESULT", float(out))
"""
        cache = tmp_path / "xla_cache"
        env = dict(os.environ)
        r1 = subprocess.run(
            [sys.executable, "-c", prog, str(cache)],
            capture_output=True, env=env, timeout=120,
        )
        assert r1.returncode == 0, r1.stderr.decode()
        assert b"RESULT 32768.0" in r1.stdout
        entries = list(cache.glob("*cache*"))
        assert entries, "compilation cache dir is empty"
        # second process must still compute correctly from the warm cache
        mtimes = {e: e.stat().st_mtime_ns for e in entries}
        r2 = subprocess.run(
            [sys.executable, "-c", prog, str(cache)],
            capture_output=True, env=env, timeout=120,
        )
        assert r2.returncode == 0, r2.stderr.decode()
        assert b"RESULT 32768.0" in r2.stdout
        for e, t in mtimes.items():
            assert e.stat().st_mtime_ns == t, "cache entry was rewritten"

    def test_disabled_by_default(self):
        from multimodal_organ_segmentation_tpu.cli import (
            configure_compilation_cache,
        )
        from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

        # no key / null key → no-op (must not import-time-touch jax.config)
        configure_compilation_cache(ConfigNode({}))
        configure_compilation_cache(
            ConfigNode({"hardware": {"compilation_cache_dir": None}})
        )
