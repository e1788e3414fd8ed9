"""Serving autotuner (--mode tune): measured sweep + profile fragment."""

import numpy as np
import pytest
import yaml

from multimodal_organ_segmentation_tpu.utils.config import (
    default_config,
    save_config,
)


@pytest.fixture(scope="module")
def tune_cfg(tmp_path_factory):
    cfg = default_config()
    cfg.set("model.name", "unet3d")
    cfg.set("model.out_channels", 4)
    cfg.set("model.backbone.features", [4, 8])
    cfg.set("model.backbone.img_size", [16, 16, 16])
    cfg.set("model.head.dropout", 0.0)
    cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
    cfg.set("hardware.mixed_precision", "none")
    cfg.set("experiment.output_dir", str(tmp_path_factory.mktemp("out")))
    cfg.set("tune.volume_shape", [24, 24, 24])
    cfg.set("tune.sw_batches", [1, 2])
    cfg.set("tune.repeats", 1)
    return cfg


class TestTuneServing:
    def test_sweep_measures_all_candidates(self, tune_cfg):
        from multimodal_organ_segmentation_tpu.serving.tuner import tune_serving

        report = tune_serving(tune_cfg)
        # 2 sw_batches × 3 overlaps (config's 0.5 + fast profiles 0.25/0.125
        # proposed by default — configs/swin_unetr_xattn_flagship_fast.yaml)
        assert len(report["results"]) == 6
        assert {r["overlap"] for r in report["results"]} == {0.5, 0.25, 0.125}
        for r in report["results"]:
            assert r["vol_per_min"] > 0
        # default (no explicit tune.overlaps): best is the fastest candidate
        # INSIDE the 0.5%-parity tier (overlap >= 0.25); turbo 0.125 is
        # measured but not auto-selected (its ~1% Dice trade is opt-in)
        best = report["best"]
        tier = [r for r in report["results"] if r["overlap"] >= 0.25]
        assert best["overlap"] >= 0.25
        assert best["vol_per_min"] == max(r["vol_per_min"] for r in tier)

    def test_turbo_never_auto_selected(self, tune_cfg, monkeypatch):
        """Even when overlap 0.125 measures fastest, the default sweep
        picks the best candidate at overlap >= 0.25."""
        import time as _time

        import multimodal_organ_segmentation_tpu.serving.tuner as T
        from multimodal_organ_segmentation_tpu.ops import sliding_window as SW

        orig = SW.SlidingWindowRunner

        class Handicapped(orig):
            def __call__(self, volume, variables):
                if self.overlap >= 0.25:  # make the parity tier look slow
                    _time.sleep(0.15)
                return orig.__call__(self, volume, variables)

        monkeypatch.setattr(SW, "SlidingWindowRunner", Handicapped)
        cfg = tune_cfg.copy()
        cfg.set("tune.sw_batches", [1])
        report = T.tune_serving(cfg)
        by_ov = {r["overlap"]: r for r in report["results"]}
        assert by_ov[0.125]["vol_per_min"] > by_ov[0.25]["vol_per_min"]
        assert report["best"]["overlap"] >= 0.25

    def test_allow_turbo_opts_in(self, tune_cfg, monkeypatch):
        """tune.allow_turbo: true lets the fastest candidate win regardless
        of tier."""
        import time as _time

        import multimodal_organ_segmentation_tpu.serving.tuner as T
        from multimodal_organ_segmentation_tpu.ops import sliding_window as SW

        orig = SW.SlidingWindowRunner

        class Handicapped(orig):
            def __call__(self, volume, variables):
                if self.overlap >= 0.25:
                    _time.sleep(0.15)
                return orig.__call__(self, volume, variables)

        monkeypatch.setattr(SW, "SlidingWindowRunner", Handicapped)
        cfg = tune_cfg.copy()
        cfg.set("tune.sw_batches", [1])
        cfg.set("tune.allow_turbo", True)
        report = T.tune_serving(cfg)
        assert report["best"]["overlap"] == 0.125

    def test_explicit_turbo_overlap_selectable(self, tune_cfg):
        """Explicitly listing 0.125 under tune.overlaps opts into turbo."""
        from multimodal_organ_segmentation_tpu.serving.tuner import tune_serving

        cfg = tune_cfg.copy()
        cfg.set("tune.overlaps", [0.125])
        cfg.set("tune.sw_batches", [1])
        report = tune_serving(cfg)
        assert report["best"]["overlap"] == 0.125

    def test_write_profile_annotates_turbo(self, tmp_path):
        from multimodal_organ_segmentation_tpu.serving.tuner import write_profile

        report = {
            "results": [{"overlap": 0.125, "sw_batch": 9, "vol_per_min": 50.7}],
            "best": {"overlap": 0.125, "sw_batch": 9, "vol_per_min": 50.7},
        }
        path = tmp_path / "turbo.yaml"
        write_profile(report, path)
        text = path.read_text()
        assert "turbo" in text and "Dice" in text
        assert yaml.safe_load(text)["inference"]["sliding_window"]["overlap"] == 0.125

    def test_failed_candidate_recorded_not_fatal(self, tune_cfg, monkeypatch):
        """A candidate that fails to compile is recorded with its error and
        the sweep continues (HBM-OOM chunks on real hardware)."""
        import multimodal_organ_segmentation_tpu.serving.tuner as T
        from multimodal_organ_segmentation_tpu.ops import sliding_window as SW

        orig = SW.SlidingWindowRunner

        class Flaky(orig):
            def __call__(self, volume, variables):
                if self.sw_batch_size == 2:
                    raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
                return orig.__call__(self, volume, variables)

        monkeypatch.setattr(SW, "SlidingWindowRunner", Flaky)
        report = T.tune_serving(tune_cfg)
        by_sw = {r["sw_batch"]: r for r in report["results"]}
        assert "error" in by_sw[2] and "RESOURCE_EXHAUSTED" in by_sw[2]["error"]
        assert by_sw[1]["vol_per_min"] > 0
        assert report["best"]["sw_batch"] == 1

    def test_write_profile_fragment(self, tune_cfg, tmp_path):
        from multimodal_organ_segmentation_tpu.serving.tuner import (
            tune_serving,
            write_profile,
        )

        report = tune_serving(tune_cfg)
        path = tmp_path / "profile.yaml"
        write_profile(report, path)
        doc = yaml.safe_load(path.read_text())
        # the fragment is merge-clean config; the sweep record is a sibling
        assert set(doc) == {"inference"}
        assert doc["inference"]["batch_size"] == report["best"]["sw_batch"]
        assert (
            doc["inference"]["sliding_window"]["overlap"]
            == report["best"]["overlap"]
        )
        import json

        sidecar = json.loads(
            (tmp_path / "profile.yaml.report.json").read_text()
        )
        assert len(sidecar) == len(report["results"])

    def test_tta_and_ensemble_ride_the_timed_program(self, tune_cfg, tmp_path, monkeypatch):
        """The timed program is the deployed one: TTA multiplies the
        sliding-window passes per run and ensemble members each run."""
        from multimodal_organ_segmentation_tpu.ops import sliding_window as SW
        import multimodal_organ_segmentation_tpu.serving.tuner as T

        calls = []
        orig = SW.SlidingWindowRunner

        class Counting(orig):
            def __call__(self, volume, variables):
                calls.append(1)
                return orig.__call__(self, volume, variables)

        monkeypatch.setattr(SW, "SlidingWindowRunner", Counting)
        cfg = tune_cfg.copy()
        cfg.set("tune.sw_batches", [1])
        cfg.set("tune.repeats", 1)

        report = T.tune_serving(cfg)
        base_calls = len(calls)
        assert report["best"]["vol_per_min"] > 0

        calls.clear()
        cfg.set("inference.tta", True)
        T.tune_serving(cfg)
        # flip TTA = 1 original + 3 flipped passes per run
        assert len(calls) == 4 * base_calls

    def test_write_profile_all_failed_raises(self, tmp_path):
        from multimodal_organ_segmentation_tpu.serving.tuner import write_profile

        with pytest.raises(RuntimeError, match="every tuning candidate"):
            write_profile(
                {"results": [{"error": "boom"}], "best": None}, tmp_path / "p.yaml"
            )


def test_cli_tune_mode(tmp_path, monkeypatch):
    """--mode tune end to end: sweep on CPU, profile written where --output
    says, applying the profile keys via --set round-trips."""
    import yaml as _yaml

    from multimodal_organ_segmentation_tpu import cli

    cfg = default_config()
    cfg.set("model.name", "unet3d")
    cfg.set("model.out_channels", 4)
    cfg.set("model.backbone.features", [4, 8])
    cfg.set("model.backbone.img_size", [16, 16, 16])
    cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
    cfg.set("hardware.mixed_precision", "none")
    cfg.set("experiment.output_dir", str(tmp_path / "out"))
    cfg.set("experiment.log_dir", str(tmp_path / "logs"))
    cfg.set("tune.volume_shape", [20, 20, 20])
    cfg.set("tune.sw_batches", [1])
    cfg.set("tune.repeats", 1)
    cfg_path = tmp_path / "cfg.yaml"
    save_config(cfg, cfg_path)

    profile = tmp_path / "tuned.yaml"
    cli.main([
        "--mode", "tune", "--config", str(cfg_path), "--device", "cpu",
        "--output", str(profile),
    ])
    doc = _yaml.safe_load(profile.read_text())
    assert doc["inference"]["batch_size"] == 1
    import json

    sidecar = json.loads((tmp_path / "tuned.yaml.report.json").read_text())
    assert sidecar[0]["vol_per_min"] > 0
