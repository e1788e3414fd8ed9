"""StableHLO deployment export: jax.export artifact == live model.

The artifact bakes the weights in and carries a symbolic tile-batch dim —
loading it needs no flax module, no checkpoint, no model code. The
reference has no deployment-export surface at all (its only interchange
is torch.save state dicts, /root/reference/src/models/build.py:153-180).
"""

import json
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.models.stablehlo_export import (
    export_stablehlo,
    load_stablehlo,
)


@pytest.fixture(scope="module")
def tiny_model():
    from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D

    model = UNet3D(out_channels=3, features=(4, 8))
    x0 = jnp.zeros((1, 16, 16, 16, 2))
    variables = model.init(jax.random.key(0), x0, train=False)
    return model, dict(variables)


class TestRoundtrip:
    def test_artifact_matches_live_model(self, tiny_model, tmp_path):
        model, variables = tiny_model
        path = export_stablehlo(
            model,
            variables,
            tmp_path / "m.stablehlo.zip",
            roi=(16, 16, 16),
            in_channels=2,
            metadata={"model": "unet3d", "num_classes": 3},
        )
        call, meta = load_stablehlo(path)
        assert meta["model"] == "unet3d"
        assert meta["num_classes"] == 3
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 2))
        live = model.apply(variables, x, train=False)
        exported = call(x)
        np.testing.assert_allclose(
            np.asarray(exported), np.asarray(live), rtol=1e-5, atol=1e-5
        )

    def test_symbolic_batch(self, tiny_model, tmp_path):
        """One artifact serves any sw_batch: b=1 and b=3 from the same file."""
        model, variables = tiny_model
        path = export_stablehlo(
            model,
            variables,
            tmp_path / "m.zip",
            roi=(16, 16, 16),
            in_channels=2,
        )
        call, _ = load_stablehlo(path)
        for b in (1, 3):
            x = jax.random.normal(jax.random.key(b), (b, 16, 16, 16, 2))
            live = model.apply(variables, x, train=False)
            np.testing.assert_allclose(
                np.asarray(call(x)), np.asarray(live), rtol=1e-5, atol=1e-5
            )

    def test_metadata_records_signature(self, tiny_model, tmp_path):
        model, variables = tiny_model
        path = export_stablehlo(
            model, variables, tmp_path / "m.zip", roi=(16, 16, 16), in_channels=2
        )
        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read("metadata.json"))
        assert meta["input"]["shape"] == ["b", 16, 16, 16, 2]
        assert meta["input"]["dtype"] == "float32"
        assert "cpu" in meta["platforms"] and "tpu" in meta["platforms"]


class TestErrors:
    def test_not_a_zip(self, tmp_path):
        p = tmp_path / "junk.zip"
        p.write_bytes(b"definitely not a zip")
        with pytest.raises(ValueError, match="not a stablehlo export"):
            load_stablehlo(p)

    def test_zip_missing_members(self, tmp_path):
        p = tmp_path / "empty.zip"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("readme.txt", "hi")
        with pytest.raises(ValueError, match="not a stablehlo export"):
            load_stablehlo(p)

    def test_future_version_rejected(self, tiny_model, tmp_path):
        model, variables = tiny_model
        path = export_stablehlo(
            model, variables, tmp_path / "m.zip", roi=(16, 16, 16), in_channels=2
        )
        with zipfile.ZipFile(path) as zf:
            blob = zf.read("model.stablehlo")
            meta = json.loads(zf.read("metadata.json"))
        meta["format_version"] = 99
        p2 = tmp_path / "future.zip"
        with zipfile.ZipFile(p2, "w") as zf:
            zf.writestr("model.stablehlo", blob)
            zf.writestr("metadata.json", json.dumps(meta))
        with pytest.raises(ValueError, match="newer exporter"):
            load_stablehlo(p2)


class TestCLI:
    def test_export_mode_stablehlo(self, tmp_path, monkeypatch):
        """--mode export --format stablehlo from a real Orbax checkpoint."""
        import yaml

        from multimodal_organ_segmentation_tpu import cli
        from multimodal_organ_segmentation_tpu.data.synthetic import (
            generate_synthetic_dataset,
        )
        from multimodal_organ_segmentation_tpu.utils.config import load_config

        generate_synthetic_dataset(
            tmp_path / "data", n_train=2, n_val=1, n_test=1,
            shape=(16, 16, 16), num_classes=3, seed=0,
        )
        import pathlib

        cfg = load_config(
            pathlib.Path(__file__).resolve().parents[1]
            / "configs" / "tiny_cpu.yaml"
        )
        raw = cfg.to_dict()
        raw["data"]["data_root"] = str(tmp_path / "data")
        raw["experiment"]["output_dir"] = str(tmp_path / "out")
        raw["experiment"]["log_dir"] = str(tmp_path / "logs")
        raw["model"]["backbone"]["img_size"] = [16, 16, 16]
        raw["model"]["out_channels"] = 3
        raw["training"]["epochs"] = 1
        cfg_path = tmp_path / "cfg.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(raw, f)
        monkeypatch.chdir(tmp_path)
        cli.main(["--mode", "train", "--config", str(cfg_path), "--device", "cpu"])
        ckpts = list((tmp_path / "out").glob("**/last"))
        assert ckpts, "train produced no last checkpoint"
        artifact = tmp_path / "model.stablehlo.zip"
        cli.main([
            "--mode", "export", "--config", str(cfg_path), "--device", "cpu",
            "--checkpoint", str(ckpts[0]), "--output", str(artifact),
            "--format", "stablehlo",
        ])
        call, meta = load_stablehlo(artifact)
        assert meta["num_classes"] == 3
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 16, 2))
        out = np.asarray(call(x))
        assert out.shape == (2, 16, 16, 16, 3)
        assert np.isfinite(out).all()
