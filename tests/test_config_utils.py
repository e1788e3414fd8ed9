"""Tests for config system, logger, PRNG, IO."""

import argparse

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.utils.config import (
    ConfigNode,
    default_config,
    load_config,
    merge_config_with_args,
    save_config,
)
from multimodal_organ_segmentation_tpu.utils.prng import KeyStream, set_seed


def test_confignode_access():
    cfg = ConfigNode({"a": {"b": {"c": 1}}, "x": [1, 2]})
    assert cfg.a.b.c == 1
    assert cfg["a"]["b"]["c"] == 1
    assert cfg.get("a.b.c") == 1
    assert cfg.get("a.b.missing", 7) == 7
    assert cfg.get("nope.nope", "d") == "d"
    cfg.set("a.b.d", 5)
    assert cfg.get("a.b.d") == 5
    assert list(cfg.x) == [1, 2]


def test_default_config_schema():
    cfg = default_config()
    assert cfg.model.name == "swin_unetr"
    assert cfg.model.out_channels == 8
    assert cfg.data.modalities == ["CT", "PET"]
    assert cfg.training.loss.name == "dice_ce"
    assert cfg.inference.sliding_window.roi_size == [96, 96, 96]
    assert cfg.get("training.optimizer.lr") == pytest.approx(1e-4)


def test_config_roundtrip(tmp_path):
    cfg = default_config()
    cfg["_args"] = {"mode": "train"}
    save_config(cfg, tmp_path / "c.yaml")
    loaded = load_config(tmp_path / "c.yaml")
    assert "_args" not in loaded  # runtime keys stripped on save
    assert loaded.model.out_channels == 8


def test_merge_args():
    cfg = default_config()
    args = argparse.Namespace(
        mode="train",
        exp_name="exp1",
        output_dir=None,
        seed=7,
        device=None,
        num_workers=None,
        epochs=5,
        batch_size=1,
        lr=3e-4,
        model="unet3d",
        fusion="cross_attention",
        modalities=["CT"],
        suv_analysis=True,
        tmtv_analysis=False,
        histogram=False,
        gradcam=True,
        attention_maps=False,
        tsne=False,
        input="/in",
        output="/out",
        checkpoint=None,
        resume=None,
        verbose=False,
        debug=False,
        generate_report=False,
    )
    cfg = merge_config_with_args(cfg, args)
    assert cfg.experiment.name == "exp1"
    assert cfg.experiment.seed == 7
    assert cfg.training.epochs == 5
    assert cfg.training.optimizer.lr == pytest.approx(3e-4)
    assert cfg.model.name == "unet3d"
    assert cfg.model.fusion.type == "cross_attention"
    assert cfg.data.modalities == ["CT"]
    assert cfg.analysis.suv.enabled is True
    assert cfg.explainability.gradcam.enabled is True
    assert cfg["_args"]["input"] == "/in"


def test_keystream_deterministic():
    ks1, ks2 = KeyStream(42), KeyStream(42)
    a, b = ks1.next(), ks2.next()
    import jax

    assert jax.random.uniform(a) == jax.random.uniform(b)
    c = ks1.next()
    assert jax.random.uniform(a) != jax.random.uniform(c)


def test_set_seed_numpy():
    set_seed(123)
    x = np.random.rand(3)
    set_seed(123)
    y = np.random.rand(3)
    np.testing.assert_array_equal(x, y)


def test_nifti_roundtrip(tmp_path):
    from multimodal_organ_segmentation_tpu.utils.io import load_nifti, save_nifti

    vol = np.random.rand(8, 9, 10).astype(np.float32)
    affine = np.diag([1.5, 1.5, 2.0, 1.0])
    save_nifti(vol, tmp_path / "v.nii.gz", affine=affine)
    out, aff = load_nifti(tmp_path / "v.nii.gz", return_affine=True)
    np.testing.assert_allclose(out, vol, rtol=1e-6)
    np.testing.assert_allclose(aff, affine)


def test_merge_set_overrides():
    """--set KEY=VALUE reaches any dotted config path with YAML-typed values."""
    cfg = default_config()
    args = argparse.Namespace(
        overrides=[
            "experiment.tensorboard=true",
            "training.ema_decay=0.999",
            "+model.backbone.features=[16, 32, 64]",  # optional key, not in default.yaml
            "experiment.name=from_set",
        ],
    )
    cfg = merge_config_with_args(cfg, args)
    assert cfg.get("experiment.tensorboard") is True
    assert cfg.get("training.ema_decay") == pytest.approx(0.999)
    assert cfg.get("model.backbone.features") == [16, 32, 64]
    assert cfg.experiment.name == "from_set"


def test_merge_set_rejects_malformed():
    cfg = default_config()
    args = argparse.Namespace(overrides=["no_equals_sign"])
    with pytest.raises(ValueError, match="--set"):
        merge_config_with_args(cfg, args)


def test_merge_set_rejects_unknown_key():
    """A typo'd key must error, not silently create a dead subtree that
    leaves the run on default hyperparameters."""
    cfg = default_config()
    args = argparse.Namespace(overrides=["trainnig.epochs=5"])
    with pytest.raises(ValueError, match="unknown config key"):
        merge_config_with_args(cfg, args)
    # the + prefix deliberately creates new keys
    cfg = default_config()
    args = argparse.Namespace(overrides=["+custom.section.flag=7"])
    cfg = merge_config_with_args(cfg, args)
    assert cfg.get("custom.section.flag") == 7


def test_merge_set_schema_fallback():
    """Documented keys absent from a user config (configs don't layer over
    default.yaml) are accepted when default.yaml is passed as the schema —
    a user setting a real feature flag must not need the + escape."""
    from multimodal_organ_segmentation_tpu.utils.config import ConfigNode

    user_cfg = ConfigNode({"experiment": {"name": "mini"}})
    schema = default_config()  # has experiment.tensorboard
    args = argparse.Namespace(overrides=["experiment.tensorboard=true"])
    merged = merge_config_with_args(user_cfg, args, schema=schema)
    assert merged.get("experiment.tensorboard") is True
    # a typo still fails even with the schema present
    user_cfg = ConfigNode({"experiment": {"name": "mini"}})
    args = argparse.Namespace(overrides=["experiment.tensorbored=true"])
    with pytest.raises(ValueError, match="unknown config key"):
        merge_config_with_args(user_cfg, args, schema=schema)
    # string-typed schema keys keep string coercion for YAML-1.1 traps
    user_cfg = ConfigNode({})
    args = argparse.Namespace(overrides=["experiment.name=no"])
    merged = merge_config_with_args(user_cfg, args, schema=schema)
    assert merged.get("experiment.name") == "no"


def test_merge_set_friendly_errors():
    # path through a scalar node
    cfg = default_config()
    args = argparse.Namespace(overrides=["+training.epochs.x=1"])
    with pytest.raises(ValueError, match="not a config section"):
        merge_config_with_args(cfg, args)
    # malformed YAML value
    cfg = default_config()
    args = argparse.Namespace(overrides=["+model.backbone.features=[16,32"])
    with pytest.raises(ValueError, match="not valid YAML"):
        merge_config_with_args(cfg, args)


def test_merge_set_string_keys_stay_strings():
    """YAML 1.1 coerces no/on/off and dates; string-typed config keys must
    receive the literal string (e.g. an experiment named 'no' or a date)."""
    cfg = default_config()
    args = argparse.Namespace(
        overrides=["experiment.name=no", "experiment.output_dir=2024-01-01"]
    )
    cfg = merge_config_with_args(cfg, args)
    assert cfg.experiment.name == "no"
    assert cfg.experiment.output_dir == "2024-01-01"
    # bool-typed keys still get real booleans
    cfg = default_config()
    args = argparse.Namespace(overrides=["experiment.tensorboard=on"])
    cfg = merge_config_with_args(cfg, args)
    assert cfg.get("experiment.tensorboard") is True
