"""Every shipped config must build its model and run a tiny forward."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.models import build_model
from multimodal_organ_segmentation_tpu.utils.config import load_config

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"
CONFIGS = sorted(CONFIG_DIR.glob("*.yaml"))


@pytest.mark.parametrize("config_path", CONFIGS, ids=lambda p: p.stem)
def test_config_builds_and_forwards(config_path):
    cfg = load_config(config_path)
    # shrink to test size: tiny spatial dims, tiny features
    cfg.set("hardware.mixed_precision", "none")
    name = cfg.get("model.name")
    if name == "swin_unetr":
        cfg.set("model.backbone.feature_size", 4)
        cfg.set("model.backbone.depths", [1, 1, 1, 1])
        cfg.set("model.backbone.num_heads", [1, 1, 1, 1])
        cfg.set("model.backbone.window_size", [2, 2, 2])
        spatial = (32, 32, 32)
    else:
        cfg.set("model.backbone.features", [4, 8])
        spatial = (8, 8, 8)

    n_mod = len(cfg.get("data.modalities"))
    model = build_model(cfg)
    x = jnp.zeros((1, *spatial, n_mod))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, *spatial, cfg.get("model.out_channels"))

    # config completeness: required sections exist
    for section in ["experiment", "data", "model", "training", "inference"]:
        assert cfg.get(section) is not None, f"{config_path.name} missing {section}"
