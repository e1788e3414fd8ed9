"""Weight-level parity: import a live reference torch UNet3D into our
flax UNet3D and require numerically matching forward outputs."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from src.models.backbones.unet import UNet3D as RefUNet3D  # noqa: E402

from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D  # noqa: E402
from multimodal_organ_segmentation_tpu.models.torch_import import (  # noqa: E402
    from_torch_unet3d,
    load_torch_checkpoint,
)


def _parity_check(features, shape, in_ch=2, out_ch=4, seed=0, atol=2e-4):
    torch.manual_seed(seed)
    ref = RefUNet3D(in_channels=in_ch, out_channels=out_ch, features=list(features))
    ref.eval()

    params = from_torch_unet3d(ref.state_dict(), num_levels=len(features))
    ours = UNet3D(out_channels=out_ch, features=tuple(features))

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(1, in_ch, *shape)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()  # [B, C, H, W, D]

    x_cl = np.moveaxis(x, 1, -1)  # [B, H, W, D, C]
    our_out = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x_cl), train=False)
    )
    our_out = np.moveaxis(our_out, -1, 1)

    np.testing.assert_allclose(our_out, ref_out, atol=atol, rtol=1e-3)


class TestTorchImport:
    def test_forward_parity_small(self):
        _parity_check((4, 8), (8, 8, 8))

    def test_forward_parity_3level(self):
        _parity_check((4, 8, 16), (16, 16, 16), in_ch=1, out_ch=3, seed=1)

    def test_checkpoint_file_roundtrip(self, tmp_path):
        torch.manual_seed(2)
        ref = RefUNet3D(in_channels=1, out_channels=2, features=[4, 8])
        torch.save({"model_state_dict": ref.state_dict()}, tmp_path / "ckpt.pth")
        params = load_torch_checkpoint(tmp_path / "ckpt.pth", num_levels=2)
        assert "init_conv" in params and "out_conv" in params
        # shapes line up with a fresh init
        ours = UNet3D(out_channels=2, features=(4, 8))
        init = ours.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)), train=False)
        ref_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
        init_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, init["params"])
        assert ref_shapes == init_shapes


from src.models.backbones.dual_encoder import DualEncoder as RefDualEncoder  # noqa: E402

from multimodal_organ_segmentation_tpu.models.dual_encoder import DualEncoder  # noqa: E402
from multimodal_organ_segmentation_tpu.models.torch_import import (  # noqa: E402
    from_torch_dual_encoder,
)


def _dual_parity(fusion, features=(4, 8), shape=(8, 8, 8), out_ch=3, seed=3,
                 atol=2e-4):
    torch.manual_seed(seed)
    ref = RefDualEncoder(
        in_channels_per_modality=1, num_modalities=2, out_channels=out_ch,
        features=list(features), fusion_type=fusion, dropout=0.0,
    )
    ref.eval()

    params = from_torch_dual_encoder(
        ref.state_dict(), num_levels=len(features), num_modalities=2,
        fusion_type=fusion,
    )
    ours = DualEncoder(
        num_modalities=2, out_channels=out_ch, features=tuple(features),
        fusion_type=fusion, dropout=0.0,
    )

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(1, 2, *shape)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()  # [B, C, H, W, D]

    x_cl = np.moveaxis(x, 1, -1)
    our_out = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x_cl), train=False)
    )
    our_out = np.moveaxis(our_out, -1, 1)
    np.testing.assert_allclose(our_out, ref_out, atol=atol, rtol=1e-3)


class TestDualEncoderImport:
    """Weight-level parity for the reference DualEncoder across its three
    parameterized fusion strategies (dual_encoder.py:167-199)."""

    def test_concat_fusion_parity(self):
        _dual_parity("concat")

    def test_add_fusion_parity(self):
        _dual_parity("add", seed=4)

    def test_attention_fusion_parity(self):
        _dual_parity("attention", features=(8, 16), seed=5)


class TestPretrainedConfigPath:
    """``model.pretrained`` / --pretrained: the reference load_pretrained
    analog — a reference .pth becomes the Trainer's initial params."""

    def test_trainer_initializes_from_reference_pth(self, tmp_path):
        import yaml
        from multimodal_organ_segmentation_tpu.data.synthetic import (
            generate_synthetic_dataset,
        )
        from multimodal_organ_segmentation_tpu.train.trainer import Trainer
        from multimodal_organ_segmentation_tpu.utils.config import load_config

        torch.manual_seed(7)
        ref = RefUNet3D(in_channels=2, out_channels=4, features=[4, 8])
        torch.save({"model_state_dict": ref.state_dict()}, tmp_path / "ref.pth")

        generate_synthetic_dataset(
            tmp_path / "data", n_train=2, n_val=1, n_test=1,
            shape=(16, 16, 16), num_classes=4, seed=0,
        )
        cfg = load_config("configs/tiny_cpu.yaml")
        raw = cfg.to_dict()
        raw["data"]["data_root"] = str(tmp_path / "data")
        raw["experiment"]["output_dir"] = str(tmp_path / "out")
        raw["experiment"]["log_dir"] = str(tmp_path / "logs")
        raw["model"]["backbone"]["features"] = [4, 8]
        raw["model"]["out_channels"] = 4
        raw["model"]["pretrained"] = str(tmp_path / "ref.pth")
        with open(tmp_path / "cfg.yaml", "w") as f:
            yaml.safe_dump(raw, f)
        config = load_config(tmp_path / "cfg.yaml")
        config["_args"] = {}

        trainer = Trainer(config)
        state = trainer.init_state(np.zeros((16, 16, 16, 2), np.float32))

        expected = from_torch_unet3d(ref.state_dict(), num_levels=2)
        got = state.params["backbone"]
        np.testing.assert_allclose(
            np.asarray(got["out_conv"]["kernel"]),
            expected["out_conv"]["kernel"], atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got["init_conv"]["Conv_0"]["kernel"]),
            expected["init_conv"]["Conv_0"]["kernel"], atol=1e-6,
        )

    def test_shape_mismatch_is_rejected(self, tmp_path):
        from multimodal_organ_segmentation_tpu.train.trainer import Trainer
        from multimodal_organ_segmentation_tpu.utils.config import load_config

        torch.manual_seed(8)
        ref = RefUNet3D(in_channels=2, out_channels=4, features=[8, 16])  # wrong
        torch.save({"model_state_dict": ref.state_dict()}, tmp_path / "ref.pth")

        config = load_config("configs/tiny_cpu.yaml")
        config.set("model.backbone.features", [4, 8])
        config.set("model.out_channels", 4)
        config.set("model.pretrained", str(tmp_path / "ref.pth"))
        config["_args"] = {}
        trainer = Trainer(config)
        with pytest.raises(ValueError, match="does not match"):
            trainer.init_state(np.zeros((16, 16, 16, 2), np.float32))

    def test_unmappable_fusion_rejected_up_front(self, tmp_path):
        from multimodal_organ_segmentation_tpu.models.torch_import import (
            import_torch_checkpoint,
        )
        from multimodal_organ_segmentation_tpu.utils.config import load_config

        torch.manual_seed(9)
        ref = RefDualEncoder(
            in_channels_per_modality=1, num_modalities=2, out_channels=2,
            features=[4, 8], fusion_type="concat",
        )
        torch.save({"model_state_dict": ref.state_dict()}, tmp_path / "ref.pth")
        config = load_config("configs/tiny_cpu.yaml")
        config.set("model.name", "dual_encoder")
        config.set("model.fusion.type", "cross_attention")
        with pytest.raises(ValueError, match="no reference checkpoint"):
            import_torch_checkpoint(tmp_path / "ref.pth", config)

    def test_swin_default_requires_monai_compat_clearly(self, tmp_path):
        """A config without model.name dispatches to the build default
        (swin_unetr) and produces a descriptive error, not a KeyError."""
        from multimodal_organ_segmentation_tpu.models.torch_import import (
            import_torch_checkpoint,
        )
        from multimodal_organ_segmentation_tpu.utils.config import load_config

        torch.save({"model_state_dict": {}}, tmp_path / "ref.pth")
        config = load_config("configs/swin_unetr_ct_96.yaml")
        with pytest.raises(ValueError, match="monai_compat"):
            import_torch_checkpoint(tmp_path / "ref.pth", config)
