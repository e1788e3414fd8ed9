"""Full-matrix production-config composition (VERDICT r3 item 5).

Every production training feature enabled SIMULTANEOUSLY — ZeRO-1 +
EMA + deep supervision + grad clipping + skip-nonfinite + patch-based
sampling (with random augmentation) + async checkpoints + poly LR —
on the 8-device CPU mesh, then killed mid-epoch and resumed.  The
invariants that each feature guarantees in isolation must survive the
composition:

- bit-exact step-granular resume (losses + final params + EMA params),
  which now also covers RANDOM transforms because augmentation /
  patch-sampling keys are the stateless (seed, epoch, idx) triple
  (``TransformPipeline.key_for``);
- structure-stable optimizer state (orbax restore across the kill
  boundary would hard-fail on any optax tree-structure drift);
- ZeRO-1 actually active (optimizer moments sharded over ``data``).

Reference analog: src/trainer/trainer.py:222-263 composes AMP + accum +
scheduler in one loop but has no preemption-resume story at all.
"""

from pathlib import Path

import numpy as np
import pytest

import jax

from multimodal_organ_segmentation_tpu.data.dataloader import DataLoader
from multimodal_organ_segmentation_tpu.data.dataset import get_dataset
from multimodal_organ_segmentation_tpu.data.synthetic import generate_synthetic_dataset
from multimodal_organ_segmentation_tpu.data.transforms import get_transforms
from multimodal_organ_segmentation_tpu.train.trainer import Trainer
from multimodal_organ_segmentation_tpu.utils.config import default_config

N_CLASSES = 3
N_TRAIN = 8
BATCH = 2  # 4 optimizer steps per epoch


class _Bomb:
    """Dataset proxy that simulates preemption after N sample fetches."""

    def __init__(self, ds, after=None):
        self.ds = ds
        self.after = after
        self.fetches = 0

    def __len__(self):
        return len(self.ds)

    def get_sample(self, idx, epoch=None):
        self.fetches += 1
        if self.after is not None and self.fetches > self.after:
            raise RuntimeError("simulated preemption")
        return self.ds.get_sample(idx, epoch=epoch)

    def __getitem__(self, idx):
        return self.get_sample(idx)


def _prod_cfg(tmp_path, data_root, name):
    """Tiny config with the FULL production feature matrix switched on."""
    cfg = default_config()
    cfg.set("experiment.name", name)
    cfg.set("experiment.output_dir", str(tmp_path / "outputs"))
    cfg.set("experiment.seed", 11)
    cfg.set("data.data_root", str(data_root))
    cfg.set("data.modalities", ["CT", "PET"])
    # random augmentation ON (keys are the stateless (seed, epoch, idx))
    cfg.set("data.augmentation.enabled", True)
    cfg.set("data.augmentation.random_flip", True)
    cfg.set("data.augmentation.random_rotate", 15)
    cfg.set("data.augmentation.random_intensity", 0.1)
    cfg.set("data.augmentation.random_scale", None)
    # patch-based native-resolution sampling, class-balanced
    cfg.set("data.patch_based.enabled", True)
    cfg.set("data.patch_based.size", [16, 16, 16])
    cfg.set("data.patch_based.pos_ratio", 0.5)
    cfg.set("data.patch_based.class_balanced", True)
    # tiny UNet3D with deep-supervision aux heads
    cfg.set("model.name", "unet3d")
    cfg.set("model.backbone.features", [4, 8])
    cfg.set("model.in_channels", 2)
    cfg.set("model.out_channels", N_CLASSES)
    cfg.set("model.head.type", "deep_supervision")
    # training feature matrix
    cfg.set("training.epochs", 2)
    cfg.set("training.batch_size", BATCH)
    cfg.set("training.accumulation_steps", 1)
    cfg.set("training.skip_nonfinite_updates", True)
    cfg.set("training.ema_decay", 0.9)
    cfg.set("training.ema_eval", True)
    cfg.set("training.grad_clip_norm", 1.0)
    cfg.set("training.optimizer.name", "adamw")
    cfg.set("training.optimizer.lr", 1e-3)
    cfg.set("training.scheduler.name", "poly")
    cfg.set("training.scheduler.power", 0.9)
    cfg.set("training.checkpoint.save_every_steps", 2)
    cfg.set("training.checkpoint.save_every", 0)
    cfg.set("training.checkpoint.async", True)
    # ZeRO-1 over the 8-device CPU mesh
    cfg.set("parallel.zero1", True)
    return cfg


def _loader(cfg, data_root, bomb_after=None):
    ds = get_dataset(cfg, split="train", transform=get_transforms(cfg, "train"))
    if bomb_after is not None:
        ds = _Bomb(ds, after=bomb_after)
    return DataLoader(
        ds,
        batch_size=BATCH,
        shuffle=True,
        drop_last=True,
        num_workers=0,
        seed=int(cfg.get("experiment.seed")),
    )


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("prod_data")
    generate_synthetic_dataset(
        root, n_train=N_TRAIN, n_val=0, n_test=0,
        shape=(24, 24, 24), num_classes=N_CLASSES, seed=3,
    )
    return root


@pytest.mark.e2e
class TestProductionComposition:
    def test_kill_resume_bit_exact_with_full_matrix(self, tmp_path, data_root):
        # --- uninterrupted run ---
        cfg_a = _prod_cfg(tmp_path, data_root, "prod_a")
        ta = Trainer(cfg_a, train_loader=_loader(cfg_a, data_root))
        assert ta.mesh is not None and ta.mesh.shape["data"] > 1
        assert ta._zero1_active(), "ZeRO-1 must be active on the CPU mesh"
        ta.train()
        losses_a = list(ta.last_step_losses)
        assert len(losses_a) == N_TRAIN // BATCH
        assert all(np.isfinite(l) for l in losses_a)

        # ZeRO-1 moments actually sharded over data (not replicated)
        from multimodal_organ_segmentation_tpu.parallel.mesh import zero1_spec

        sharded = []
        for leaf in jax.tree_util.tree_leaves(ta.state.opt_state):
            if hasattr(leaf, "sharding") and leaf.ndim >= 1:
                spec = getattr(leaf.sharding, "spec", None)
                if spec is not None and "data" in tuple(
                    s for s in spec if isinstance(s, str)
                ):
                    sharded.append(leaf)
        assert sharded, "no optimizer leaf carries a data-axis sharding"

        # EMA params exist and differ from the raw params (decay < 1)
        assert ta.state.ema_params is not None
        ema_leaf = jax.tree_util.tree_leaves(ta.state.ema_params)[0]
        raw_leaf = jax.tree_util.tree_leaves(ta.state.params)[0]
        assert not np.allclose(np.asarray(ema_leaf), np.asarray(raw_leaf))

        # --- killed run: same seeds, dies during epoch-1 step 3 ---
        # fetches: 2 (init-shape batch) + 4 (steps 1-2, ckpt after step 2)
        cfg_b = _prod_cfg(tmp_path, data_root, "prod_kill")
        tb = Trainer(cfg_b, train_loader=_loader(cfg_b, data_root, bomb_after=6))
        with pytest.raises(RuntimeError, match="simulated preemption"):
            tb.train()
        step_ckpt = Path(tmp_path / "outputs" / "prod_kill" / "last_step")
        # async writer flushes on the exception path (train()'s finally)
        assert step_ckpt.exists(), "async step checkpoint not flushed on kill"

        # --- resumed run ---
        cfg_c = _prod_cfg(tmp_path, data_root, "prod_kill")
        tc = Trainer(
            cfg_c,
            train_loader=_loader(cfg_c, data_root),
            resume_from=str(step_ckpt),
        )
        tc.train()
        losses_c = list(tc.last_step_losses)

        # bit-exact final-epoch losses (deterministic shuffle + stateless
        # augmentation keys + restored PRNG counter)
        assert losses_c == pytest.approx(losses_a, rel=0, abs=0)

        # final params AND EMA params bit-identical
        for a, c in zip(
            jax.tree_util.tree_leaves(ta.state.params),
            jax.tree_util.tree_leaves(tc.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        for a, c in zip(
            jax.tree_util.tree_leaves(ta.state.ema_params),
            jax.tree_util.tree_leaves(tc.state.ema_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

        # structure-stable optimizer state across the restore boundary
        assert jax.tree_util.tree_structure(
            ta.state.opt_state
        ) == jax.tree_util.tree_structure(tc.state.opt_state)

    def test_stateless_transform_keys(self, data_root):
        """Same (epoch, idx) → same augmented sample across independent
        loaders/pipelines; different epoch → different augmentation."""
        cfg = _prod_cfg(Path("/tmp/unused"), data_root, "prod_keys")
        ds1 = get_dataset(cfg, "train", transform=get_transforms(cfg, "train"))
        ds2 = get_dataset(cfg, "train", transform=get_transforms(cfg, "train"))
        a = np.asarray(ds1.get_sample(1, epoch=4)["image"])
        b = np.asarray(ds2.get_sample(1, epoch=4)["image"])
        np.testing.assert_array_equal(a, b)
        c = np.asarray(ds1.get_sample(1, epoch=5)["image"])
        assert not np.array_equal(a, c)
