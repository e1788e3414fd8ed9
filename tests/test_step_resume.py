"""Step-granular preemption recovery (VERDICT r2 item 9).

Kill a training run mid-epoch and resume from the step checkpoint: the
resumed run must reproduce the uninterrupted run's per-step losses and
final params exactly (deterministic per-epoch shuffle + PRNG counter
restore make the trajectory bit-identical on CPU).
"""

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.data.dataloader import DataLoader
from multimodal_organ_segmentation_tpu.train.trainer import Trainer
from multimodal_organ_segmentation_tpu.utils.config import default_config

N_SAMPLES = 6
SHAPE = (8, 8, 8)
N_CLASSES = 3


class _ArrayDataset:
    """Minimal dataset over in-memory arrays."""

    def __init__(self, n=N_SAMPLES, seed=0, bomb_after=None):
        rng = np.random.default_rng(seed)
        self.images = rng.normal(size=(n, *SHAPE, 1)).astype(np.float32)
        self.labels = rng.integers(0, N_CLASSES, size=(n, *SHAPE)).astype(np.int32)
        self.bomb_after = bomb_after
        self.fetches = 0

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        self.fetches += 1
        if self.bomb_after is not None and self.fetches > self.bomb_after:
            raise RuntimeError("simulated preemption")
        return {"image": self.images[i], "label": self.labels[i]}


def _cfg(tmp_path, name):
    cfg = default_config()
    cfg.set("experiment.name", name)
    cfg.set("experiment.output_dir", str(tmp_path))
    cfg.set("experiment.seed", 7)
    cfg.set("model.name", "unet3d")
    cfg.set("model.backbone.features", [4, 8])
    cfg.set("model.out_channels", N_CLASSES)
    cfg.set("data.modalities", ["CT"])
    cfg.set("training.epochs", 2)
    cfg.set("training.batch_size", 1)
    cfg.set("training.accumulation_steps", 1)
    cfg.set("training.checkpoint.save_every_steps", 2)
    cfg.set("training.checkpoint.save_every", 0)
    return cfg


def _loader(dataset):
    return DataLoader(dataset, batch_size=1, shuffle=True, num_workers=0, seed=7)


class TestStepResume:
    def test_kill_and_resume_reproduces_trajectory(self, tmp_path):
        # --- uninterrupted run ---
        cfg_a = _cfg(tmp_path, "uninterrupted")
        ta = Trainer(cfg_a, train_loader=_loader(_ArrayDataset()), mesh=False)
        ta.train()
        losses_a = list(ta.last_step_losses)  # epoch 1 (last) step losses
        hist_a = list(ta.history["train_loss"])

        # --- killed run: dies during epoch-0 step 4 (after ckpt at step 2) ---
        cfg_b = _cfg(tmp_path, "killed")
        bomb = _ArrayDataset(bomb_after=3)
        tb = Trainer(cfg_b, train_loader=_loader(bomb), mesh=False)
        with pytest.raises(RuntimeError, match="simulated preemption"):
            tb.train()
        step_ckpt = tmp_path / "killed" / "last_step"
        assert step_ckpt.exists(), "step checkpoint not written before the kill"

        # --- resumed run ---
        cfg_c = _cfg(tmp_path, "killed")  # same output dir as the killed run
        tc = Trainer(
            cfg_c,
            train_loader=_loader(_ArrayDataset()),
            mesh=False,
            resume_from=str(step_ckpt),
        )
        tc.train()
        losses_c = list(tc.last_step_losses)

        # final-epoch step losses match the uninterrupted run exactly
        assert losses_c == pytest.approx(losses_a, rel=0, abs=0)
        # final params bit-identical
        import jax

        la = jax.tree_util.tree_leaves(ta.state.params)
        lc = jax.tree_util.tree_leaves(tc.state.params)
        for a, c in zip(la, lc):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        # resumed epoch-0 mean covers only the remaining steps — but the
        # epoch count matches
        assert len(tc.history["train_loss"]) == len(hist_a)

    def test_epoch_iter_deterministic_and_skippable(self):
        ds = _ArrayDataset()
        dl = _loader(ds)
        full = [b["image"].sum() for b in dl.epoch_iter(3)]
        again = [b["image"].sum() for b in dl.epoch_iter(3)]
        assert full == again  # same epoch -> same order
        other = [b["image"].sum() for b in dl.epoch_iter(4)]
        assert full != other  # different epoch -> different shuffle
        skipped = [b["image"].sum() for b in dl.epoch_iter(3, skip_batches=2)]
        assert skipped == full[2:]

    def test_keystream_counter_restore(self):
        from multimodal_organ_segmentation_tpu.utils.prng import KeyStream

        import jax

        ks = KeyStream(5)
        seq = [np.asarray(jax.random.key_data(ks.next())).tolist() for _ in range(4)]
        ks2 = KeyStream(5, counter=2)
        seq2 = [np.asarray(jax.random.key_data(ks2.next())).tolist() for _ in range(2)]
        assert seq[2:] == seq2
