"""Trainer integration tests: end-to-end training on synthetic data,
checkpoint/resume roundtrip, eval, predict."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.data import get_dataloader
from multimodal_organ_segmentation_tpu.data.synthetic import generate_synthetic_dataset
from multimodal_organ_segmentation_tpu.train.trainer import Trainer
from multimodal_organ_segmentation_tpu.train.optim import LRScheduler, make_optimizer
from multimodal_organ_segmentation_tpu.utils.config import default_config


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    generate_synthetic_dataset(
        root, n_train=4, n_val=2, n_test=2, shape=(16, 16, 16), num_classes=4, seed=0
    )
    cfg = default_config()
    cfg.set("data.data_root", str(root))
    cfg.set("model.name", "unet3d")
    cfg.set("model.out_channels", 4)
    cfg.set("model.backbone.features", [8, 16])
    cfg.set("model.backbone.img_size", [16, 16, 16])
    cfg.set("model.head.dropout", 0.0)
    cfg.set("training.epochs", 3)
    cfg.set("training.batch_size", 2)
    cfg.set("training.accumulation_steps", 2)
    cfg.set("training.optimizer.lr", 3e-3)
    cfg.set("training.early_stopping.enabled", False)
    cfg.set("training.checkpoint.save_every", 2)
    cfg.set("hardware.num_workers", 0)
    cfg.set("hardware.mixed_precision", "none")
    cfg.set("experiment.output_dir", str(tmp_path_factory.mktemp("out")))
    return cfg


class TestSchedulers:
    def test_cosine_parity_torch(self):
        torch = pytest.importorskip("torch")
        cfg = default_config()
        cfg.set("training.epochs", 20)
        cfg.set("training.optimizer.lr", 1e-3)
        cfg.set("training.scheduler.name", "cosine")
        cfg.set("training.scheduler.warmup_epochs", 5)
        cfg.set("training.scheduler.min_lr", 1e-5)
        sched = LRScheduler(cfg)

        m = torch.nn.Linear(1, 1)
        opt = torch.optim.SGD(m.parameters(), lr=1e-3)
        ref = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=15, eta_min=1e-5)
        for epoch in range(15):
            ref_lr = opt.param_groups[0]["lr"]
            assert sched.lr_for_epoch(epoch) == pytest.approx(ref_lr, rel=1e-6)
            ref.step()

    def test_step_schedule(self):
        cfg = default_config()
        cfg.set("training.scheduler.name", "step")
        cfg.set("training.scheduler.step_size", 2)
        cfg.set("training.scheduler.gamma", 0.5)
        cfg.set("training.optimizer.lr", 1.0)
        s = LRScheduler(cfg)
        assert [s.lr_for_epoch(e) for e in range(5)] == [1.0, 1.0, 0.5, 0.5, 0.25]

    def test_plateau(self):
        cfg = default_config()
        cfg.set("training.scheduler.name", "plateau")
        cfg.set("training.scheduler.patience", 1)
        cfg.set("training.scheduler.factor", 0.1)
        cfg.set("training.optimizer.lr", 1.0)
        s = LRScheduler(cfg)
        assert s.lr_for_epoch(0, None) == 1.0
        assert s.lr_for_epoch(1, 0.5) == 1.0  # new best
        assert s.lr_for_epoch(2, 0.4) == 1.0  # bad 1 <= patience
        assert s.lr_for_epoch(3, 0.4) == pytest.approx(0.1)  # bad 2 → cut

    def test_grad_clip_norm(self):
        """training.grad_clip_norm bounds the global update norm (sgd,
        lr=1, no momentum → update = −clipped grad)."""
        cfg = default_config()
        cfg.set("training.optimizer.name", "sgd")
        cfg.set("training.optimizer.lr", 1.0)
        cfg.set("training.optimizer.momentum", 0.0)
        cfg.set("training.grad_clip_norm", 0.5)
        tx = make_optimizer(cfg)
        params = {"w": jnp.zeros((4,)), "b": jnp.zeros((2,))}
        state = tx.init(params)
        g = {"w": jnp.full((4,), 100.0), "b": jnp.full((2,), 100.0)}
        updates, _ = tx.update(g, state, params)
        norm = float(
            jnp.sqrt(sum(jnp.sum(u**2) for u in jax.tree_util.tree_leaves(updates)))
        )
        assert norm == pytest.approx(0.5, rel=1e-5)
        # direction preserved
        assert float(updates["w"][0]) < 0
        # toggling the clip must NOT change the opt-state pytree structure
        # (orbax checkpoints hard-fail on any structure change)
        cfg_off = default_config()
        cfg_off.set("training.optimizer.name", "sgd")
        cfg_off.set("training.optimizer.lr", 1.0)
        cfg_off.set("training.optimizer.momentum", 0.0)
        tx_off = make_optimizer(cfg_off)
        assert jax.tree_util.tree_structure(
            tx_off.init(params)
        ) == jax.tree_util.tree_structure(state)

    def test_optimizers_build(self):
        for name in ["adam", "adamw", "sgd", "adafactor"]:
            cfg = default_config()
            cfg.set("training.optimizer.name", name)
            tx = make_optimizer(cfg)
            params = {"w": jnp.ones((3,))}
            state = tx.init(params)
            g = {"w": jnp.ones((3,))}
            updates, _ = tx.update(g, state, params)
            assert jnp.all(jnp.isfinite(updates["w"]))

    def test_adafactor_state_is_factored(self):
        """Adafactor's selling point: optimizer state for an [M, N] matrix
        is O(M + N), not Adam's 2·M·N."""
        # both dims ≥ optax's min_dim_size_to_factor (128) → factored
        params = {"w": jnp.ones((256, 256))}
        cfg = default_config()
        cfg.set("training.optimizer.name", "adafactor")
        af_state = make_optimizer(cfg).init(params)
        cfg2 = default_config()
        cfg2.set("training.optimizer.name", "adamw")
        adam_state = make_optimizer(cfg2).init(params)

        def opt_floats(s):
            return sum(
                x.size for x in jax.tree_util.tree_leaves(s)
                if hasattr(x, "size") and jnp.issubdtype(x.dtype, jnp.floating)
            )

        n_param = 256 * 256
        assert opt_floats(adam_state) >= 2 * n_param
        assert opt_floats(af_state) < n_param // 4
        # an epoch-schedule LR write still works through inject_hyperparams
        from multimodal_organ_segmentation_tpu.train.optim import (
            get_learning_rate,
            set_learning_rate,
        )

        s = set_learning_rate(af_state, 1e-3)
        assert get_learning_rate(s) == pytest.approx(1e-3)


class TestPolyScheduler:
    def test_poly_decay_curve(self):
        cfg = default_config()
        cfg.set("training.epochs", 100)
        cfg.set("training.optimizer.lr", 1e-2)
        cfg.set("training.scheduler", {
            "name": "poly", "power": 0.9, "min_lr": 1e-6, "warmup_epochs": 0,
        })
        sched = LRScheduler(cfg)
        assert sched.lr_for_epoch(0) == pytest.approx(1e-2)
        for e in [1, 10, 50, 99]:
            expect = max(1e-2 * (1 - e / 100) ** 0.9, 1e-6)
            assert sched.lr_for_epoch(e) == pytest.approx(expect, rel=1e-9)
        # monotone non-increasing, floored at min_lr
        lrs = [sched.lr_for_epoch(e) for e in range(101)]
        assert all(a >= b for a, b in zip(lrs, lrs[1:]))
        assert sched.lr_for_epoch(100) == pytest.approx(1e-6)

    def test_poly_with_warmup_ramp(self):
        cfg = default_config()
        cfg.set("training.epochs", 20)
        cfg.set("training.optimizer.lr", 1e-3)
        cfg.set("training.scheduler", {
            "name": "poly", "warmup_epochs": 5, "warmup": True,
            "min_lr": 0.0, "power": 1.0,
        })
        sched = LRScheduler(cfg)
        # linear ramp over the first 5 epochs
        assert sched.lr_for_epoch(0) == pytest.approx(1e-3 / 5)
        assert sched.lr_for_epoch(4) == pytest.approx(1e-3)
        # decay restarts at full lr after the ramp, over E − warmup epochs
        assert sched.lr_for_epoch(5) == pytest.approx(1e-3)
        assert sched.lr_for_epoch(10) == pytest.approx(1e-3 * (1 - 5 / 15))


class TestEndToEnd:
    def test_train_improves_and_checkpoints(self, tiny_cfg):
        train_loader = get_dataloader(tiny_cfg, split="train")
        val_loader = get_dataloader(tiny_cfg, split="val")
        trainer = Trainer(
            tiny_cfg, train_loader=train_loader, val_loader=val_loader
        )
        history = trainer.train()

        assert len(history["train_loss"]) == 3
        # loss decreases over training
        assert history["train_loss"][-1] < history["train_loss"][0]
        # dice does not degrade from the start (3 epochs of a tiny model:
        # allow seed-level noise — this guards regressions, not learning)
        assert history["val_dice"][-1] >= history["val_dice"][0] - 1e-3

        out = Path(tiny_cfg.get("experiment.output_dir")) / str(
            tiny_cfg.get("experiment.name")
        )
        assert (out / "last" / "meta.json").exists()
        assert (out / "best" / "meta.json").exists()
        assert (out / "epoch_2" / "meta.json").exists()
        # machine-readable epoch stream: one JSON line per epoch
        import json

        lines = (out / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 3
        rec = json.loads(lines[-1])
        assert rec["epoch"] == 3
        assert rec["train_loss"] == pytest.approx(history["train_loss"][-1], abs=1e-5)
        assert "seconds" in rec and "lr" in rec

    def test_metrics_stream_pruned_and_strict_json(self, tiny_cfg):
        """Re-running an experiment dir prunes stale metrics.jsonl lines
        (no duplicate epochs for dashboards), and records never contain
        bare NaN tokens strict JSON parsers reject. Also exercises the
        experiment.tensorboard event stream over the same run."""
        import json

        tiny_cfg = tiny_cfg.copy()
        tiny_cfg.set("experiment.tensorboard", True)
        out = Path(tiny_cfg.get("experiment.output_dir")) / str(
            tiny_cfg.get("experiment.name")
        )
        out.mkdir(parents=True, exist_ok=True)
        # stale stream from a previous run, including a legacy NaN token
        (out / "metrics.jsonl").write_text(
            '{"epoch": 1, "train_loss": NaN, "val_loss": 0.5}\n'
            '{"epoch": 9, "train_loss": 0.1, "val_loss": 0.1}\n'
        )
        # ...and a stale tensorboard event file from the same previous run:
        # the fresh run must consolidate (drop its epochs past the restart
        # point) rather than leave two overlapping trajectories on disk
        from multimodal_organ_segmentation_tpu.utils.tensorboard import (
            SummaryWriter,
        )

        with SummaryWriter(out / "tb") as stale_w:
            stale_w.add_scalar("loss/train", 9.9, 1)
            stale_w.add_scalar("loss/train", 8.8, 9)
        trainer = Trainer(
            tiny_cfg,
            train_loader=get_dataloader(tiny_cfg, split="train"),
            val_loader=get_dataloader(tiny_cfg, split="val"),
        )
        trainer.train()

        text = (out / "metrics.jsonl").read_text()
        assert "NaN" not in text and "Infinity" not in text
        lines = text.strip().splitlines()
        recs = [
            json.loads(l, parse_constant=lambda c: pytest.fail(f"bare {c}"))
            for l in lines
        ]
        # fresh run from epoch 0: stale epochs 1 and 9 were pruned, the new
        # trajectory is exactly 1..3 with no duplicates
        assert [r["epoch"] for r in recs] == [1, 2, 3]

        # tensorboard scalar stream mirrors the jsonl trajectory; the stale
        # pre-run event file was consolidated away (single file, no epoch-9
        # ghost, no 9.9 value from the previous run)
        from multimodal_organ_segmentation_tpu.utils.tensorboard import (
            read_scalar_events,
        )

        (tb_file,) = list((out / "tb").iterdir())
        events = read_scalar_events(tb_file)
        assert [s for s, _ in events["loss/train"]] == [1, 2, 3]
        assert events["loss/train"][0][1] != pytest.approx(9.9)
        assert events["loss/train"][-1][1] == pytest.approx(
            recs[-1]["train_loss"], rel=1e-5
        )

    def test_train_with_deep_supervision(self, tiny_cfg):
        """model.head.type=deep_supervision trains end-to-end: multi-scale
        loss in the train step, single-output eval unchanged."""
        cfg = tiny_cfg.copy()
        cfg.set("model.head.type", "deep_supervision")
        cfg.set("model.backbone.features", [8, 16, 32])  # ≥3 → has aux heads
        cfg.set("training.epochs", 2)
        out = Path(cfg.get("experiment.output_dir")).parent / "ds_run"
        cfg.set("experiment.output_dir", str(out))
        t = Trainer(
            cfg,
            train_loader=get_dataloader(cfg, split="train"),
            val_loader=get_dataloader(cfg, split="val"),
        )
        history = t.train()
        assert all(np.isfinite(v) for v in history["train_loss"])
        assert history["train_loss"][-1] < history["train_loss"][0]
        assert "ds_head0" in t.state.params["backbone"]
        m = t.evaluate()
        assert 0.0 <= m["dice"] <= 1.0

    def test_resume_roundtrip(self, tiny_cfg):
        cfg = tiny_cfg.copy()
        cfg.set("training.epochs", 2)
        train_loader = get_dataloader(cfg, split="train")
        val_loader = get_dataloader(cfg, split="val")
        t1 = Trainer(cfg, train_loader=train_loader, val_loader=val_loader)
        t1.train()
        last = Path(cfg.get("experiment.output_dir")) / str(
            cfg.get("experiment.name")
        ) / "last"

        cfg2 = cfg.copy()
        cfg2.set("training.epochs", 3)
        t2 = Trainer(
            cfg2,
            train_loader=get_dataloader(cfg2, split="train"),
            val_loader=get_dataloader(cfg2, split="val"),
            resume_from=str(last),
        )
        first = next(iter(t2.train_loader))
        t2.init_state(np.asarray(first["image"][0]))
        assert t2.current_epoch == 2  # resumes after saved epoch
        assert len(t2.history["train_loss"]) == 2
        hist = t2.train()
        assert len(hist["train_loss"]) == 3  # one more epoch appended

    def test_evaluate(self, tiny_cfg):
        val_loader = get_dataloader(tiny_cfg, split="test")
        trainer = Trainer(tiny_cfg, val_loader=val_loader)
        metrics = trainer.evaluate()
        assert "dice" in metrics and "loss" in metrics
        assert 0 <= metrics["dice"] <= 1

    def test_predict(self, tiny_cfg, tmp_path):
        from multimodal_organ_segmentation_tpu.utils.io import load_nifti, save_nifti

        # build an inference layout {input}/{mod}/case.nii.gz
        rng = np.random.default_rng(0)
        for mod in ["ct", "pet"]:
            d = tmp_path / "in" / mod
            d.mkdir(parents=True)
            save_nifti(
                rng.normal(size=(20, 20, 20)).astype(np.float32),
                d / "case1.nii.gz",
                affine=np.diag([1.5, 1.5, 2.0, 1.0]),
            )

        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        cfg.set("inference.batch_size", 2)
        trainer = Trainer(cfg)
        trainer.init_state(np.zeros((16, 16, 16, 2), np.float32))
        written = trainer.predict(tmp_path / "in", tmp_path / "out")
        assert len(written) == 1
        pred, aff = load_nifti(written[0], return_affine=True, dtype=np.uint8)
        assert pred.shape == (20, 20, 20)
        assert pred.dtype == np.uint8
        assert np.allclose(aff, np.diag([1.5, 1.5, 2.0, 1.0]))


class TestPatchBasedTrainingE2E:
    def test_train_on_native_resolution_patches(self, tiny_cfg):
        """data.patch_based trains end-to-end: the loader yields static
        patch-shaped batches (no resize), loss improves, val runs on the
        deterministic label-centered crop."""
        cfg = tiny_cfg.copy()
        cfg.set("data.patch_based", {
            "enabled": True, "size": [8, 8, 8], "pos_ratio": 0.7,
        })
        cfg.set("training.epochs", 2)
        cfg.set("experiment.name", "patch_based_e2e")
        train_loader = get_dataloader(cfg, split="train")
        batch = next(iter(train_loader))
        assert batch["image"].shape[1:] == (8, 8, 8, 2)
        assert batch["label"].shape[1:] == (8, 8, 8)

        val_loader = get_dataloader(cfg, split="val")
        trainer = Trainer(cfg, train_loader=train_loader, val_loader=val_loader)
        history = trainer.train()
        assert len(history["train_loss"]) == 2
        assert np.isfinite(history["train_loss"]).all()
        assert np.isfinite(history["val_dice"]).all()


class TestNativeValDuringTraining:
    def test_native_val_logged_and_monitored(self, tiny_cfg):
        """training.native_val_every runs the deployed pipeline on the val
        split's native grids mid-training; monitor=dice_native selects the
        best checkpoint by it; training continues (moments NOT frozen)."""
        import json

        cfg = tiny_cfg.copy()
        cfg.set("training.epochs", 3)
        cfg.set("training.native_val_every", 2)
        cfg.set("training.checkpoint.monitor", "dice_native")
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        cfg.set("inference.batch_size", 2)
        cfg.set("experiment.name", "native_val_e2e")
        train_loader = get_dataloader(cfg, split="train")
        val_loader = get_dataloader(cfg, split="val")
        trainer = Trainer(cfg, train_loader=train_loader, val_loader=val_loader)
        history = trainer.train()

        # epochs 2 and 3 (last) computed; epoch 1 off-cycle → None
        native = history["val_dice_native"]
        assert len(native) == 3
        assert native[0] is None
        assert native[1] is not None and np.isfinite(native[1])
        assert native[2] is not None and np.isfinite(native[2])
        # the monitored best is a native value
        assert trainer.best_metric == pytest.approx(max(native[1], native[2]))
        # moments survived (training can continue after native val)
        assert trainer.state.opt_state is not None

        out = Path(cfg.get("experiment.output_dir")) / "native_val_e2e"
        recs = [json.loads(l) for l in
                (out / "metrics.jsonl").read_text().strip().splitlines()]
        assert "val_dice_native" not in recs[0]
        assert recs[1]["val_dice_native"] == pytest.approx(native[1], abs=1e-5)

    def test_monitor_native_requires_schedule(self, tiny_cfg):
        cfg = tiny_cfg.copy()
        cfg.set("training.checkpoint.monitor", "dice_native")
        cfg.set("training.native_val_every", 0)
        trainer = Trainer(
            cfg,
            train_loader=get_dataloader(cfg, split="train"),
            val_loader=get_dataloader(cfg, split="val"),
        )
        with pytest.raises(ValueError, match="native_val_every"):
            trainer.train()


class TestSkipNonfinite:
    def test_bad_batch_does_not_poison_state(self):
        """skip_nonfinite: a nan batch leaves params/opt-state untouched;
        the next clean batch trains normally."""
        from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D
        from multimodal_organ_segmentation_tpu.train.losses import dice_ce_loss
        from multimodal_organ_segmentation_tpu.train.trainer import (
            TrainState,
            make_train_step,
        )

        model = UNet3D(out_channels=3, features=(4, 8))
        cfg = default_config()
        tx = make_optimizer(cfg)
        x0 = jnp.zeros((1, 8, 8, 8, 1))
        variables = dict(model.init(jax.random.key(0), x0, train=False))
        params = variables.pop("params")
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), extra={},
        )
        p0 = jax.tree_util.tree_map(np.asarray, params)  # host copy

        step = make_train_step(
            model, tx, lambda lg, lb: dice_ce_loss(lg, lb),
            accum_steps=1, skip_nonfinite=True,
        )
        rng = np.random.default_rng(0)
        good = rng.normal(size=(1, 2, 8, 8, 8, 1)).astype(np.float32)
        bad = np.full_like(good, np.nan)
        labels = rng.integers(0, 3, size=(1, 2, 8, 8, 8)).astype(np.int32)

        state, m = step(state, jnp.asarray(bad), jnp.asarray(labels), jax.random.key(1))
        assert float(m["skipped"]) == 1.0
        assert int(state.step) == 1  # step counter still advances
        for a, b in zip(
            jax.tree_util.tree_leaves(p0),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))

        state, m = step(state, jnp.asarray(good), jnp.asarray(labels), jax.random.key(2))
        assert float(m["skipped"]) == 0.0
        assert np.isfinite(float(m["loss"]))
        changed = any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(p0),
                jax.tree_util.tree_leaves(state.params),
            )
        )
        assert changed  # clean batch actually trained

    def test_trainer_logs_and_survives_nan_batch(self, tiny_cfg, caplog):
        """End-to-end: a nan sample in the stream is skipped with a warning
        and training completes with finite history."""
        import logging

        cfg = tiny_cfg.copy()
        cfg.set("training.skip_nonfinite_updates", True)
        cfg.set("training.epochs", 1)
        cfg.set("training.accumulation_steps", 1)
        cfg.set("data.modalities", ["CT"])
        rng = np.random.default_rng(1)
        batches = [
            {
                "image": rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32),
                "label": rng.integers(0, 4, size=(2, 16, 16, 16)).astype(np.int32),
            }
            for _ in range(3)
        ]
        batches[1]["image"][:] = np.nan
        logger = logging.getLogger("test_skip_nonfinite")
        t = Trainer(cfg, train_loader=batches, logger=logger, mesh=False)
        with caplog.at_level(logging.WARNING, logger="test_skip_nonfinite"):
            history = t.train()
        assert any("update skipped" in r.message for r in caplog.records)
        assert np.isfinite(history["train_loss"][0])


class TestAsyncCheckpoint:
    def test_async_write_matches_sync(self, tmp_path):
        from multimodal_organ_segmentation_tpu.train.checkpoint import (
            AsyncCheckpointWriter,
            load_checkpoint,
            save_checkpoint,
        )

        tree = {"w": np.arange(8, dtype=np.float32), "b": np.ones(3, np.float32)}
        save_checkpoint(tree, tmp_path / "sync", epoch=3, best_metric=0.5)
        w = AsyncCheckpointWriter()
        w.submit(tree, tmp_path / "async", epoch=3, best_metric=0.5)
        w.flush()
        a = load_checkpoint(tmp_path / "async")
        s = load_checkpoint(tmp_path / "sync")
        assert a["epoch"] == s["epoch"] == 3
        np.testing.assert_array_equal(a["tree"]["w"], s["tree"]["w"])
        w.close()

    def test_same_path_coalesces_latest_wins(self, tmp_path):
        from multimodal_organ_segmentation_tpu.train.checkpoint import (
            AsyncCheckpointWriter,
            load_checkpoint,
        )

        w = AsyncCheckpointWriter()
        for i in range(5):
            w.submit({"v": np.full(4, i, np.float32)}, tmp_path / "last", epoch=i)
        w.flush()
        out = load_checkpoint(tmp_path / "last")
        # queued writes to one path collapse; the LAST snapshot is on disk
        assert out["epoch"] == 4
        np.testing.assert_array_equal(out["tree"]["v"], np.full(4, 4, np.float32))
        w.close()

    def test_worker_error_surfaces_on_flush(self, tmp_path):
        from multimodal_organ_segmentation_tpu.train.checkpoint import (
            AsyncCheckpointWriter,
        )

        blocker = tmp_path / "not_a_dir"
        blocker.write_text("file, not a directory")
        w = AsyncCheckpointWriter()
        w.submit({"v": np.ones(2, np.float32)}, blocker / "ckpt")
        with pytest.raises(RuntimeError, match="async checkpoint write failed"):
            w.flush()
        # the writer stays usable after an error
        w.submit({"v": np.ones(2, np.float32)}, tmp_path / "ok")
        w.flush()
        w.close()

    def test_trainer_async_checkpointing_e2e(self, tiny_cfg):
        """training.checkpoint.async: true → same artifacts, resumable."""
        cfg = tiny_cfg.copy()
        cfg.set("training.checkpoint.async", True)
        cfg.set("training.epochs", 1)
        out = Path(cfg.get("experiment.output_dir")).parent / "async_run"
        cfg.set("experiment.output_dir", str(out))
        t = Trainer(
            cfg,
            train_loader=get_dataloader(cfg, split="train"),
            val_loader=get_dataloader(cfg, split="val"),
        )
        t.train()  # flushes before returning
        run_dir = out / str(cfg.get("experiment.name"))
        assert (run_dir / "last" / "meta.json").exists()
        assert (run_dir / "best" / "meta.json").exists()
        t2 = Trainer(
            cfg,
            train_loader=get_dataloader(cfg, split="train"),
            resume_from=str(run_dir / "last"),
        )
        first = next(iter(t2.train_loader))
        t2.init_state(np.asarray(first["image"][0]))
        assert t2.current_epoch == 1


class TestEMA:
    def _setup(self, ema_decay=0.5, skip_nonfinite=False):
        from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D
        from multimodal_organ_segmentation_tpu.train.losses import dice_ce_loss
        from multimodal_organ_segmentation_tpu.train.trainer import (
            TrainState,
            make_train_step,
        )

        model = UNet3D(out_channels=3, features=(4, 8))
        cfg = default_config()
        cfg.set("training.optimizer.name", "sgd")
        cfg.set("training.optimizer.lr", 0.1)
        tx = make_optimizer(cfg)
        x0 = jnp.zeros((1, 8, 8, 8, 1))
        variables = dict(model.init(jax.random.key(0), x0, train=False))
        params = variables.pop("params")
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), extra={},
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )
        step = make_train_step(
            model, tx, lambda lg, lb: dice_ce_loss(lg, lb),
            accum_steps=1, ema_decay=ema_decay,
            skip_nonfinite=skip_nonfinite,
        )
        return state, step

    def test_ema_matches_hand_computed(self):
        """state.ema_params after k steps == the hand-rolled EMA of the
        host-tracked param trajectory (e ← d·e + (1−d)·p, e₀ = p₀)."""
        d = 0.5
        state, step = self._setup(ema_decay=d)
        ema_hand = jax.tree_util.tree_map(np.asarray, state.params)

        rng = np.random.default_rng(0)
        for i in range(3):
            img = rng.normal(size=(1, 2, 8, 8, 8, 1)).astype(np.float32)
            lbl = rng.integers(0, 3, size=(1, 2, 8, 8, 8)).astype(np.int32)
            state, _ = step(
                state, jnp.asarray(img), jnp.asarray(lbl), jax.random.key(i)
            )
            p_host = jax.tree_util.tree_map(np.asarray, state.params)
            ema_hand = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1 - d), ema_hand, p_host
            )

        for a, b in zip(
            jax.tree_util.tree_leaves(ema_hand),
            jax.tree_util.tree_leaves(state.ema_params),
        ):
            np.testing.assert_allclose(a, np.asarray(b), atol=1e-6)
        # EMA lags the params (it is not just a copy)
        diffs = [
            np.abs(np.asarray(e) - np.asarray(p)).max()
            for e, p in zip(
                jax.tree_util.tree_leaves(state.ema_params),
                jax.tree_util.tree_leaves(state.params),
            )
        ]
        assert max(diffs) > 0

    def test_skipped_step_leaves_ema_untouched(self):
        state, step = self._setup(ema_decay=0.5, skip_nonfinite=True)
        e0 = jax.tree_util.tree_map(np.asarray, state.ema_params)
        rng = np.random.default_rng(0)
        bad = np.full((1, 2, 8, 8, 8, 1), np.nan, np.float32)
        lbl = rng.integers(0, 3, size=(1, 2, 8, 8, 8)).astype(np.int32)
        state, m = step(state, jnp.asarray(bad), jnp.asarray(lbl), jax.random.key(1))
        assert float(m["skipped"]) == 1.0
        for a, b in zip(
            jax.tree_util.tree_leaves(e0),
            jax.tree_util.tree_leaves(state.ema_params),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))

    def test_trainer_ema_eval_and_checkpoint_roundtrip(self, tiny_cfg):
        """training.ema_decay wires EMA through Trainer: eval/predict use
        the smoothed weights, checkpoints carry them, and resume restores
        them."""
        cfg = tiny_cfg.copy()
        cfg.set("training.ema_decay", 0.9)
        cfg.set("training.epochs", 1)
        out = Path(cfg.get("experiment.output_dir")).parent / "ema_run"
        cfg.set("experiment.output_dir", str(out))
        t = Trainer(
            cfg,
            train_loader=get_dataloader(cfg, split="train"),
            val_loader=get_dataloader(cfg, split="val"),
        )
        t.train()
        assert t.state.ema_params is not None
        # eval selects the EMA tree; the EMA genuinely differs from params
        assert t._infer_params() is t.state.ema_params
        diffs = [
            np.abs(np.asarray(e) - np.asarray(p)).max()
            for e, p in zip(
                jax.tree_util.tree_leaves(t.state.ema_params),
                jax.tree_util.tree_leaves(t.state.params),
            )
        ]
        assert max(diffs) > 0
        # ema_eval: false → raw weights
        cfg.set("training.ema_eval", False)
        assert t._infer_params() is t.state.params
        cfg.set("training.ema_eval", True)

        last = out / str(cfg.get("experiment.name")) / "last"
        t2 = Trainer(
            cfg,
            train_loader=get_dataloader(cfg, split="train"),
            resume_from=str(last),
        )
        first = next(iter(t2.train_loader))
        t2.init_state(np.asarray(first["image"][0]))
        for a, b in zip(
            jax.tree_util.tree_leaves(t.state.ema_params),
            jax.tree_util.tree_leaves(t2.state.ema_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_ema_checkpoint_into_non_ema_run(self, tiny_cfg, caplog):
        """The other toggle direction: a checkpoint trained WITH EMA.
        Resuming with EMA off drops the stale EMA (logged); loading for
        eval keeps it — eval runs on the deployed (smoothed) weights."""
        import logging

        cfg = tiny_cfg.copy()
        cfg.set("training.ema_decay", 0.9)
        cfg.set("training.epochs", 1)
        out = Path(cfg.get("experiment.output_dir")).parent / "ema_off_run"
        cfg.set("experiment.output_dir", str(out))
        t = Trainer(cfg, train_loader=get_dataloader(cfg, split="train"))
        t.train()
        last = out / str(cfg.get("experiment.name")) / "last"

        cfg2 = cfg.copy()
        cfg2.set("training.ema_decay", 0.0)
        logger = logging.getLogger("test_ema_off")
        t2 = Trainer(
            cfg2,
            train_loader=get_dataloader(cfg2, split="train"),
            resume_from=str(last),
            logger=logger,
        )
        first = next(iter(t2.train_loader))
        with caplog.at_level(logging.INFO, logger="test_ema_off"):
            t2.init_state(np.asarray(first["image"][0]))
        assert t2.state.ema_params is None  # stale EMA dropped on resume
        assert any("ignoring them" in r.message for r in caplog.records)

        # eval-style load keeps the checkpoint's EMA regardless of config
        t3 = Trainer(cfg2)
        t3.init_state(np.asarray(first["image"][0]))
        t3.load_params(str(last))
        assert t3.state.ema_params is not None
        assert t3._infer_params() is t3.state.ema_params

    def test_resume_pre_ema_checkpoint_restarts_ema(self, tiny_cfg, caplog):
        """Enabling EMA when resuming a pre-EMA checkpoint restarts the EMA
        at the restored weights (with a warning) instead of failing."""
        import logging

        cfg = tiny_cfg.copy()
        cfg.set("training.epochs", 1)
        out = Path(cfg.get("experiment.output_dir")).parent / "pre_ema_run"
        cfg.set("experiment.output_dir", str(out))
        t = Trainer(cfg, train_loader=get_dataloader(cfg, split="train"))
        t.train()
        assert t.state.ema_params is None

        cfg2 = cfg.copy()
        cfg2.set("training.ema_decay", 0.9)
        last = out / str(cfg.get("experiment.name")) / "last"
        logger = logging.getLogger("test_pre_ema")
        t2 = Trainer(
            cfg2,
            train_loader=get_dataloader(cfg2, split="train"),
            resume_from=str(last),
            logger=logger,
        )
        first = next(iter(t2.train_loader))
        with caplog.at_level(logging.WARNING, logger="test_pre_ema"):
            t2.init_state(np.asarray(first["image"][0]))
        assert any("EMA restarted" in r.message for r in caplog.records)
        for a, b in zip(
            jax.tree_util.tree_leaves(t2.state.params),
            jax.tree_util.tree_leaves(t2.state.ema_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestInferenceExtras:
    def _case_dir(self, tmp_path):
        from multimodal_organ_segmentation_tpu.utils.io import save_nifti

        rng = np.random.default_rng(0)
        for mod in ["ct", "pet"]:
            d = tmp_path / "in" / mod
            d.mkdir(parents=True)
            save_nifti(
                rng.normal(size=(16, 16, 16)).astype(np.float32),
                d / "c.nii.gz",
            )
        return tmp_path / "in"

    def test_save_probabilities(self, tiny_cfg, tmp_path):
        """inference.save_probabilities writes a 4D float32 softmax volume
        consistent with the saved mask (argmax(probs) == mask)."""
        from multimodal_organ_segmentation_tpu.utils.io import load_nifti

        in_dir = self._case_dir(tmp_path)
        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        cfg.set("inference.save_probabilities", True)
        t = Trainer(cfg)
        t.init_state(np.zeros((16, 16, 16, 2), np.float32))
        written = t.predict(in_dir, tmp_path / "out")
        assert len(written) == 1
        pred = load_nifti(written[0], dtype=np.uint8)
        probs = load_nifti(tmp_path / "out" / "c_prob.nii.gz")
        assert probs.shape == (16, 16, 16, 4)
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-4)
        np.testing.assert_array_equal(probs.argmax(axis=-1), pred)

    def test_predict_releases_optimizer_state(self, tiny_cfg, tmp_path):
        """Inference-only paths drop the restored Adam moments (2× params
        of HBM) — on serving-sized programs that headroom is the
        difference between fitting and RESOURCE_EXHAUSTED."""
        in_dir = self._case_dir(tmp_path)
        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        t = Trainer(cfg)
        t.init_state(np.zeros((16, 16, 16, 2), np.float32))
        assert t.state.opt_state is not None
        t.predict(in_dir, tmp_path / "out")
        assert t.state.opt_state is None

    def test_save_uncertainty(self, tiny_cfg, tmp_path):
        """inference.save_uncertainty writes a 3D normalized predictive
        entropy map consistent with the probability volume."""
        from multimodal_organ_segmentation_tpu.utils.io import load_nifti

        in_dir = self._case_dir(tmp_path)
        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        cfg.set("inference.save_probabilities", True)
        cfg.set("inference.save_uncertainty", True)
        t = Trainer(cfg)
        t.init_state(np.zeros((16, 16, 16, 2), np.float32))
        t.predict(in_dir, tmp_path / "out")
        unc = load_nifti(tmp_path / "out" / "c_unc.nii.gz")
        probs = load_nifti(tmp_path / "out" / "c_prob.nii.gz")
        assert unc.shape == (16, 16, 16)
        assert unc.min() >= 0.0 and unc.max() <= 1.0 + 1e-5
        expected = -(probs * np.log(np.clip(probs, 1e-12, None))).sum(-1)
        expected /= np.log(probs.shape[-1])
        np.testing.assert_allclose(unc, expected, atol=1e-4)

    def test_ensemble_duplicate_equals_single(self, tiny_cfg, tmp_path):
        """Softmax-averaging an ensemble of IDENTICAL members must
        reproduce the single-model mask exactly (semantic sanity for
        inference.ensemble)."""
        from multimodal_organ_segmentation_tpu.train.checkpoint import (
            save_checkpoint,
        )
        from multimodal_organ_segmentation_tpu.utils.io import load_nifti

        in_dir = self._case_dir(tmp_path)
        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        t = Trainer(cfg)
        t.init_state(np.zeros((16, 16, 16, 2), np.float32))
        save_checkpoint(t.state, tmp_path / "member")
        t.predict(in_dir, tmp_path / "single")
        cfg.set("inference.ensemble", [str(tmp_path / "member")])
        t.predict(in_dir, tmp_path / "ens")
        a = load_nifti(tmp_path / "single" / "c_pred.nii.gz", dtype=np.uint8)
        b = load_nifti(tmp_path / "ens" / "c_pred.nii.gz", dtype=np.uint8)
        np.testing.assert_array_equal(a, b)


class TestTTA:
    def test_tta_predict(self, tiny_cfg, tmp_path):
        """Flip TTA produces a valid prediction; on a flip-equivariant-ish
        random init it should still write correct shapes."""
        from multimodal_organ_segmentation_tpu.utils.io import load_nifti, save_nifti

        rng = np.random.default_rng(0)
        for mod in ["ct", "pet"]:
            d = tmp_path / "in" / mod
            d.mkdir(parents=True)
            save_nifti(
                rng.normal(size=(16, 16, 16)).astype(np.float32),
                d / "c.nii.gz",
            )
        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        cfg.set("inference.tta", True)
        trainer = Trainer(cfg)
        trainer.init_state(np.zeros((16, 16, 16, 2), np.float32))
        written = trainer.predict(tmp_path / "in", tmp_path / "out")
        pred = load_nifti(written[0], dtype=np.uint8)
        assert pred.shape == (16, 16, 16)


class TestCaseShardedInference:
    """Cohort-level case parallelism (inference.case_shard): disjoint case
    subsets per worker whose union is the full cohort — the reference
    predicts serially on one GPU (trainer.py:303-395)."""

    def _cohort(self, tmp_path, n=5):
        from multimodal_organ_segmentation_tpu.utils.io import save_nifti

        rng = np.random.default_rng(0)
        for i in range(n):
            for mod in ["ct", "pet"]:
                d = tmp_path / "in" / mod
                d.mkdir(parents=True, exist_ok=True)
                save_nifti(
                    rng.normal(size=(16, 16, 16)).astype(np.float32),
                    d / f"case{i}.nii.gz",
                )
        return tmp_path / "in"

    def _trainer(self, tiny_cfg, shard):
        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        if shard is not None:
            cfg.set("inference.case_shard", list(shard))
        t = Trainer(cfg)
        t.init_state(np.zeros((16, 16, 16, 2), np.float32))
        return t

    def test_union_of_shards_equals_unsharded(self, tiny_cfg, tmp_path):
        from multimodal_organ_segmentation_tpu.utils.io import load_nifti

        in_dir = self._cohort(tmp_path, n=5)
        # one params tree for all three trainers so the masks must agree
        ref = self._trainer(tiny_cfg, None)
        params = ref.state.params
        full = ref.predict(in_dir, tmp_path / "full")
        assert len(full) == 5

        names = {}
        for pid in (0, 1):
            t = self._trainer(tiny_cfg, (pid, 2))
            t.state = t.state.replace(
                params=jax.tree_util.tree_map(jnp.copy, params)
            )
            written = t.predict(in_dir, tmp_path / f"shard{pid}")
            names[pid] = {p.split("/")[-1] for p in map(str, written)}
        # disjoint, interleaved split covering the cohort
        assert names[0] & names[1] == set()
        assert names[0] | names[1] == {p.split("/")[-1] for p in map(str, full)}
        assert len(names[0]) == 3 and len(names[1]) == 2  # [0::2] / [1::2]
        # per-case masks identical to the unsharded run
        for pid in (0, 1):
            for fname in names[pid]:
                a = load_nifti(tmp_path / f"shard{pid}" / fname, dtype=np.uint8)
                b = load_nifti(tmp_path / "full" / fname, dtype=np.uint8)
                np.testing.assert_array_equal(a, b)

    def test_shard_resolution(self, tiny_cfg):
        t = self._trainer(tiny_cfg, None)
        # auto + single process → no sharding
        assert t._case_shard() is None
        t.config.set("inference.case_shard", False)
        assert t._case_shard() is None
        t.config.set("inference.case_shard", [1, 4])
        assert t._case_shard() == (1, 4)
        t.config.set("inference.case_shard", [0, 1])  # degenerate fleet
        assert t._case_shard() is None
        t.config.set("inference.case_shard", [4, 4])
        with pytest.raises(ValueError):
            t._case_shard()


class TestCaseShardedNativeEval:
    """Cohort-sharded native-grid eval (evaluation.case_shard): each
    worker scores a disjoint case subset; under a multi-process job the
    streaming metric states merge back to full-cohort metrics."""

    def _trainer(self, tiny_cfg, shard=None):
        cfg = tiny_cfg.copy()
        cfg.set("inference.sliding_window.roi_size", [16, 16, 16])
        cfg.set("evaluation.lesion_metrics", True)
        cfg.set("evaluation.calibration", True)
        if shard is not None:
            cfg.set("evaluation.case_shard", list(shard))
        return Trainer(cfg, val_loader=get_dataloader(cfg, split="val"))

    def test_explicit_shard_scores_partial_cohort(self, tiny_cfg):
        m = self._trainer(tiny_cfg, (0, 2)).evaluate_native()
        assert m["num_cases"] == 1
        assert len(m["per_case"]) == 1

    def test_merged_equals_unsharded(self, tiny_cfg, monkeypatch):
        """Simulated 2-process AUTO-sharded run: the shards' payloads merged
        through the allgather hook reproduce the unsharded metrics EXACTLY
        (float64 accumulators sum in the same order; JSON roundtrips
        float64). Auto shards (derived from the jax.distributed topology)
        are the ONLY merging kind — explicit ``[pid, nproc]`` shards stay
        per-worker PARTIAL (see test_explicit_shard_never_merges)."""
        import multimodal_organ_segmentation_tpu.parallel.multihost as mh

        full = self._trainer(tiny_cfg).evaluate_native()
        assert full["num_cases"] == 2

        # simulate a 2-process jax.distributed topology so the default
        # evaluation.case_shard="auto" resolves to a merging CaseShard
        payloads = {}
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        for pid in (0, 1):
            def capture(obj, pid=pid):
                payloads[pid] = obj
                return [obj]

            monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
            monkeypatch.setattr(mh, "allgather_payloads", capture)
            part = self._trainer(tiny_cfg).evaluate_native()
            # capture() returns only this process's payload, so the
            # "merged" result here is the partial single-shard view
            assert part["num_cases"] == 1
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        monkeypatch.setattr(
            mh, "allgather_payloads", lambda obj: [payloads[0], payloads[1]]
        )
        merged = self._trainer(tiny_cfg).evaluate_native()

        assert merged["num_cases"] == 2
        for k in (
            "dice", "hd95", "surface_dice", "assd",
            "lesion_f1", "lesion_tp", "lesion_fp", "lesion_fn", "ece",
        ):
            a, b = merged[k], full[k]
            if a is None or (isinstance(a, float) and np.isnan(a)):
                assert b is None or np.isnan(b), (k, a, b)
            else:
                assert abs(a - b) < 1e-9, (k, a, b)
        np.testing.assert_allclose(
            merged["dice_per_class"], full["dice_per_class"], rtol=0, atol=0
        )
        assert [r["case"] for r in merged["per_case"]] == [
            r["case"] for r in full["per_case"]
        ]

    def test_explicit_shard_never_merges(self, tiny_cfg, monkeypatch):
        """Explicit ``[pid, nproc]`` shards describe INDEPENDENT workers
        (e.g. a coordinator-less job array): even under a multi-process
        jax.distributed topology the result stays per-worker PARTIAL and
        the allgather hook is never invoked — merging would double-count
        every case when all processes read the same explicit slot."""
        import multimodal_organ_segmentation_tpu.parallel.multihost as mh

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 0)

        def boom(obj):
            raise AssertionError("explicit shard must not allgather")

        monkeypatch.setattr(mh, "allgather_payloads", boom)
        part = self._trainer(tiny_cfg, (0, 2)).evaluate_native()
        assert part["num_cases"] == 1
        assert len(part["per_case"]) == 1
