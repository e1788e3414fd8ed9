"""Parallelism tests on the virtual 8-device CPU mesh.

The standard JAX answer to "test multi-node without a cluster"
(SURVEY.md §4): psum-equivalence of the sharded train step, mesh
construction, sharded eval reductions, and the graft dryrun.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_organ_segmentation_tpu.models.unet3d import UNet3D
from multimodal_organ_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)
from multimodal_organ_segmentation_tpu.train.losses import dice_ce_loss
from multimodal_organ_segmentation_tpu.train.optim import make_optimizer
from multimodal_organ_segmentation_tpu.train.trainer import TrainState, make_train_step
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode, default_config


def _devices():
    return jax.devices()


class TestMesh:
    def test_make_mesh_default(self):
        cfg = ConfigNode({"parallel": {"mesh": {"data": -1, "model": 1}}})
        mesh = make_mesh(cfg)
        assert mesh.shape["data"] == len(_devices())
        assert mesh.shape["model"] == 1

    def test_make_mesh_2d(self):
        if len(_devices()) < 8:
            pytest.skip("needs 8 devices")
        cfg = ConfigNode({"parallel": {"mesh": {"data": 4, "model": 2}}})
        mesh = make_mesh(cfg)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_mesh(self):
        cfg = ConfigNode({"parallel": {"mesh": {"data": 3, "model": 5}}})
        with pytest.raises(ValueError):
            make_mesh(cfg)

    def test_shard_batch(self):
        mesh = make_mesh(None)
        n = mesh.shape["data"]
        batch = {"image": np.zeros((n * 2, 4, 4, 4, 1)), "patient_id": ["a"] * n}
        out = shard_batch(batch, mesh)
        assert out["image"].sharding.spec == P("data", None, None, None, None)
        assert out["patient_id"] == ["a"] * n


class TestShardedTrainStep:
    def _setup(self, accum=2, micro=8):
        model = UNet3D(out_channels=3, features=(4, 8))
        cfg = default_config()
        cfg.set("training.optimizer.name", "adamw")
        tx = make_optimizer(cfg)
        rng = np.random.default_rng(0)
        images = rng.normal(size=(accum, micro, 8, 8, 8, 1)).astype(np.float32)
        labels = rng.integers(0, 3, size=(accum, micro, 8, 8, 8)).astype(np.int32)
        x0 = jnp.zeros((1, 8, 8, 8, 1))
        variables = dict(model.init(jax.random.key(0), x0, train=False))
        params = variables.pop("params")
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            extra={},
        )
        loss_fn = lambda lg, lb: dice_ce_loss(lg, lb)
        step = make_train_step(model, tx, loss_fn, accum_steps=accum)
        return model, state, step, images, labels

    def test_sharded_equals_single_device(self):
        """DP-sharded step must produce the same loss and params as the
        unsharded step (psum equivalence)."""
        model, state, step, images, labels = self._setup()

        # single-device (replicated) run
        s1, m1 = step(state, jnp.asarray(images), jnp.asarray(labels), jax.random.key(1))

        # sharded run (fresh but identically-seeded state)
        _, state2, step2, _, _ = self._setup()
        mesh = make_mesh(None)
        state2 = replicate_tree(state2, mesh)
        spec = lambda nd: NamedSharding(mesh, P(*([None, "data"] + [None] * (nd - 2))))
        im = jax.device_put(images, spec(images.ndim))
        lb = jax.device_put(labels, spec(labels.ndim))
        s2, m2 = step2(state2, im, lb, jax.random.key(1))

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)
        l2 = jax.tree_util.tree_leaves(s2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_sharded_metric_reduction(self):
        """Device-side dice accumulators reduce correctly over a sharded batch."""
        from multimodal_organ_segmentation_tpu.train.metrics import _dice_update

        mesh = make_mesh(None)
        n = mesh.shape["data"]
        rng = np.random.default_rng(0)
        pred = rng.integers(0, 4, size=(n * 2, 6, 6, 6))
        tgt = rng.integers(0, 4, size=(n * 2, 6, 6, 6))

        i_ref, u_ref = _dice_update(jnp.asarray(pred), jnp.asarray(tgt), 4)

        sh = NamedSharding(mesh, P("data"))
        i_sh, u_sh = _dice_update(
            jax.device_put(jnp.asarray(pred), sh), jax.device_put(jnp.asarray(tgt), sh), 4
        )
        np.testing.assert_allclose(np.asarray(i_sh), np.asarray(i_ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), rtol=1e-6)


class TestZero1:
    """ZeRO-1 optimizer-state sharding over the data axis."""

    def test_zero1_spec(self):
        from multimodal_organ_segmentation_tpu.parallel.mesh import zero1_spec

        assert zero1_spec((3, 3, 3, 8, 16), 8) == P(None, None, None, None, "data")
        assert zero1_spec((16,), 8) == P("data")
        assert zero1_spec((), 8) == P()      # scalar (adam count)
        assert zero1_spec((3, 5), 8) == P()  # nothing divides → replicated
        # largest divisible dim wins (not the first)
        assert zero1_spec((8, 24), 8) == P(None, "data")

    def test_zero1_step_equals_replicated(self):
        """Sharded-moments step must produce the same params as the
        replicated-state step; the output opt state must STAY sharded."""
        from multimodal_organ_segmentation_tpu.parallel.mesh import (
            shard_opt_state,
            zero1_constrainer,
        )

        model = UNet3D(out_channels=3, features=(8, 16))
        cfg = default_config()
        cfg.set("training.optimizer.name", "adamw")
        tx = make_optimizer(cfg)
        rng = np.random.default_rng(0)
        accum, micro = 2, 8
        images = rng.normal(size=(accum, micro, 8, 8, 8, 1)).astype(np.float32)
        labels = rng.integers(0, 3, size=(accum, micro, 8, 8, 8)).astype(np.int32)
        x0 = jnp.zeros((1, 8, 8, 8, 1))
        variables = dict(model.init(jax.random.key(0), x0, train=False))
        params = variables.pop("params")

        def fresh_state():
            # deep copy: the train step donates its input state, which would
            # delete buffers shared between the two runs
            p = jax.tree_util.tree_map(jnp.copy, params)
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=p,
                opt_state=tx.init(p),
                extra={},
            )

        loss_fn = lambda lg, lb: dice_ce_loss(lg, lb)
        mesh = make_mesh(None)
        spec = lambda nd: NamedSharding(mesh, P(*([None, "data"] + [None] * (nd - 2))))
        im = jax.device_put(images, spec(images.ndim))
        lb = jax.device_put(labels, spec(labels.ndim))

        # replicated reference (two steps: moments feed back into step 2)
        step_rep = make_train_step(model, tx, loss_fn, accum_steps=accum)
        s_ref = replicate_tree(fresh_state(), mesh)
        s_ref, _ = step_rep(s_ref, im, lb, jax.random.key(1))
        s_ref, m_ref = step_rep(s_ref, im, lb, jax.random.key(2))

        # ZeRO-1 run
        step_z1 = make_train_step(
            model, tx, loss_fn, accum_steps=accum,
            opt_constraint=zero1_constrainer(mesh),
        )
        s_z1 = replicate_tree(fresh_state(), mesh)
        s_z1 = s_z1.replace(opt_state=shard_opt_state(s_z1.opt_state, mesh))
        s_z1, _ = step_z1(s_z1, im, lb, jax.random.key(1))
        s_z1, m_z1 = step_z1(s_z1, im, lb, jax.random.key(2))

        assert float(m_z1["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_ref.params),
            jax.tree_util.tree_leaves(s_z1.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        # the moments really are sharded (not silently re-replicated)
        n = mesh.shape["data"]
        sharded_leaves = [
            x for x in jax.tree_util.tree_leaves(s_z1.opt_state)
            if hasattr(x, "sharding") and x.ndim > 0
            and any(d % n == 0 and d > 0 for d in x.shape)
        ]
        assert sharded_leaves, "no shardable opt-state leaves found"
        for x in sharded_leaves:
            assert not x.sharding.is_fully_replicated, (
                f"leaf {x.shape} re-replicated: {x.sharding}"
            )

    def test_trainer_places_zero1_state(self):
        from multimodal_organ_segmentation_tpu.train.trainer import Trainer
        from multimodal_organ_segmentation_tpu.utils.config import default_config

        cfg = default_config()
        cfg.set("model.name", "unet3d")
        cfg.set("model.backbone.features", [8, 16])
        cfg.set("model.out_channels", 3)
        cfg.set("data.modalities", ["CT"])
        cfg.set("parallel.zero1", True)
        cfg.set("experiment.output_dir", "/tmp/mos_zero1")
        t = Trainer(cfg, mesh=make_mesh(None))
        assert t._zero1_active()
        t.init_state(np.zeros((8, 8, 8, 1), np.float32))
        leaves = [
            x for x in jax.tree_util.tree_leaves(t.state.opt_state)
            if hasattr(x, "sharding") and x.ndim > 0 and x.shape[-1] % 8 == 0
        ]
        assert leaves and all(not x.sharding.is_fully_replicated for x in leaves)
        # params stay replicated (ZeRO-1, not ZeRO-3)
        for p in jax.tree_util.tree_leaves(t.state.params):
            assert p.sharding.is_fully_replicated

    def test_zero1_composes_with_ema(self):
        """ZeRO-1 sharded moments + in-step EMA in one train step: loss
        finite, moments stay sharded, EMA updates and stays replicated."""
        from multimodal_organ_segmentation_tpu.parallel.mesh import (
            shard_opt_state,
            zero1_constrainer,
        )

        model = UNet3D(out_channels=3, features=(8, 16))
        cfg = default_config()
        tx = make_optimizer(cfg)
        rng = np.random.default_rng(0)
        images = rng.normal(size=(1, 8, 8, 8, 8, 1)).astype(np.float32)
        labels = rng.integers(0, 3, size=(1, 8, 8, 8, 8)).astype(np.int32)
        x0 = jnp.zeros((1, 8, 8, 8, 1))
        variables = dict(model.init(jax.random.key(0), x0, train=False))
        params = variables.pop("params")
        mesh = make_mesh(None)
        # host snapshot BEFORE the step: donation of the replicated state
        # can delete buffers shared with the original device arrays
        p0_host = jax.tree_util.tree_map(np.asarray, params)
        state = replicate_tree(
            TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=tx.init(params),
                extra={},
                ema_params=jax.tree_util.tree_map(jnp.copy, params),
            ),
            mesh,
        )
        state = state.replace(opt_state=shard_opt_state(state.opt_state, mesh))
        step = make_train_step(
            model, tx, lambda lg, lb: dice_ce_loss(lg, lb), accum_steps=1,
            opt_constraint=zero1_constrainer(mesh), ema_decay=0.5,
        )
        spec = lambda nd: NamedSharding(mesh, P(*([None, "data"] + [None] * (nd - 2))))
        new, m = step(
            state,
            jax.device_put(images, spec(images.ndim)),
            jax.device_put(labels, spec(labels.ndim)),
            jax.random.key(1),
        )
        assert np.isfinite(float(m["loss"]))
        sharded = [
            x for x in jax.tree_util.tree_leaves(new.opt_state)
            if hasattr(x, "sharding") and x.ndim > 0
            and not x.sharding.is_fully_replicated
        ]
        assert sharded
        # EMA values are exactly 0.5·init + 0.5·new_params (placement is
        # GSPMD's choice — it may shard EMA leaves like the moments, which
        # is just free ZeRO-style memory saving)
        for e, p0, p1 in zip(
            jax.tree_util.tree_leaves(new.ema_params),
            jax.tree_util.tree_leaves(p0_host),
            jax.tree_util.tree_leaves(new.params),
        ):
            np.testing.assert_allclose(
                np.asarray(e),
                0.5 * np.asarray(p0) + 0.5 * np.asarray(p1),
                atol=1e-6,
            )

    def test_resume_replaces_zero1_sharding(self, tmp_path):
        """Checkpoints restore as host numpy; resume must re-place params
        replicated and the Adam moments ZeRO-1-sharded (not leave numpy
        leaves for jit to place replicated on first use)."""
        from multimodal_organ_segmentation_tpu.train.checkpoint import (
            save_checkpoint,
        )
        from multimodal_organ_segmentation_tpu.train.trainer import Trainer
        from multimodal_organ_segmentation_tpu.utils.config import default_config

        def make_cfg():
            cfg = default_config()
            cfg.set("model.name", "unet3d")
            cfg.set("model.backbone.features", [8, 16])
            cfg.set("model.out_channels", 3)
            cfg.set("data.modalities", ["CT"])
            cfg.set("parallel.zero1", True)
            cfg.set("experiment.output_dir", str(tmp_path))
            return cfg

        t = Trainer(make_cfg(), mesh=make_mesh(None))
        t.init_state(np.zeros((8, 8, 8, 1), np.float32))
        save_checkpoint(t.state, tmp_path / "last", epoch=0)

        t2 = Trainer(
            make_cfg(), mesh=make_mesh(None), resume_from=str(tmp_path / "last")
        )
        t2.init_state(np.zeros((8, 8, 8, 1), np.float32))
        leaves = [
            x for x in jax.tree_util.tree_leaves(t2.state.opt_state)
            if hasattr(x, "sharding") and getattr(x, "ndim", 0) > 0
            and x.shape[-1] % 8 == 0
        ]
        assert leaves and all(not x.sharding.is_fully_replicated for x in leaves)
        for p in jax.tree_util.tree_leaves(t2.state.params):
            assert hasattr(p, "sharding") and p.sharding.is_fully_replicated


class TestTensorParallel:
    """Channel-sharding TP on the flagship (VERDICT round-1 item 7)."""

    def _toy_swin(self, tp_axis=None):
        from multimodal_organ_segmentation_tpu.models.swin_unetr import SwinUNETR

        return SwinUNETR(
            out_channels=4,
            feature_size=4,
            depths=(1, 1, 1, 1),
            num_heads=(2, 2, 4, 4),
            window_size=(2, 2, 2),
            use_fused=False,
            tp_axis=tp_axis,
        )

    def test_swin_unetr_tp_matches_no_tp(self):
        """dp×tp mesh: TP-constrained SwinUNETR forward == unconstrained."""
        if len(_devices()) < 8:
            pytest.skip("needs 8 devices")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 2)).astype(np.float32))

        base = self._toy_swin(None)
        variables = jax.jit(lambda k: base.init(k, x, train=False))(jax.random.key(0))
        ref = np.asarray(base.apply(variables, x, train=False))

        tp = self._toy_swin("model")
        mesh = make_mesh(ConfigNode({"parallel": {"mesh": {"data": 4, "model": 2}}}))
        rep = NamedSharding(mesh, P())
        v_rep = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), variables)
        x_rep = jax.device_put(x, rep)
        with jax.sharding.use_mesh(mesh) if hasattr(
            jax.sharding, "use_mesh"
        ) else mesh:
            out = np.asarray(
                jax.jit(lambda v, a: tp.apply(v, a, train=False))(v_rep, x_rep)
            )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_config_tp_axis_plumbing(self):
        """parallel.mesh.model > 1 turns TP on for swin and unet builders."""
        from multimodal_organ_segmentation_tpu.models.swin_unetr import build_swin_unetr
        from multimodal_organ_segmentation_tpu.models.unet3d import build_unet3d

        cfg = ConfigNode({"parallel": {"mesh": {"data": -1, "model": 2}}})
        assert build_swin_unetr(cfg).tp_axis == "model"
        assert build_unet3d(cfg).tp_axis == "model"
        cfg2 = ConfigNode({"parallel": {"mesh": {"data": -1, "model": 1}}})
        assert build_swin_unetr(cfg2).tp_axis is None
        cfg3 = ConfigNode({"parallel": {"tp_axis": "model"}})
        assert build_swin_unetr(cfg3).tp_axis == "model"


class TestShardedServing:
    """Mesh-parallel sliding-window inference + sharded validation
    (VERDICT r2 item 1: the serving path must touch the mesh)."""

    def _predict(self):
        rng = np.random.default_rng(21)
        w = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
        return {"w": w}, lambda prm, p: jnp.tanh(
            jnp.einsum("nhwdc,ck->nhwdk", p, prm["w"])
        )

    def test_sharded_sliding_window_equals_single_device(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            sharded_sliding_window_inference,
            sliding_window_inference,
        )

        mesh = make_mesh(None)
        prm, predict = self._predict()
        rng = np.random.default_rng(22)
        vol = jnp.asarray(rng.normal(size=(24, 28, 24, 2)).astype(np.float32))

        ref = sliding_window_inference(
            vol, predict, roi_size=(16, 16, 16), num_classes=4,
            overlap=0.5, sw_batch_size=2, params=prm,
        )
        out = sharded_sliding_window_inference(
            vol, predict, roi_size=(16, 16, 16), num_classes=4, mesh=mesh,
            overlap=0.5, sw_batch_size=2, params=prm,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_sharded_runner_equals_single_device(self):
        from multimodal_organ_segmentation_tpu.ops.sliding_window import (
            SlidingWindowRunner,
            sliding_window_inference,
        )

        mesh = make_mesh(None)
        prm, predict = self._predict()
        runner = SlidingWindowRunner(
            predict, roi_size=(16, 16, 16), num_classes=4, overlap=0.5,
            sw_batch_size=2, mesh=mesh,
        )
        rng = np.random.default_rng(23)
        for shape in ((24, 28, 24), (22, 26, 17)):
            vol = jnp.asarray(rng.normal(size=(*shape, 2)).astype(np.float32))
            ref = sliding_window_inference(
                vol, predict, roi_size=(16, 16, 16), num_classes=4,
                overlap=0.5, sw_batch_size=2, params=prm,
            )
            out = runner(vol, prm)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5,
                err_msg=f"shape={shape}",
            )

    def test_sharded_validation_equals_single_device(self):
        """Trainer._validate on a mesh (padded+masked sharded batches) must
        reproduce the single-device loss and dice exactly."""
        from multimodal_organ_segmentation_tpu.train.trainer import Trainer
        from multimodal_organ_segmentation_tpu.utils.config import default_config

        cfg = default_config()
        cfg.set("model.name", "unet3d")
        cfg.set("model.backbone.features", [4, 8])
        cfg.set("model.out_channels", 3)
        cfg.set("model.img_size", [8, 8, 8])
        cfg.set("data.modalities", ["CT"])
        cfg.set("experiment.output_dir", "/tmp/mos_sharded_val")

        rng = np.random.default_rng(30)
        # 5 samples of batch 3 -> last batch is partial on an 8-wide axis
        batches = [
            {
                "image": rng.normal(size=(3, 8, 8, 8, 1)).astype(np.float32),
                "label": rng.integers(0, 3, size=(3, 8, 8, 8)).astype(np.int32),
            }
            for _ in range(2)
        ]

        def run(mesh):
            t = Trainer(cfg, val_loader=batches, mesh=mesh)
            t.init_state(batches[0]["image"][0])
            return t._validate()

        loss_ref, m_ref = run(False)  # mesh=False -> no mesh (see Trainer)
        loss_sh, m_sh = run(make_mesh(None))
        assert loss_sh == pytest.approx(loss_ref, rel=1e-5)
        np.testing.assert_allclose(
            m_sh["dice_per_class"], m_ref["dice_per_class"], rtol=1e-6
        )


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import __graft_entry__ as g

        g.dryrun_multichip(len(_devices()))
