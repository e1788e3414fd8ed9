"""Data layer tests: transforms parity, dataset, loader, synthetic gen."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_organ_segmentation_tpu.data.transforms import (
    balanced_random_crop,
    get_transforms,
    label_centered_crop,
    modality_normalize,
    pad_to_min_size,
    random_crop,
    random_elastic_deform,
    random_flip,
    random_gaussian_noise,
    random_intensity_shift,
    random_rotate90,
    resize_sample,
)
from multimodal_organ_segmentation_tpu.data.dataloader import (
    DataLoader,
    collate_fn,
    pad_tensors,
)
from multimodal_organ_segmentation_tpu.data.synthetic import (
    generate_synthetic_dataset,
    synthetic_volume,
)
from multimodal_organ_segmentation_tpu.utils.config import default_config


class TestModalityNormalize:
    def test_ct_window(self):
        img = jnp.asarray(
            np.linspace(-1000, 1000, 4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4, 1)
        )
        cfg = {"ct": {"window_center": -100, "window_width": 700}}
        out = np.asarray(modality_normalize(img, ["CT"], cfg))
        # window [-450, 250] → clipped to [0, 1]
        assert out.min() == pytest.approx(0.0)
        assert out.max() == pytest.approx(1.0)
        mid = (-100 - (-450)) / 700  # value -100 maps to 0.5
        raw = np.asarray(img[..., 0])
        idx = np.unravel_index(np.argmin(np.abs(raw + 100)), raw.shape)
        assert out[idx][0] == pytest.approx(0.5, abs=0.02)

    def test_pet_max_norm(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 12, (4, 4, 4, 1)).astype(np.float32))
        out = np.asarray(modality_normalize(img, ["PET"], {}))
        assert out.max() == pytest.approx(1.0, abs=1e-5)

    def test_mri_zscore(self):
        img = jnp.asarray(np.random.default_rng(1).normal(50, 10, (6, 6, 6, 1)).astype(np.float32))
        out = np.asarray(modality_normalize(img, ["MRI"], {}))
        assert abs(out.mean()) < 1e-4
        assert out.std() == pytest.approx(1.0, abs=1e-3)

    def test_multi_channel(self):
        img = jnp.asarray(np.random.default_rng(2).uniform(-500, 500, (4, 4, 4, 2)).astype(np.float32))
        cfg = {"ct": {"window_center": 0, "window_width": 400}}
        out = np.asarray(modality_normalize(img, ["CT", "PET"], cfg))
        assert out.shape == (4, 4, 4, 2)
        assert 0 <= out[..., 0].min() and out[..., 0].max() <= 1


class TestRandomTransforms:
    def _sample(self):
        rng = np.random.default_rng(0)
        return {
            "image": jnp.asarray(rng.normal(size=(8, 8, 8, 2)).astype(np.float32)),
            "label": jnp.asarray(rng.integers(0, 4, (8, 8, 8)).astype(np.int32)),
        }

    def test_flip_image_label_consistent(self):
        s = self._sample()
        out = random_flip(s, jax.random.key(3), prob=1.0)  # all axes flipped
        np.testing.assert_allclose(
            np.asarray(out["image"]),
            np.asarray(s["image"])[::-1, ::-1, ::-1],
        )
        np.testing.assert_array_equal(
            np.asarray(out["label"]), np.asarray(s["label"])[::-1, ::-1, ::-1]
        )

    def test_flip_prob_zero_identity(self):
        s = self._sample()
        out = random_flip(s, jax.random.key(0), prob=0.0)
        np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(s["image"]))

    def test_rotate90_consistent(self):
        s = self._sample()
        out = random_rotate90(s, jax.random.key(1), prob=1.0)
        img, lbl = np.asarray(out["image"]), np.asarray(out["label"])
        # find which k was used by comparing against all three
        src_i, src_l = np.asarray(s["image"]), np.asarray(s["label"])
        matched = False
        for k in (1, 2, 3):
            if np.allclose(img, np.rot90(src_i, k, axes=(0, 1))):
                np.testing.assert_array_equal(lbl, np.rot90(src_l, k, axes=(0, 1)))
                matched = True
        assert matched

    def test_intensity_shift_applies(self):
        s = self._sample()
        out = random_intensity_shift(s, jax.random.key(2), prob=1.0)
        assert not np.allclose(np.asarray(out["image"]), np.asarray(s["image"]))
        np.testing.assert_array_equal(np.asarray(out["label"]), np.asarray(s["label"]))

    def test_noise(self):
        s = self._sample()
        out = random_gaussian_noise(s, jax.random.key(3), std=0.5, prob=1.0)
        diff = np.asarray(out["image"]) - np.asarray(s["image"])
        assert diff.std() == pytest.approx(0.5, abs=0.05)

    def test_random_crop(self):
        s = self._sample()
        out = random_crop(s, jax.random.key(4), (4, 4, 4))
        assert out["image"].shape == (4, 4, 4, 2)
        assert out["label"].shape == (4, 4, 4)

    def test_resize_sample(self):
        s = self._sample()
        out = resize_sample(s, (6, 6, 6))
        assert out["image"].shape == (6, 6, 6, 2)
        assert out["label"].shape == (6, 6, 6)
        assert out["label"].dtype == s["label"].dtype


class TestRandomZoom:
    """random_scale was declared-but-dead in the reference config; here
    it really zooms."""

    def _sample(self, seed=0, shape=(12, 12, 12)):
        rng = np.random.default_rng(seed)
        return {
            "image": rng.normal(size=(*shape, 2)).astype(np.float32),
            "label": rng.integers(0, 4, shape).astype(np.int32),
        }

    def test_unit_scale_is_identity(self):
        from multimodal_organ_segmentation_tpu.data.transforms import random_zoom

        s = self._sample()
        out = random_zoom(s, jax.random.key(0), scale_range=(1.0, 1.0), prob=1.0)
        np.testing.assert_allclose(np.asarray(out["image"]), s["image"], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["label"]), s["label"])

    def test_zoom_changes_image_keeps_shape_and_labels(self):
        from multimodal_organ_segmentation_tpu.data.transforms import random_zoom

        s = self._sample()
        out = random_zoom(s, jax.random.key(1), scale_range=(1.2, 1.2), prob=1.0)
        assert out["image"].shape == s["image"].shape
        assert not np.allclose(np.asarray(out["image"]), s["image"])
        assert set(np.unique(np.asarray(out["label"]))) <= set(np.unique(s["label"]))

    def test_magnify_center_fixed(self):
        """Scale about the center: the center voxel is (nearly) unchanged
        under magnification."""
        from multimodal_organ_segmentation_tpu.data.transforms import random_zoom

        s = self._sample(shape=(13, 13, 13))  # odd → integer center
        out = random_zoom(s, jax.random.key(2), scale_range=(1.3, 1.3), prob=1.0)
        np.testing.assert_allclose(
            np.asarray(out["image"])[6, 6, 6], s["image"][6, 6, 6], atol=1e-5
        )

    def test_pipeline_honors_random_scale_key(self, default_cfg):
        cfg = default_cfg
        cfg.set("model.backbone.img_size", [16, 16, 16])
        cfg.set("data.augmentation.random_scale", [0.8, 0.8])
        pipe = get_transforms(cfg, mode="train")
        rng = np.random.default_rng(0)
        sample = {
            "image": rng.uniform(-500, 500, (20, 20, 20, 2)).astype(np.float32),
            "label": rng.integers(0, 8, (20, 20, 20)).astype(np.int32),
        }
        out = pipe(sample, jax.random.key(0))
        assert out["image"].shape == (16, 16, 16, 2)


class TestElasticDeform:
    def _sample(self, seed=0, shape=(12, 12, 12)):
        rng = np.random.default_rng(seed)
        return {
            "image": rng.normal(size=(*shape, 2)).astype(np.float32),
            "label": rng.integers(0, 4, shape).astype(np.int32),
        }

    def test_zero_alpha_is_identity(self):
        s = self._sample()
        out = random_elastic_deform(s, jax.random.key(0), alpha=0.0, prob=1.0)
        # zero displacement → trilinear sampling at exact integer coords
        np.testing.assert_allclose(
            np.asarray(out["image"]), s["image"], atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(out["label"]), s["label"])

    def test_warp_moves_image_and_preserves_label_values(self):
        s = self._sample()
        out = random_elastic_deform(s, jax.random.key(1), alpha=3.0, prob=1.0)
        assert not np.allclose(np.asarray(out["image"]), s["image"])
        # nearest-neighbor label warp: the label SET never grows
        assert set(np.unique(np.asarray(out["label"]))) <= set(
            np.unique(s["label"])
        )
        assert out["label"].dtype == s["label"].dtype
        assert out["image"].shape == s["image"].shape

    def test_prob_zero_is_passthrough(self):
        s = self._sample()
        out = random_elastic_deform(s, jax.random.key(2), alpha=3.0, prob=0.0)
        np.testing.assert_array_equal(np.asarray(out["image"]), s["image"])
        np.testing.assert_array_equal(np.asarray(out["label"]), s["label"])

    def test_deterministic_per_key_and_jittable(self):
        s = self._sample()
        fn = jax.jit(
            lambda smp, k: random_elastic_deform(smp, k, alpha=2.0, prob=1.0)
        )
        a = fn(s, jax.random.key(3))
        b = fn(s, jax.random.key(3))
        c = fn(s, jax.random.key(4))
        np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
        assert not np.array_equal(np.asarray(a["image"]), np.asarray(c["image"]))

    def test_pipeline_wiring(self, default_cfg):
        cfg = default_cfg
        cfg.set("model.backbone.img_size", [16, 16, 16])
        cfg.set("data.augmentation.elastic.enabled", True)
        cfg.set("data.augmentation.elastic.prob", 1.0)
        pipe = get_transforms(cfg, mode="train")
        rng = np.random.default_rng(0)
        sample = {
            "image": rng.uniform(-500, 500, (20, 20, 20, 2)).astype(np.float32),
            "label": rng.integers(0, 8, (20, 20, 20)).astype(np.int32),
        }
        out = pipe(sample, jax.random.key(0))
        assert out["image"].shape == (16, 16, 16, 2)
        assert out["label"].shape == (16, 16, 16)


class TestPipeline:
    def test_train_pipeline(self, default_cfg):
        cfg = default_cfg
        cfg.set("model.backbone.img_size", [16, 16, 16])
        pipe = get_transforms(cfg, mode="train")
        rng = np.random.default_rng(0)
        sample = {
            "image": rng.uniform(-500, 500, (20, 20, 20, 2)).astype(np.float32),
            "label": rng.integers(0, 8, (20, 20, 20)).astype(np.int32),
            "patient_id": "p0",
        }
        out = pipe(sample, jax.random.key(0))
        assert out["image"].shape == (16, 16, 16, 2)
        assert out["label"].shape == (16, 16, 16)
        assert out["patient_id"] == "p0"  # metadata passthrough

    def test_val_pipeline_deterministic(self, default_cfg):
        cfg = default_cfg
        cfg.set("model.backbone.img_size", [16, 16, 16])
        pipe = get_transforms(cfg, mode="val")
        rng = np.random.default_rng(0)
        sample = {
            "image": rng.uniform(-500, 500, (20, 20, 20, 2)).astype(np.float32),
            "label": rng.integers(0, 8, (20, 20, 20)).astype(np.int32),
        }
        out1 = pipe(sample, jax.random.key(0))
        out2 = pipe(sample, jax.random.key(99))
        np.testing.assert_array_equal(np.asarray(out1["image"]), np.asarray(out2["image"]))


class TestPatchBasedTraining:
    """Native-resolution patch sampling (data.patch_based) — the training
    mode the reference cannot offer (it always resizes whole volumes,
    /root/reference/src/data/transforms.py:445-449)."""

    @staticmethod
    def _lesion_sample(vol=40, lesion_at=(3, 3, 3), lesion_sz=2):
        """A tiny off-center lesion in an otherwise empty volume."""
        image = np.zeros((vol, vol, vol, 2), np.float32)
        label = np.zeros((vol, vol, vol), np.int32)
        s = tuple(slice(a, a + lesion_sz) for a in lesion_at)
        label[s] = 3
        image[(*s, slice(None))] = 5.0
        return {"image": jnp.asarray(image), "label": jnp.asarray(label)}

    def test_pos_ratio_one_always_hits_foreground(self):
        sample = self._lesion_sample()
        for i in range(8):
            out = balanced_random_crop(
                sample, jax.random.key(i), (8, 8, 8), pos_ratio=1.0
            )
            assert out["image"].shape == (8, 8, 8, 2)
            assert out["label"].shape == (8, 8, 8)
            assert int(jnp.sum(out["label"] > 0)) > 0

    def test_pos_ratio_zero_is_uniform(self):
        # uniform 8³ patches hit a 2³ corner lesion in a 40³ grid ~2% of
        # the time; 10 all-hitting draws would be ~1e-17
        sample = self._lesion_sample()
        hits = sum(
            int(jnp.sum(balanced_random_crop(
                sample, jax.random.key(i), (8, 8, 8), pos_ratio=0.0
            )["label"]) > 0)
            for i in range(10)
        )
        assert hits < 10

    def test_class_balanced_upsamples_small_organs(self):
        """A 2-voxel class and a ~4000-voxel class, far apart: voxel-uniform
        sampling essentially never centers on the small one; class-uniform
        sampling hits it ~half the time."""
        label = np.zeros((40, 40, 40), np.int32)
        label[2:4, 2:4, 2:3] = 1                      # 8 voxels, one corner
        label[24:40, 24:40, 24:40] = 2                # 4096 voxels, far corner
        sample = {
            "image": jnp.zeros((40, 40, 40, 1), jnp.float32),
            "label": jnp.asarray(label),
        }
        def hits(class_balanced, n=16):
            c = 0
            for i in range(n):
                out = balanced_random_crop(
                    sample, jax.random.key(i), (8, 8, 8), pos_ratio=1.0,
                    class_balanced=class_balanced, num_classes=3,
                )
                c += int(jnp.any(out["label"] == 1))
            return c
        # P(voxel-uniform draw lands on class 1) = 8/4104 ≈ 0.2% → 16 draws
        # hit ≥6 times with probability < 1e-9
        assert hits(False) < 6
        # class-uniform: each draw hits class 1 w.p. 1/2 → ≥1 hit in 16
        # draws fails with probability 2^-16
        assert hits(True) >= 1

    def test_all_background_falls_back_uniform(self):
        sample = {
            "image": jnp.ones((20, 20, 20, 1), jnp.float32),
            "label": jnp.zeros((20, 20, 20), jnp.int32),
        }
        out = balanced_random_crop(sample, jax.random.key(0), (8, 8, 8), 1.0)
        assert out["label"].shape == (8, 8, 8)
        assert int(jnp.sum(out["label"])) == 0

    def test_pad_to_min_size(self):
        sample = {
            "image": jnp.ones((6, 10, 6, 2), jnp.float32),
            "label": jnp.ones((6, 10, 6), jnp.int32),
        }
        out = pad_to_min_size(sample, (8, 8, 8))
        assert out["image"].shape == (8, 10, 8, 2)
        assert out["label"].shape == (8, 10, 8)
        # centered pad: original content in the middle, zeros at the rim
        assert int(out["label"][0, 0, 0]) == 0
        assert int(out["label"][1, 0, 1]) == 1

    def test_label_centered_crop_deterministic_and_covering(self):
        sample = self._lesion_sample(lesion_at=(30, 30, 30), lesion_sz=4)
        out1 = label_centered_crop(sample, (8, 8, 8))
        out2 = label_centered_crop(sample, (8, 8, 8))
        np.testing.assert_array_equal(
            np.asarray(out1["label"]), np.asarray(out2["label"])
        )
        # the whole 4³ lesion fits in the centered 8³ patch
        assert int(jnp.sum(out1["label"] > 0)) == 4 ** 3

    def test_pipeline_wiring(self, default_cfg):
        cfg = default_cfg
        cfg.set("model.backbone.img_size", [16, 16, 16])
        cfg.set("data.patch_based", {
            "enabled": True, "size": [8, 8, 8], "pos_ratio": 1.0,
        })
        rng = np.random.default_rng(0)
        sample = {
            "image": rng.uniform(-500, 500, (24, 24, 24, 2)).astype(np.float32),
            "label": (rng.uniform(size=(24, 24, 24)) < 0.1).astype(np.int32),
        }
        train_out = get_transforms(cfg, mode="train")(sample, jax.random.key(0))
        assert train_out["image"].shape == (8, 8, 8, 2)
        assert train_out["label"].shape == (8, 8, 8)

        val = get_transforms(cfg, mode="val")
        v1 = val(sample, jax.random.key(0))
        v2 = val(sample, jax.random.key(7))
        assert v1["image"].shape == (8, 8, 8, 2)
        np.testing.assert_array_equal(
            np.asarray(v1["image"]), np.asarray(v2["image"])
        )

        # test/eval keep the reference's resize semantics
        test_out = get_transforms(cfg, mode="test")(sample, jax.random.key(0))
        assert test_out["image"].shape == (16, 16, 16, 2)

    def test_pipeline_pads_small_volumes(self, default_cfg):
        cfg = default_cfg
        cfg.set("data.patch_based", {"enabled": True, "size": [8, 8, 8]})
        sample = {
            "image": np.ones((5, 5, 5, 2), np.float32),
            "label": np.ones((5, 5, 5), np.int32),
        }
        out = get_transforms(cfg, mode="train")(sample, jax.random.key(0))
        assert out["image"].shape == (8, 8, 8, 2)


class TestCollate:
    def test_pad_tensors(self):
        a = np.ones((2, 3)), np.ones((3, 2))
        out = pad_tensors(list(a))
        assert out.shape == (2, 3, 3)

    def test_collate_same_shape(self):
        samples = [
            {"image": np.zeros((4, 4, 4, 1)), "patient_id": "a"},
            {"image": np.ones((4, 4, 4, 1)), "patient_id": "b"},
        ]
        batch = collate_fn(samples)
        assert batch["image"].shape == (2, 4, 4, 4, 1)
        assert batch["patient_id"] == ["a", "b"]

    def test_collate_mismatched(self):
        samples = [{"image": np.zeros((4, 4, 4, 1))}, {"image": np.ones((6, 4, 4, 1))}]
        batch = collate_fn(samples)
        assert batch["image"].shape == (2, 6, 4, 4, 1)


class TestSyntheticAndLoader:
    def test_synthetic_volume(self):
        img, lbl = synthetic_volume((16, 16, 16), 4, np.random.default_rng(0))
        assert img.shape == (16, 16, 16, 2)
        assert lbl.shape == (16, 16, 16)
        assert set(np.unique(lbl)) <= set(range(4))
        assert len(np.unique(lbl)) > 1  # some organs present

    def test_end_to_end_dataset_loader(self, tmp_path, default_cfg):
        csvs = generate_synthetic_dataset(
            tmp_path, n_train=3, n_val=1, n_test=1, shape=(12, 12, 12), num_classes=4
        )
        cfg = default_cfg
        cfg.set("data.data_root", str(tmp_path))
        cfg.set("model.backbone.img_size", [12, 12, 12])
        cfg.set("training.batch_size", 2)
        cfg.set("hardware.num_workers", 2)

        from multimodal_organ_segmentation_tpu.data import get_dataloader

        loader = get_dataloader(cfg, split="train")
        batches = list(loader)
        assert len(batches) == 1  # 3 samples, batch 2, drop_last
        b = batches[0]
        assert np.asarray(b["image"]).shape == (2, 12, 12, 12, 2)
        assert np.asarray(b["label"]).shape == (2, 12, 12, 12)

        val_loader = get_dataloader(cfg, split="val")
        vb = list(val_loader)
        assert len(vb) == 1

    def test_loader_shuffle_deterministic(self, tmp_path, default_cfg):
        generate_synthetic_dataset(
            tmp_path, n_train=4, n_val=1, n_test=1, shape=(8, 8, 8), num_classes=3
        )
        cfg = default_cfg
        cfg.set("data.data_root", str(tmp_path))
        cfg.set("model.backbone.img_size", [8, 8, 8])
        cfg.set("training.batch_size", 1)

        from multimodal_organ_segmentation_tpu.data import get_dataloader

        l1 = get_dataloader(cfg, split="train")
        l2 = get_dataloader(cfg, split="train")
        ids1 = [b["patient_id"][0] for b in l1]
        ids2 = [b["patient_id"][0] for b in l2]
        assert ids1 == ids2  # same seed → same order

    def test_process_shard_partitions_batches(self):
        """Multi-host loading: the per-process loaders' rows union to
        exactly the unsharded loader's batches (no overlap, no loss)."""
        from multimodal_organ_segmentation_tpu.data.dataloader import DataLoader

        class Ints:
            def __len__(self):
                return 12

            def __getitem__(self, i):
                return {"idx": np.asarray([i])}

        def rows(loader, epoch):
            return [
                [int(v) for v in np.asarray(b["idx"]).ravel()]
                for b in loader.epoch_iter(epoch)
            ]

        full = DataLoader(Ints(), batch_size=4, shuffle=True, num_workers=0)
        p0 = DataLoader(Ints(), batch_size=4, shuffle=True, num_workers=0,
                        process_shard=(0, 2))
        p1 = DataLoader(Ints(), batch_size=4, shuffle=True, num_workers=0,
                        process_shard=(1, 2))
        for epoch in (1, 2):
            f = rows(full, epoch)
            a, b = rows(p0, epoch), rows(p1, epoch)
            assert len(a) == len(b) == len(f) == 3
            for fi, ai, bi in zip(f, a, b):
                assert ai + bi == fi  # contiguous block split, full coverage
                assert len(ai) == len(bi) == 2

        bad = DataLoader(Ints(), batch_size=3, shuffle=False, num_workers=0,
                         process_shard=(0, 2))
        with pytest.raises(ValueError, match="divide"):
            list(bad.epoch_iter(1))

    def test_inference_dataset(self, tmp_path):
        from multimodal_organ_segmentation_tpu.data import InferenceDataset
        from multimodal_organ_segmentation_tpu.utils.io import save_nifti

        rng = np.random.default_rng(0)
        paths = {"CT": [], "PET": []}
        for i in range(2):
            for mod in paths:
                p = tmp_path / f"{mod}_{i}.nii.gz"
                save_nifti(rng.normal(size=(8, 8, 8)).astype(np.float32), p)
                paths[mod].append(p)
        ds = InferenceDataset(paths)
        assert len(ds) == 2
        s = ds[0]
        assert s["image"].shape == (8, 8, 8, 2)
        assert "label" not in s


class TestDecodedCache:
    def _dataset(self, tmp_path, cache_bytes):
        from multimodal_organ_segmentation_tpu.data.dataset import (
            MultiModalDataset,
        )

        generate_synthetic_dataset(
            tmp_path, n_train=2, n_val=1, n_test=1, shape=(8, 8, 8),
            num_classes=3, seed=0,
        )
        return MultiModalDataset(
            csv_path=tmp_path / "train.csv",
            data_root=tmp_path,
            modalities=["CT", "PET"],
            cache_bytes=cache_bytes,
        )

    def test_cache_survives_file_deletion(self, tmp_path):
        """Proof the second epoch never touches disk: delete the NIfTIs
        after the first read — the cached sample still loads, bit-equal."""
        import shutil

        ds = self._dataset(tmp_path, cache_bytes=1 << 30)
        first = ds[0]
        shutil.rmtree(tmp_path / "train")
        second = ds[0]
        np.testing.assert_array_equal(
            np.asarray(first["image"]), np.asarray(second["image"])
        )
        np.testing.assert_array_equal(
            np.asarray(first["label"]), np.asarray(second["label"])
        )

    def test_budget_zero_disables_cache(self, tmp_path):
        import shutil

        ds = self._dataset(tmp_path, cache_bytes=0)
        ds[0]
        shutil.rmtree(tmp_path / "train")
        with pytest.raises(Exception):
            ds[0]

    def test_budget_bounds_memory(self, tmp_path):
        ds = self._dataset(tmp_path, cache_bytes=1)  # too small for anything
        ds[0]
        assert ds._cache_used == 0 and not ds._cache

    def test_budget_shared_across_instances(self, tmp_path):
        """data.cache_gb is a HOST-RAM budget: train+val instances share one
        process-global pool instead of each claiming the full budget."""
        from multimodal_organ_segmentation_tpu.data import dataset as ds_mod

        ds_mod._CACHE_BUDGET.used = 0  # isolate from other tests' datasets
        ds1 = self._dataset(tmp_path, cache_bytes=0)
        sample = ds1.load_raw(0)
        nbytes = sample["image"].nbytes + sample["label"].nbytes
        budget = int(nbytes * 1.5)  # room for one sample, not two

        ds_a = self._dataset(tmp_path / "a", cache_bytes=budget)
        ds_b = self._dataset(tmp_path / "b", cache_bytes=budget)
        ds_a.load_raw(0)
        ds_b.load_raw(0)
        assert ds_a._cache_used == nbytes
        # the second instance found the global pool exhausted
        assert ds_b._cache_used == 0 and not ds_b._cache
        # releasing the first instance's share frees the pool
        del ds_a
        ds_b.load_raw(1)
        assert ds_b._cache_used == nbytes


class TestDevicePrefetch:
    def test_prefetch_preserves_batches(self, tmp_path, default_cfg):
        from multimodal_organ_segmentation_tpu.data import get_dataloader
        from multimodal_organ_segmentation_tpu.data.dataloader import device_prefetch

        generate_synthetic_dataset(
            tmp_path, n_train=4, n_val=4, n_test=1, shape=(8, 8, 8), num_classes=3
        )
        cfg = default_cfg
        cfg.set("data.data_root", str(tmp_path))
        cfg.set("model.backbone.img_size", [8, 8, 8])
        cfg.set("training.batch_size", 2)
        loader = get_dataloader(cfg, split="val")  # no shuffle → stable order
        direct = [np.asarray(b["image"]) for b in loader]
        prefetched = [np.asarray(b["image"]) for b in device_prefetch(iter(loader))]
        assert len(direct) == len(prefetched)
        for a, b in zip(direct, prefetched):
            np.testing.assert_allclose(a, b)


class TestCompose:
    def test_compose_mixed(self):
        from multimodal_organ_segmentation_tpu.data.transforms import Compose

        sample = {
            "image": jnp.ones((4, 4, 4, 1)),
            "label": jnp.zeros((4, 4, 4), jnp.int32),
        }
        pipeline = Compose([
            lambda s: {**s, "image": s["image"] * 2.0},
            lambda s, key: random_gaussian_noise(s, key, std=0.1, prob=1.0),
            lambda s: resize_sample(s, (2, 2, 2)),
        ])
        out = pipeline(sample, jax.random.key(0))
        assert out["image"].shape == (2, 2, 2, 1)
        assert float(jnp.mean(out["image"])) == pytest.approx(2.0, abs=0.2)
