"""Preprocessing tests: DICOM codec, converter, SUV formulas, normalizer,
registration."""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.preprocessing import dicom as dcm
from multimodal_organ_segmentation_tpu.preprocessing.dicom_converter import DicomConverter
from multimodal_organ_segmentation_tpu.preprocessing.normalizer import IntensityNormalizer
from multimodal_organ_segmentation_tpu.preprocessing.registration import ImageRegistration
from multimodal_organ_segmentation_tpu.preprocessing.suv_calculator import (
    SUVCalculator,
    bsa_dubois,
    decay_factor,
    lbm_james,
    lbm_janmahasatian,
    suv_factor,
    time_to_seconds,
)
from multimodal_organ_segmentation_tpu.utils.config import ConfigNode
from multimodal_organ_segmentation_tpu.utils.io import load_nifti, save_nifti


def _write_ct_series(out_dir: Path, n_slices=4, rows=8, cols=8, rng=None):
    rng = rng or np.random.default_rng(0)
    out_dir.mkdir(parents=True, exist_ok=True)
    slices = []
    for i in range(n_slices):
        px = rng.integers(0, 2000, (rows, cols)).astype(np.uint16)
        slices.append(px)
        dcm.dcmwrite(
            out_dir / f"slice_{i:03d}.dcm",
            {
                "Modality": "CT",
                "PatientID": "P001",
                "PatientName": "Test^Patient",
                "PatientSex": "M",
                "InstanceNumber": n_slices - i,  # reversed to exercise sorting
                "ImagePositionPatient": [0.0, 0.0, float(n_slices - i) * 2.0],
                "ImageOrientationPatient": [1, 0, 0, 0, 1, 0],
                "PixelSpacing": [0.97, 0.97],
                "SliceThickness": 2.0,
                "RescaleSlope": 1.0,
                "RescaleIntercept": -1024.0,
                "Rows": rows,
                "Columns": cols,
                "BitsAllocated": 16,
                "PixelRepresentation": 0,
                "SamplesPerPixel": 1,
            },
            pixel_array=px,
        )
    return slices


class TestDicomCodec:
    def test_roundtrip(self, tmp_path):
        px = np.arange(64, dtype=np.uint16).reshape(8, 8)
        dcm.dcmwrite(
            tmp_path / "t.dcm",
            {
                "Modality": "CT",
                "PatientWeight": 70.5,
                "PixelSpacing": [1.5, 1.5],
                "Rows": 8,
                "Columns": 8,
                "BitsAllocated": 16,
                "PixelRepresentation": 0,
            },
            pixel_array=px,
        )
        ds = dcm.dcmread(tmp_path / "t.dcm")
        assert ds.Modality == "CT"
        assert ds.PatientWeight == pytest.approx(70.5)
        assert ds.PixelSpacing == [1.5, 1.5]
        np.testing.assert_array_equal(ds.pixel_array, px)

    def test_sequence_roundtrip(self, tmp_path):
        dcm.dcmwrite(
            tmp_path / "pet.dcm",
            {
                "Modality": "PT",
                "RadiopharmaceuticalInformationSequence": [
                    {
                        "RadionuclideTotalDose": 3.7e8,
                        "RadionuclideHalfLife": 6586.2,
                        "RadiopharmaceuticalStartTime": "083000",
                    }
                ],
                "Rows": 2,
                "Columns": 2,
                "BitsAllocated": 16,
            },
            pixel_array=np.zeros((2, 2), np.uint16),
        )
        ds = dcm.dcmread(tmp_path / "pet.dcm")
        seq = ds.RadiopharmaceuticalInformationSequence
        assert len(seq) == 1
        assert seq[0].RadionuclideTotalDose == pytest.approx(3.7e8)
        assert seq[0].RadiopharmaceuticalStartTime == "083000"


class TestDicomConverter:
    def test_ct_conversion(self, tmp_path):
        slices = _write_ct_series(tmp_path / "dicom")
        conv = DicomConverter(ConfigNode({}))
        out = conv.convert(tmp_path / "dicom", tmp_path / "out", modality="CT")
        vol, affine = load_nifti(out, return_affine=True)
        assert vol.shape == (8, 8, 4)
        # sorted by InstanceNumber (we wrote reversed) and rescaled
        np.testing.assert_allclose(
            vol[..., 0], slices[-1].astype(np.float32) - 1024.0, atol=0.1
        )
        # affine spacing
        assert np.linalg.norm(affine[:3, 0]) == pytest.approx(0.97, abs=1e-5)
        assert np.linalg.norm(affine[:3, 2]) == pytest.approx(2.0, abs=1e-5)
        meta = np.load(tmp_path / "out" / "ct_metadata.npy", allow_pickle=True).item()
        assert meta["patient_id"] == "P001"
        assert meta["modality"] == "CT"

    def test_pet_metadata(self, tmp_path):
        px = np.ones((4, 4), np.uint16)
        dcm.dcmwrite(
            tmp_path / "dicom" / "p0.dcm",
            {
                "Modality": "PT",
                "PatientWeight": 75.0,
                "PatientSize": 1.8,
                "PatientSex": "F",
                "InstanceNumber": 1,
                "AcquisitionTime": "093000",
                "SeriesTime": "093000",
                "Rows": 4,
                "Columns": 4,
                "BitsAllocated": 16,
                "RescaleSlope": 0.5,
                "RescaleIntercept": 0.0,
                "RadiopharmaceuticalInformationSequence": [
                    {
                        "RadionuclideTotalDose": 3.0e8,
                        "RadionuclideHalfLife": 6586.2,
                        "RadiopharmaceuticalStartTime": "083000",
                    }
                ],
            },
            pixel_array=px,
        )
        conv = DicomConverter()
        out = conv.convert(tmp_path / "dicom", tmp_path / "out", modality="PET")
        vol = load_nifti(out)
        np.testing.assert_allclose(vol, 0.5)  # slope applied
        meta = np.load(tmp_path / "out" / "pet_metadata.npy", allow_pickle=True).item()
        assert meta["pet_info"]["patient_weight"] == pytest.approx(75.0)
        assert meta["pet_info"]["radionuclide_total_dose"] == pytest.approx(3.0e8)

    def test_us_rgb_single_slice(self, tmp_path):
        rgb = np.stack([np.full((4, 4), v, np.uint8) for v in (30, 60, 90)], axis=-1)
        dcm.dcmwrite(
            tmp_path / "dicom" / "u0.dcm",
            {
                "Modality": "US",
                "InstanceNumber": 1,
                "Rows": 4,
                "Columns": 4,
                "BitsAllocated": 8,
                "SamplesPerPixel": 3,
            },
            pixel_array=rgb,
        )
        conv = DicomConverter()
        out = conv.convert(tmp_path / "dicom", tmp_path / "out", modality="US")
        vol = load_nifti(out)
        assert vol.shape == (4, 4, 1)  # depth axis added
        np.testing.assert_allclose(vol, 60.0)  # RGB mean

    def test_multiframe_enhanced_ct(self, tmp_path):
        """A multi-frame (enhanced-CT) golden file converts to a slice
        stack with rescale applied — the reference gets this via pydicom's
        [frames, rows, cols] pixel_array (dicom_converter.py:40-89)."""
        import shutil

        fix = Path(__file__).resolve().parent / "fixtures"
        d = tmp_path / "dicom"
        d.mkdir()
        shutil.copy(fix / "golden_multiframe_le.dcm", d / "vol.dcm")
        out = DicomConverter().convert(d, tmp_path / "out", modality="CT")
        vol = load_nifti(out)
        assert vol.shape == (2, 2, 3)
        r, c, k = np.meshgrid(
            np.arange(2), np.arange(2), np.arange(3), indexing="ij"
        )
        # voxel = slope·raw + intercept = 2·(100k + 10r + c) − 10
        np.testing.assert_allclose(vol, 2.0 * (100 * k + 10 * r + c) - 10.0)

    def test_multiframe_us_cine(self, tmp_path):
        """Multi-frame RGB US cine: RGB→gray mean, one slice per frame."""
        rgb = np.stack(
            [
                np.stack(
                    [np.full((4, 4), 10 * f + v, np.uint8) for v in (1, 2, 3)],
                    axis=-1,
                )
                for f in range(3)
            ]
        )  # [3, 4, 4, 3]
        dcm.dcmwrite(
            tmp_path / "dicom" / "cine.dcm",
            {
                "Modality": "US",
                "InstanceNumber": 1,
                "NumberOfFrames": 3,
                "Rows": 4,
                "Columns": 4,
                "BitsAllocated": 8,
                "SamplesPerPixel": 3,
            },
            pixel_array=rgb,
        )
        out = DicomConverter().convert(
            tmp_path / "dicom", tmp_path / "out", modality="US"
        )
        vol = load_nifti(out)
        assert vol.shape == (4, 4, 3)
        for f in range(3):
            np.testing.assert_allclose(vol[..., f], 10.0 * f + 2.0)

    def test_multiframe_color_ct_raises(self, tmp_path):
        """Unsupported combination (multi-frame COLOR data on a CT path)
        raises loudly instead of producing a garbage volume."""
        rgb = np.zeros((2, 4, 4, 3), np.uint8)
        dcm.dcmwrite(
            tmp_path / "dicom" / "bad.dcm",
            {
                "Modality": "CT",
                "InstanceNumber": 1,
                "NumberOfFrames": 2,
                "Rows": 4,
                "Columns": 4,
                "BitsAllocated": 8,
                "SamplesPerPixel": 3,
            },
            pixel_array=rgb,
        )
        with pytest.raises(ValueError, match="multi-frame color"):
            DicomConverter().convert(
                tmp_path / "dicom", tmp_path / "out", modality="CT"
            )


class TestSUV:
    def test_time_to_seconds(self):
        assert time_to_seconds("083000") == 8 * 3600 + 30 * 60
        assert time_to_seconds("083000.5") == 8 * 3600 + 30 * 60 + 0.5
        assert time_to_seconds("0830") == 8 * 3600 + 30 * 60  # padded

    def test_decay(self):
        # one half-life elapsed → factor 0.5
        assert decay_factor("080000", "094546.2", 6346.2) == pytest.approx(
            0.5, abs=1e-3
        )
        # day rollover
        assert decay_factor("233000", "003000", 3600.0) == pytest.approx(0.5, abs=1e-6)
        assert decay_factor(None, "080000", 100.0) == 1.0

    def test_bsa_dubois(self):
        # canonical: 70kg, 1.70m → ~1.81 m²
        assert bsa_dubois(70, 1.70) == pytest.approx(1.810, abs=0.005)

    def test_lbm_james(self):
        m = lbm_james(70, 175, "M")
        assert m == pytest.approx(1.10 * 70 - 128 * (70 / 175) ** 2)
        f = lbm_james(60, 165, "F")
        assert f == pytest.approx(1.07 * 60 - 148 * (60 / 165) ** 2)
        # floor at half body weight
        assert lbm_james(200, 100, "M") == 100.0

    def test_lbm_jan(self):
        bmi = 70 / (1.75**2)
        assert lbm_janmahasatian(70, 175, "M") == pytest.approx(
            9270 * 70 / (6680 + 216 * bmi)
        )

    def test_suv_factor_bw(self):
        assert suv_factor("bw", 1e8, 70) == pytest.approx(70 * 1000 / 1e8)

    def test_calculator_end_to_end(self, tmp_path):
        pet = np.full((4, 4, 2), 1000.0, np.float32)  # Bq/ml
        save_nifti(pet, tmp_path / "pet.nii.gz")
        metadata = {
            "patient_sex": "M",
            "pet_info": {
                "patient_weight": 70.0,
                "patient_size": 1.75,
                "radionuclide_total_dose": 3.7e8,
                "radionuclide_half_life": 6586.2,
                "radiopharmaceutical_start_time": "080000",
                "acquisition_time": "080000",
            },
        }
        np.save(tmp_path / "pet_metadata.npy", metadata)
        calc = SUVCalculator(ConfigNode({"analysis": {"suv": {"methods": ["bw", "bsa", "lbm_james", "lbm_jan"]}}}))
        results = calc.calculate(tmp_path / "pet.nii.gz", tmp_path / "suv")
        assert set(results) == {"bw", "bsa", "lbm_james", "lbm_jan"}
        suv_bw = load_nifti(results["bw"])
        np.testing.assert_allclose(suv_bw, 1000.0 * 70 * 1000 / 3.7e8, rtol=1e-5)
        stats = calc.get_suv_stats(results["bw"])
        assert stats["max"] == pytest.approx(float(suv_bw.max()))

    def test_calculator_requires_metadata(self, tmp_path):
        save_nifti(np.ones((2, 2, 2), np.float32), tmp_path / "pet.nii.gz")
        with pytest.raises(ValueError, match="metadata required"):
            SUVCalculator().calculate(tmp_path / "pet.nii.gz", tmp_path / "suv")


class TestNormalizerParity:
    def test_parity_vs_reference(self):
        """Load the reference normalizer module directly by path (its
        package __init__ needs pydicom, which isn't installed) with our
        nibabel shim installed."""
        import importlib.util

        from tests import nibabel_shim

        nibabel_shim.install()
        spec = importlib.util.spec_from_file_location(
            "ref_normalizer", "/root/reference/src/preprocessing/normalizer.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        RefNorm = mod.IntensityNormalizer

        rng = np.random.default_rng(0)
        img = rng.normal(100, 300, (8, 8, 8)).astype(np.float32)
        ours, ref = IntensityNormalizer(), RefNorm()
        np.testing.assert_allclose(
            ours.normalize_ct(img, -100, 700), ref.normalize_ct(img, -100, 700), atol=1e-6
        )
        pet = np.abs(img)
        np.testing.assert_allclose(
            ours.normalize_pet(pet, "percentile"), ref.normalize_pet(pet, "percentile"), atol=1e-6
        )
        np.testing.assert_allclose(
            ours.normalize_mri(img, "zscore"), ref.normalize_mri(img, "zscore"), atol=1e-5
        )
        np.testing.assert_allclose(
            ours.normalize_ultrasound(img), ref.normalize_ultrasound(img), atol=1e-6
        )

    def test_ct_windowing(self):
        n = IntensityNormalizer()
        img = np.array([-1000.0, -450.0, -100.0, 250.0, 1000.0], np.float32)
        out = n.normalize_ct(img, window_center=-100, window_width=700)
        np.testing.assert_allclose(out, [0, 0, 0.5, 1, 1], atol=1e-6)

    def test_dispatcher(self):
        n = IntensityNormalizer()
        img = np.random.default_rng(0).uniform(0, 10, (4, 4, 4)).astype(np.float32)
        for mod in ["CT", "PET", "MRI", "US", "XX"]:
            out = n.normalize(img, mod)
            assert out.dtype == np.float32


class TestRegistration:
    def test_translation_recovery(self):
        """A pure shift must be recovered to sub-voxel accuracy."""
        rng = np.random.default_rng(0)
        from scipy.ndimage import gaussian_filter, shift as nd_shift

        fixed = gaussian_filter(rng.normal(size=(24, 24, 24)), 3).astype(np.float32)
        true_shift = np.array([2.0, -1.5, 1.0])
        # moving[i] = fixed[i - s]  ⇒  warped[i] = moving[i + t] = fixed[i]
        # when t = s (registration maps fixed coords → moving coords)
        moving = nd_shift(fixed, true_shift, order=1)

        cfg = ConfigNode(
            {"data": {"registration": {"method": "translation",
                                        "metric": "mean_squares",
                                        "iterations": 300, "lr": 0.5,
                                        "shrink_factors": [2, 1],
                                        "smoothing_sigmas": [1, 0]}}}
        )
        reg = ImageRegistration(cfg)
        warped, transform = reg.register_arrays(fixed, moving)
        t = np.asarray(transform["params"]["t"])
        np.testing.assert_allclose(t, true_shift, atol=0.35)
        # central region error small
        c = (slice(4, -4),) * 3
        assert np.mean((warped[c] - fixed[c]) ** 2) < 0.05 * np.mean(fixed[c] ** 2)

    def test_mi_metric_translation(self):
        """MI metric with intensity-remapped moving image."""
        rng = np.random.default_rng(1)
        from scipy.ndimage import gaussian_filter, shift as nd_shift

        base = gaussian_filter(rng.normal(size=(20, 20, 20)), 2.5).astype(np.float32)
        moving_raw = (base * -2.0 + 5.0).astype(np.float32)  # different intensity map
        moving = nd_shift(moving_raw, [1.5, 0.0, 0.0], order=1)

        cfg = ConfigNode(
            {"data": {"registration": {"method": "translation",
                                        "metric": "mattes_mutual_information",
                                        "iterations": 120, "lr": 0.3,
                                        "shrink_factors": [1],
                                        "smoothing_sigmas": [0]}}}
        )
        reg = ImageRegistration(cfg)
        _, transform = reg.register_arrays(base, moving)
        t = np.asarray(transform["params"]["t"])
        assert abs(t[0] - 1.5) < 0.5
        assert abs(t[1]) < 0.5 and abs(t[2]) < 0.5

    def test_register_pair_files_and_apply(self, tmp_path):
        rng = np.random.default_rng(2)
        from scipy.ndimage import gaussian_filter, shift as nd_shift

        fixed = gaussian_filter(rng.normal(size=(16, 16, 16)), 2).astype(np.float32)
        moving = nd_shift(fixed, [1.0, 0, 0], order=1)
        aff = np.diag([1.5, 1.5, 2.0, 1.0])
        save_nifti(fixed, tmp_path / "fixed.nii.gz", affine=aff)
        save_nifti(moving, tmp_path / "moving.nii.gz", affine=aff)

        cfg = ConfigNode(
            {"data": {"registration": {"method": "translation",
                                        "metric": "mean_squares",
                                        "iterations": 80, "lr": 0.3,
                                        "shrink_factors": [1],
                                        "smoothing_sigmas": [0]}}}
        )
        reg = ImageRegistration(cfg)
        warped, transform = reg.register_pair(
            tmp_path / "fixed.nii.gz", tmp_path / "moving.nii.gz",
            tmp_path / "warped.nii.gz", tmp_path / "t.json",
        )
        assert (tmp_path / "warped.nii.gz").exists()
        assert (tmp_path / "t.json").exists()

        # apply saved transform reproduces the warp
        out = reg.apply_transform(
            tmp_path / "moving.nii.gz", tmp_path / "t.json", tmp_path / "applied.nii.gz"
        )
        applied = load_nifti(out)
        np.testing.assert_allclose(applied, warped, atol=1e-4)

    def test_apply_transform_nearest_for_labels(self, tmp_path):
        """interpolation="nearest" carries a LABEL map through a saved
        transform: an integer translation shifts labels exactly, with no
        invented fractional values (linear would blend at boundaries)."""
        import json

        labels = np.zeros((16, 16, 16), np.float32)
        labels[4:9, 5:10, 6:11] = 3.0
        labels[10:13, 2:5, 2:5] = 7.0
        save_nifti(labels, tmp_path / "labels.nii.gz")
        # hand-written transform: pure integer translation. transform_coords
        # maps OUTPUT voxel -> MOVING voxel as c + t, so t=[-2,0,0] shifts
        # content +2 along axis 0
        with open(tmp_path / "t.json", "w") as f:
            json.dump(
                {"method": "translation", "params": {"t": [-2.0, 0.0, 0.0]}}, f
            )

        reg = ImageRegistration()
        out = reg.apply_transform(
            tmp_path / "labels.nii.gz", tmp_path / "t.json",
            tmp_path / "warped_labels.nii.gz",
            interpolation="nearest", dtype=np.uint8,
        )
        warped = load_nifti(out, dtype=np.uint8)
        assert warped.dtype == np.uint8
        assert set(np.unique(warped).tolist()) <= {0, 3, 7}
        expected = np.zeros_like(labels)
        expected[6:11, 5:10, 6:11] = 3.0
        expected[12:15, 2:5, 2:5] = 7.0
        np.testing.assert_array_equal(warped, expected.astype(np.uint8))

        # the linear default on the same labels DOES blend (sanity contrast)
        out_lin = reg.apply_transform(
            tmp_path / "labels.nii.gz", tmp_path / "t.json",
            tmp_path / "warped_lin.nii.gz",
        )
        lin = load_nifti(out_lin)
        assert set(np.unique(lin).tolist()) <= {0.0, 3.0, 7.0}  # integer shift: still exact
        # fractional shift is where linear invents values
        with open(tmp_path / "t2.json", "w") as f:
            json.dump(
                {"method": "translation", "params": {"t": [-1.5, 0.0, 0.0]}}, f
            )
        out_frac = reg.apply_transform(
            tmp_path / "labels.nii.gz", tmp_path / "t2.json",
            tmp_path / "warped_frac.nii.gz",
        )
        frac_lin = load_nifti(out_frac)
        assert len(np.unique(frac_lin)) > 3  # blended values appear
        out_frac_nn = reg.apply_transform(
            tmp_path / "labels.nii.gz", tmp_path / "t2.json",
            tmp_path / "warped_frac_nn.nii.gz", interpolation="nearest",
        )
        frac_nn = load_nifti(out_frac_nn)
        assert set(np.unique(frac_nn).tolist()) <= {0.0, 3.0, 7.0}


class TestResample:
    def test_resample_spacing(self):
        from multimodal_organ_segmentation_tpu.preprocessing.resample import (
            resample_volume,
            spacing_from_affine,
        )

        rng = np.random.default_rng(0)
        data = rng.normal(size=(20, 20, 10)).astype(np.float32)
        affine = np.diag([1.0, 1.0, 4.0, 1.0])
        out, new_aff = resample_volume(data, affine, (2.0, 2.0, 2.0))
        assert out.shape == (10, 10, 20)
        np.testing.assert_allclose(spacing_from_affine(new_aff), [2.0, 2.0, 2.0])

    def test_resample_file_roundtrip(self, tmp_path):
        from multimodal_organ_segmentation_tpu.preprocessing.resample import (
            resample_file,
        )

        vol = np.random.default_rng(1).normal(size=(16, 16, 8)).astype(np.float32)
        save_nifti(vol, tmp_path / "v.nii.gz", affine=np.diag([1.5, 1.5, 3.0, 1.0]))
        out = resample_file(tmp_path / "v.nii.gz", tmp_path / "r.nii.gz", (1.5, 1.5, 1.5))
        data, aff = load_nifti(out, return_affine=True)
        assert data.shape == (16, 16, 16)

    def test_label_resample_nearest(self):
        from multimodal_organ_segmentation_tpu.preprocessing.resample import (
            resample_volume,
        )

        lbl = np.random.default_rng(2).integers(0, 4, (12, 12, 12)).astype(np.int32)
        out, _ = resample_volume(lbl, np.eye(4), (0.5, 0.5, 0.5), order=0)
        assert out.shape == (24, 24, 24)
        assert set(np.unique(out)) <= set(np.unique(lbl))


class TestBSplineFFD:
    """Cubic B-spline free-form deformation (SimpleITK BSplineTransform
    convention: mesh_size M cells → M+3 control points per axis)."""

    def test_partition_of_unity(self):
        """A constant control grid must produce that constant everywhere
        (cubic B-spline basis functions sum to 1)."""
        from multimodal_organ_segmentation_tpu.preprocessing.registration import (
            bspline_upsample,
        )

        import jax.numpy as jnp

        ctrl = jnp.full((7, 6, 5, 3), 2.5)
        field = bspline_upsample(ctrl, (16, 12, 9))
        np.testing.assert_allclose(np.asarray(field), 2.5, atol=1e-5)

    def test_matches_dense_basis_evaluation(self):
        """The separable matmul evaluation equals the direct Σ B_i B_j B_k
        tensor-product formula at every voxel."""
        from multimodal_organ_segmentation_tpu.preprocessing.registration import (
            _bspline_weights_1d,
            bspline_upsample,
        )

        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        ctrl = jnp.asarray(rng.normal(size=(6, 5, 7, 2)).astype(np.float32))
        shape = (11, 8, 13)
        got = np.asarray(bspline_upsample(ctrl, shape))

        ws = [np.asarray(_bspline_weights_1d(shape[a], ctrl.shape[a])) for a in range(3)]
        want = np.einsum("ha,wb,dg,abgc->hwdc", ws[0], ws[1], ws[2], np.asarray(ctrl))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_weights_rows_sum_to_one_and_are_local(self):
        from multimodal_organ_segmentation_tpu.preprocessing.registration import (
            _bspline_weights_1d,
        )

        w = np.asarray(_bspline_weights_1d(33, 9))
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
        # cubic support: at most 4 non-zero entries per row
        assert int((np.abs(w) > 1e-9).sum(axis=1).max()) <= 4
