"""Adversarial-input hardening for the file codecs (VERDICT r4 #7).

Byte-level mutations of the spec-built golden fixtures must each raise a
clean ValueError — never a silently short, truncated, or garbage array.
The reference inherits this robustness from nibabel/pydicom
(/root/reference/src/utils/io.py:54-109,
/root/reference/src/preprocessing/dicom_converter.py:40-89); our own
codecs must provide it themselves.
"""

import gzip
import struct
from pathlib import Path

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.preprocessing import dicom as dcm
from multimodal_organ_segmentation_tpu.utils import nifti

FIX = Path(__file__).resolve().parent / "fixtures"


def _nii_base() -> bytearray:
    return bytearray((FIX / "golden_le_ext_sform.nii").read_bytes())


def _mut_truncated_header(raw):
    return raw[:100]


def _mut_bad_sizeof_hdr(raw):
    struct.pack_into("<i", raw, 0, 999)
    return raw


def _mut_bad_magic(raw):
    raw[344:348] = b"XYZ\x00"
    return raw


def _mut_dim0_too_big(raw):
    struct.pack_into("<h", raw, 40, 9)
    return raw


def _mut_dim0_zero(raw):
    struct.pack_into("<h", raw, 40, 0)
    return raw


def _mut_zero_dim(raw):
    struct.pack_into("<h", raw, 42, 0)  # dim[1] = 0
    return raw


def _mut_negative_dim(raw):
    struct.pack_into("<h", raw, 44, -2)  # dim[2] = -2
    return raw


def _mut_zero_pixdim(raw):
    struct.pack_into("<f", raw, 80, 0.0)  # pixdim[1] = 0
    return raw


def _mut_negative_pixdim(raw):
    struct.pack_into("<f", raw, 84, -2.0)  # pixdim[2] < 0
    return raw


def _mut_truncated_payload(raw):
    return raw[:-20]  # drop the last 5 float32 voxels


def _mut_absurd_dims(raw):
    struct.pack_into("<h", raw, 42, 30000)  # dim[1] huge vs tiny payload
    return raw


def _mut_bad_datatype(raw):
    struct.pack_into("<h", raw, 70, 128)  # DT_RGB24: unsupported
    return raw


NIFTI_MUTATIONS = [
    _mut_truncated_header,
    _mut_bad_sizeof_hdr,
    _mut_bad_magic,
    _mut_dim0_too_big,
    _mut_dim0_zero,
    _mut_zero_dim,
    _mut_negative_dim,
    _mut_zero_pixdim,
    _mut_negative_pixdim,
    _mut_truncated_payload,
    _mut_absurd_dims,
    _mut_bad_datatype,
]


class TestNiftiAdversarial:
    @pytest.mark.parametrize(
        "mutate", NIFTI_MUTATIONS, ids=lambda f: f.__name__[5:]
    )
    def test_mutation_raises(self, tmp_path, mutate):
        p = tmp_path / "bad.nii"
        p.write_bytes(bytes(mutate(_nii_base())))
        with pytest.raises(ValueError):
            nifti.load(p)

    def test_corrupt_gzip_raises(self, tmp_path):
        p = tmp_path / "bad.nii.gz"
        p.write_bytes(b"\x1f\x8b" + b"\x99" * 64)  # gzip magic, junk body
        with pytest.raises(ValueError):
            nifti.load(p)

    def test_not_gzip_at_all_raises(self, tmp_path):
        p = tmp_path / "bad.nii.gz"
        p.write_bytes(b"plainly not gzip data")
        with pytest.raises(ValueError):
            nifti.load(p)

    def test_golden_still_loads(self):
        # the hardening must not reject the well-formed fixtures
        assert nifti.load(FIX / "golden_le_ext_sform.nii").dataobj.shape == (
            3, 2, 2,
        )
        assert nifti.load(FIX / "golden_be_qform.nii.gz").dataobj.shape == (
            2, 3, 4,
        )


def _dcm_base(name="golden_explicit_le.dcm") -> bytearray:
    return bytearray((FIX / name).read_bytes())


class TestDicomAdversarial:
    def _expect_raises(self, tmp_path, blob):
        p = tmp_path / "bad.dcm"
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError):
            ds = dcm.dcmread(p)
            ds.pixel_array  # reading may defer pixel validation

    def test_truncated_mid_element(self, tmp_path):
        self._expect_raises(tmp_path, _dcm_base()[:-9])

    def test_element_overruns_eof(self, tmp_path):
        raw = _dcm_base()
        idx = raw.find(struct.pack("<HH", 0x7FE0, 0x0010))
        assert idx > 0
        struct.pack_into("<I", raw, idx + 8, 10_000)  # length >> file
        self._expect_raises(tmp_path, raw)

    def test_trailing_partial_element(self, tmp_path):
        self._expect_raises(tmp_path, _dcm_base() + b"\x08\x00\x60")

    def test_not_dicom_at_all(self, tmp_path):
        self._expect_raises(tmp_path, b"\x93garbage" * 40)

    def test_big_endian_ts_clean_error(self, tmp_path):
        """Retired big-endian explicit VR is rejected loudly (documented
        out of scope) rather than byte-swap-misread."""
        raw = _dcm_base()
        i = raw.find(b"1.2.840.10008.1.2.1")
        assert i > 0
        raw[i : i + 19] = b"1.2.840.10008.1.2.2"
        p = tmp_path / "be.dcm"
        p.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="transfer syntax"):
            dcm.dcmread(p)

    def test_implicit_truncated_pixeldata(self, tmp_path):
        raw = _dcm_base("golden_implicit_le.dcm")
        self._expect_raises(tmp_path, raw[:-4])

    def test_goldens_still_load(self):
        for name in (
            "golden_implicit_le.dcm",
            "golden_explicit_le.dcm",
            "golden_multiframe_le.dcm",
        ):
            ds = dcm.dcmread(FIX / name)
            assert ds.pixel_array.size > 0
