"""Independent golden fixtures for the file codecs (VERDICT r3 #4).

The reference inherits spec compliance from nibabel/pydicom
(/root/reference/src/utils/io.py:54-109,
/root/reference/src/preprocessing/dicom_converter.py:40-89); our own codecs
were previously tested only by self-roundtrip — a shared reader==writer
misunderstanding of the spec would never surface. These tests break that
circularity from both directions:

- READ: byte-exact blobs in ``tests/fixtures/`` built by hand from the
  NIfTI-1 / DICOM PS3.5+PS3.10 specs (``make_golden.py`` — struct.pack
  only, never the repo codecs) must decode to hand-derived field values.
- WRITE: our writers' output is re-parsed here with raw ``struct`` reads
  at spec-mandated offsets — expectations come from the spec text, not
  from feeding the bytes back through our readers.
"""

import gzip
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from multimodal_organ_segmentation_tpu.preprocessing import dicom as dcm
from multimodal_organ_segmentation_tpu.utils import nifti

FIX = Path(__file__).resolve().parent / "fixtures"


class TestNiftiGoldenRead:
    def test_big_endian_qform_scaled(self):
        img = nifti.load(FIX / "golden_be_qform.nii.gz")
        assert np.asarray(img.dataobj).shape == (2, 3, 4)
        # voxel (i,j,k) = i + 2j + 6k (written as arange in F-order)
        i, j, k = np.meshgrid(*[np.arange(s) for s in (2, 3, 4)], indexing="ij")
        np.testing.assert_array_equal(np.asarray(img.dataobj), i + 2 * j + 6 * k)
        # method-2 affine computed by hand: R(b=c=d=0.5) is the cyclic
        # permutation [[0,0,1],[1,0,0],[0,1,0]]; qfac=-1 flips the z zoom
        want = np.array(
            [
                [0.0, 0.0, -2.5, -10.0],
                [1.5, 0.0, 0.0, 20.0],
                [0.0, 2.0, 0.0, 30.0],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        np.testing.assert_allclose(img.affine, want, atol=1e-6)
        assert img.header.get_zooms() == (1.5, 2.0, 2.5)
        # scl_slope/inter applied by get_fdata: raw*2.5 - 1
        np.testing.assert_allclose(
            img.get_fdata(), (i + 2 * j + 6 * k) * 2.5 - 1.0, atol=1e-6
        )

    def test_le_extension_sform_precedence(self):
        img = nifti.load(FIX / "golden_le_ext_sform.nii")
        assert np.asarray(img.dataobj).shape == (3, 2, 2)
        # vox_offset=368 skips the 16-byte header extension
        want_vals = (np.arange(12, dtype=np.float32) * 0.5 - 2.0).reshape(
            (3, 2, 2), order="F"
        )
        np.testing.assert_allclose(np.asarray(img.dataobj), want_vals)
        # sform_code=2 wins over the (deliberately different) qform
        want_aff = np.array(
            [
                [1.0, 0.0, 0.0, 5.0],
                [0.0, 2.0, 0.0, -7.0],
                [0.0, 0.0, 3.0, 9.0],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        np.testing.assert_allclose(img.affine, want_aff, atol=1e-6)
        # scl_slope == 0 → spec says ignore scaling entirely
        np.testing.assert_allclose(img.get_fdata(), want_vals, atol=1e-6)


class TestNiftiWriterSpec:
    """Re-parse save() output with raw struct reads at nifti1.h offsets."""

    def test_written_header_fields(self, tmp_path):
        data = np.arange(30, dtype=np.float32).reshape(2, 3, 5) * 0.25
        affine = np.array(
            [
                [0.0, -1.5, 0.0, 12.0],
                [2.0, 0.0, 0.0, -8.0],
                [0.0, 0.0, 3.0, 40.0],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        path = tmp_path / "w.nii.gz"
        nifti.save(data, path, affine=affine)
        raw = gzip.decompress(path.read_bytes())

        assert struct.unpack_from("<i", raw, 0)[0] == 348      # sizeof_hdr
        assert raw[344:348] == b"n+1\x00"                      # single-file
        dim = struct.unpack_from("<8h", raw, 40)
        assert dim[:4] == (3, 2, 3, 5)
        assert struct.unpack_from("<h", raw, 70)[0] == 16      # DT_FLOAT32
        assert struct.unpack_from("<h", raw, 72)[0] == 32      # bitpix
        vox_offset = struct.unpack_from("<f", raw, 108)[0]
        assert vox_offset == 352.0
        # spec: pixdim zooms are the affine column norms
        pixdim = struct.unpack_from("<8f", raw, 76)
        np.testing.assert_allclose(pixdim[1:4], [2.0, 1.5, 3.0], atol=1e-6)
        assert struct.unpack_from("<h", raw, 254)[0] >= 1      # sform valid
        srow = np.array(
            [
                struct.unpack_from("<4f", raw, 280),
                struct.unpack_from("<4f", raw, 296),
                struct.unpack_from("<4f", raw, 312),
            ]
        )
        np.testing.assert_allclose(srow, affine[:3], atol=1e-6)
        # data: float32, Fortran order, immediately at vox_offset
        body = np.frombuffer(raw, dtype="<f4", count=30, offset=352)
        np.testing.assert_allclose(
            body, np.asfortranarray(data).ravel(order="F")
        )


class TestDicomGoldenRead:
    def test_implicit_vr_le(self):
        ds = dcm.dcmread(FIX / "golden_implicit_le.dcm")
        assert ds.Modality == "CT"
        assert ds.InstanceNumber == 7
        assert ds.ImagePositionPatient == [-100.0, 200.0, -50.0]
        assert ds.Rows == 2 and ds.Columns == 3
        assert ds.PixelSpacing == [1.5, 2.5]
        assert ds.BitsAllocated == 16 and ds.PixelRepresentation == 1
        assert ds.RescaleIntercept == -1024.0 and ds.RescaleSlope == 2.0
        arr = ds.pixel_array
        assert arr.dtype == np.int16
        np.testing.assert_array_equal(arr, [[-3, -2, -1], [0, 1, 2]])

    def test_explicit_vr_le_un_ob_seq(self):
        ds = dcm.dcmread(FIX / "golden_explicit_le.dcm")
        # private UN/OB elements are skipped without derailing the parse
        assert ds.Modality == "PT"
        assert ds.PatientName == "DOE^J"
        assert ds.PatientWeight == 70.5
        seq = ds.RadiopharmaceuticalInformationSequence
        assert len(seq) == 1
        assert seq[0].RadiopharmaceuticalStartTime == "081500"
        assert seq[0].RadionuclideTotalDose == 3.7e8
        assert ds.Rows == 2 and ds.Columns == 2
        arr = ds.pixel_array
        assert arr.dtype == np.uint16
        np.testing.assert_array_equal(arr, [[10, 20], [30, 40]])

    def test_multiframe_le(self):
        """Enhanced-CT-style multi-frame file: pixel_array honors
        NumberOfFrames (0028,0008) and returns [frames, rows, cols] —
        frame k voxel (r,c) = 100k + 10r + c by construction."""
        ds = dcm.dcmread(FIX / "golden_multiframe_le.dcm")
        assert ds.NumberOfFrames == 3
        assert ds.Rows == 2 and ds.Columns == 2
        arr = ds.pixel_array
        assert arr.shape == (3, 2, 2)
        assert arr.dtype == np.uint16
        k, r, c = np.meshgrid(
            np.arange(3), np.arange(2), np.arange(2), indexing="ij"
        )
        np.testing.assert_array_equal(arr, 100 * k + 10 * r + c)

    def test_short_pixeldata_raises(self, tmp_path):
        """A PixelData shorter than frames·rows·cols must raise, never
        silently truncate (the pre-r5 codec returned frame 0 only)."""
        raw = bytearray((FIX / "golden_multiframe_le.dcm").read_bytes())
        # locate the OW PixelData element and shrink its declared length
        # to one frame while also dropping the trailing bytes
        idx = raw.find(struct.pack("<HH", 0x7FE0, 0x0010))
        assert idx > 0
        struct.pack_into("<I", raw, idx + 8, 8)  # 1 frame = 8 bytes
        p = tmp_path / "short.dcm"
        p.write_bytes(bytes(raw[: idx + 12 + 8]))
        ds = dcm.dcmread(p)
        with pytest.raises(ValueError, match="PixelData"):
            ds.pixel_array


class TestDicomWriterSpec:
    """Re-parse dcmwrite() output with raw struct reads per PS3.10/PS3.5."""

    def test_written_stream_structure(self, tmp_path):
        path = tmp_path / "w.dcm"
        dcm.dcmwrite(
            path,
            {
                "Modality": "CT",
                "Rows": 2,
                "Columns": 2,
                "PixelSpacing": [1.25, 1.75],
                "PatientName": "DOE^J",  # odd value → must be padded
                "BitsAllocated": 16,
                "PixelRepresentation": 0,
            },
            pixel_array=np.array([[1, 2], [3, 4]], dtype=np.uint16),
        )
        raw = path.read_bytes()
        assert raw[:128] == b"\x00" * 128 and raw[128:132] == b"DICM"

        # file meta: (0002,0000) UL group length, then (0002,0010) UI
        assert struct.unpack_from("<HH", raw, 132) == (0x0002, 0x0000)
        assert raw[136:138] == b"UL"
        assert struct.unpack_from("<H", raw, 138)[0] == 4
        glen = struct.unpack_from("<I", raw, 140)[0]
        meta_end = 144 + glen
        assert struct.unpack_from("<HH", raw, 144) == (0x0002, 0x0010)
        assert raw[148:150] == b"UI"
        ulen = struct.unpack_from("<H", raw, 150)[0]
        ts = raw[152 : 152 + ulen]
        assert ts.rstrip(b"\x00") == b"1.2.840.10008.1.2.1"  # explicit LE
        assert ulen % 2 == 0

        # walk the dataset: tags ascending, lengths even, headers explicit
        offset = meta_end
        seen = []
        while offset < len(raw):
            group, elem = struct.unpack_from("<HH", raw, offset)
            vr = raw[offset + 4 : offset + 6].decode()
            assert vr.isalpha() and vr.isupper()
            if vr in ("OB", "OW", "OF", "SQ", "UT", "UN"):
                assert raw[offset + 6 : offset + 8] == b"\x00\x00"
                length = struct.unpack_from("<I", raw, offset + 8)[0]
                offset += 12
            else:
                length = struct.unpack_from("<H", raw, offset + 6)[0]
                offset += 8
            assert length % 2 == 0, f"odd length for {(group, elem)}"
            seen.append(((group, elem), vr, raw[offset : offset + length]))
            offset += length
        assert offset == len(raw)
        tags = [t for t, _, _ in seen]
        assert tags == sorted(tags)

        by_tag = {t: (vr, val) for t, vr, val in seen}
        assert by_tag[(0x0008, 0x0060)] == ("CS", b"CT")
        assert by_tag[(0x0010, 0x0010)][1] == b"DOE^J "       # padded even
        assert struct.unpack("<H", by_tag[(0x0028, 0x0010)][1])[0] == 2
        # 9-byte value → spec-mandated space pad to even length
        assert by_tag[(0x0028, 0x0030)][1] == b"1.25\\1.75 "
        vr, pix = by_tag[(0x7FE0, 0x0010)]
        assert vr == "OW"
        np.testing.assert_array_equal(
            np.frombuffer(pix, "<u2"), [1, 2, 3, 4]
        )


def test_fixture_bytes_stable():
    """make_golden.py is deterministic and reproduces the checked-in blobs
    byte for byte — the fixtures and their generator can't drift apart."""
    import tempfile

    src = (FIX / "make_golden.py").read_text()
    with tempfile.TemporaryDirectory() as td:
        gen = Path(td) / "make_golden.py"
        gen.write_text(src)
        subprocess.run([sys.executable, str(gen)], check=True,
                       capture_output=True)
        for name in (
            "golden_be_qform.nii.gz",
            "golden_le_ext_sform.nii",
            "golden_implicit_le.dcm",
            "golden_explicit_le.dcm",
            "golden_multiframe_le.dcm",
        ):
            assert (Path(td) / name).read_bytes() == (FIX / name).read_bytes(), name
