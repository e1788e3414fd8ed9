#!/usr/bin/env python3
"""Generate the golden codec fixtures IN THIS DIRECTORY — from the specs,
never through the repo codecs.

Every byte below is laid out by hand with ``struct`` following the
published formats, so the blobs are an independent witness against
``utils/nifti.py`` and ``preprocessing/dicom.py`` (whose self-roundtrip
tests could hide a shared reader==writer misunderstanding):

- NIfTI-1: the ``nifti1.h`` field table (348-byte header; analyze-75
  lineage offsets), quaternion method-2 affine, scl_slope/inter, magic.
- DICOM PS3.10 (file meta: always explicit VR LE) + PS3.5 (implicit &
  explicit VR data elements, defined/undefined-length sequences, UN/OB
  long-form headers, even-length padding: NUL for UI, space for strings).

Deterministic output — re-running must reproduce the checked-in blobs
byte for byte (verified by test_codec_golden.py::test_fixture_bytes_stable).
"""

import gzip
import struct
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent


# ---------------------------------------------------------------------------
# NIfTI-1
# ---------------------------------------------------------------------------

def nifti_be_qform() -> bytes:
    """Big-endian header; qform-only affine (sform_code=0) with the
    b=c=d=0.5 quaternion (a=0.5 → pure axis-permutation rotation), qfac=-1,
    scl_slope=2.5 / scl_inter=-1, int16 2×3×4 data.

    Expected (computed by hand from the spec's method-2 formula):
      R(0.5,0.5,0.5) = [[0,0,1],[1,0,0],[0,1,0]]
      affine = R @ diag(1.5, 2.0, qfac*2.5) + offsets (-10,20,30)
             = [[0,0,-2.5,-10],[1.5,0,0,20],[0,2,0,30],[0,0,0,1]]
    """
    e = ">"  # big endian
    hdr = bytearray(348)
    struct.pack_into(e + "i", hdr, 0, 348)           # sizeof_hdr
    struct.pack_into(e + "8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)  # dim
    struct.pack_into(e + "h", hdr, 70, 4)            # datatype: DT_INT16
    struct.pack_into(e + "h", hdr, 72, 16)           # bitpix
    # pixdim[0] = qfac = -1
    struct.pack_into(e + "8f", hdr, 76, -1.0, 1.5, 2.0, 2.5, 1, 1, 1, 1)
    struct.pack_into(e + "f", hdr, 108, 352.0)       # vox_offset
    struct.pack_into(e + "f", hdr, 112, 2.5)         # scl_slope
    struct.pack_into(e + "f", hdr, 116, -1.0)        # scl_inter
    struct.pack_into(e + "h", hdr, 252, 1)           # qform_code
    struct.pack_into(e + "h", hdr, 254, 0)           # sform_code
    # quatern_b,c,d + qoffset_x,y,z
    struct.pack_into(e + "6f", hdr, 256, 0.5, 0.5, 0.5, -10.0, 20.0, 30.0)
    hdr[344:348] = b"n+1\x00"

    # voxel (i,j,k) = i + 2j + 6k, Fortran order → plain arange on disk
    data = np.arange(24, dtype=">i2").tobytes()
    return bytes(hdr) + b"\x00" * 4 + data


def nifti_le_ext_sform() -> bytes:
    """Little-endian single .nii with a 16-byte header extension
    (vox_offset=368), sform affine (code 2) that must take precedence over
    a deliberately DIFFERENT qform, scl_slope=0 (spec: ignore scaling),
    float32 3×2×2 data."""
    e = "<"
    hdr = bytearray(348)
    struct.pack_into(e + "i", hdr, 0, 348)
    struct.pack_into(e + "8h", hdr, 40, 3, 3, 2, 2, 1, 1, 1, 1)
    struct.pack_into(e + "h", hdr, 70, 16)           # DT_FLOAT32
    struct.pack_into(e + "h", hdr, 72, 32)
    struct.pack_into(e + "8f", hdr, 76, 1.0, 1.0, 2.0, 3.0, 1, 1, 1, 1)
    struct.pack_into(e + "f", hdr, 108, 368.0)       # vox_offset past ext
    struct.pack_into(e + "f", hdr, 112, 0.0)         # scl_slope 0 → no scale
    struct.pack_into(e + "f", hdr, 116, 99.0)        # inter must be ignored
    struct.pack_into(e + "h", hdr, 252, 1)           # qform present but...
    struct.pack_into(e + "h", hdr, 254, 2)           # ...sform wins
    struct.pack_into(e + "6f", hdr, 256, 0.5, 0.5, 0.5, 1.0, 2.0, 3.0)
    struct.pack_into(e + "4f", hdr, 280, 1.0, 0.0, 0.0, 5.0)   # srow_x
    struct.pack_into(e + "4f", hdr, 296, 0.0, 2.0, 0.0, -7.0)  # srow_y
    struct.pack_into(e + "4f", hdr, 312, 0.0, 0.0, 3.0, 9.0)   # srow_z
    hdr[344:348] = b"n+1\x00"

    ext_flag = b"\x01\x00\x00\x00"                   # extension present
    # one extension block: esize=16, ecode=0 (unknown/private), 8 payload
    ext = struct.pack(e + "ii", 16, 0) + b"GOLDPAD!"
    vals = (np.arange(12, dtype="<f4") * 0.5 - 2.0)  # -2.0, -1.5, ... 3.5
    return bytes(hdr) + ext_flag + ext + vals.tobytes()


# ---------------------------------------------------------------------------
# DICOM
# ---------------------------------------------------------------------------

def _el_explicit(group, elem, vr, data: bytes) -> bytes:
    head = struct.pack("<HH", group, elem)
    if vr in ("OB", "OW", "OF", "SQ", "UT", "UN"):
        return head + vr.encode() + b"\x00\x00" + struct.pack("<I", len(data)) + data
    return head + vr.encode() + struct.pack("<H", len(data)) + data


def _el_implicit(group, elem, data: bytes) -> bytes:
    return struct.pack("<HHI", group, elem, len(data)) + data


def _meta(ts_uid: str) -> bytes:
    """PS3.10 file meta information group (always explicit VR LE)."""
    uid = ts_uid.encode()
    if len(uid) % 2:
        uid += b"\x00"                               # UI pads with NUL
    body = _el_explicit(0x0002, 0x0010, "UI", uid)
    return (
        b"\x00" * 128 + b"DICM"
        + _el_explicit(0x0002, 0x0000, "UL", struct.pack("<I", len(body)))
        + body
    )


def dicom_implicit_le() -> bytes:
    """Implicit-VR-LE dataset: multi-valued DS, odd-length values padded
    per spec (space for DS/IS), signed int16 pixels."""
    out = _meta("1.2.840.10008.1.2")
    out += _el_implicit(0x0008, 0x0060, b"CT")
    out += _el_implicit(0x0020, 0x0013, b"7 ")               # IS, odd→pad
    out += _el_implicit(0x0020, 0x0032, b"-100\\200\\-50")   # DS ×3 (12B)
    out += _el_implicit(0x0028, 0x0010, struct.pack("<H", 2))  # Rows
    out += _el_implicit(0x0028, 0x0011, struct.pack("<H", 3))  # Columns
    out += _el_implicit(0x0028, 0x0030, b"1.5\\2.5 ")        # DS, odd→pad
    out += _el_implicit(0x0028, 0x0100, struct.pack("<H", 16))  # BitsAlloc
    out += _el_implicit(0x0028, 0x0103, struct.pack("<H", 1))   # signed
    out += _el_implicit(0x0028, 0x1052, b"-1024 ")           # intercept
    out += _el_implicit(0x0028, 0x1053, b"2 ")               # slope
    pix = np.array([-3, -2, -1, 0, 1, 2], dtype="<i2").tobytes()
    out += _el_implicit(0x7FE0, 0x0010, pix)
    return out


def dicom_explicit_le() -> bytes:
    """Explicit-VR-LE dataset exercising the headers implicit files can't:
    UN and OB long-form (2 reserved bytes + 4-byte length), an unknown
    private element the reader must skip, and an undefined-length SQ with
    a defined-length item + sequence delimitation item."""
    out = _meta("1.2.840.10008.1.2.1")
    out += _el_explicit(0x0008, 0x0060, "CS", b"PT")
    # unknown private creator element: UN, long form, odd payload padded
    out += _el_explicit(0x0009, 0x0010, "UN", b"ACME 1")
    # unknown private OB blob (even 4 bytes) — also must be skipped
    out += _el_explicit(0x0009, 0x1001, "OB", b"\xde\xad\xbe\xef")
    out += _el_explicit(0x0010, 0x0010, "PN", b"DOE^J ")     # odd→space pad
    out += _el_explicit(0x0010, 0x1030, "DS", b"70.5")
    # RadiopharmaceuticalInformationSequence: UNDEFINED length SQ
    item_body = (
        _el_explicit(0x0018, 0x1072, "TM", b"081500")
        + _el_explicit(0x0018, 0x1074, "DS", b"3.7e8 ")
    )
    seq = (
        struct.pack("<HHI", 0xFFFE, 0xE000, len(item_body)) + item_body
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    out += _el_explicit(0x0054, 0x0016, "SQ", b"")[:8]  # header only...
    # ...rewrite with undefined length: group,elem,VR,reserved,len=FFFFFFFF
    out = out[:-8]
    out += (
        struct.pack("<HH", 0x0054, 0x0016) + b"SQ\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF) + seq
    )
    out += _el_explicit(0x0028, 0x0010, "US", struct.pack("<H", 2))
    out += _el_explicit(0x0028, 0x0011, "US", struct.pack("<H", 2))
    out += _el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16))
    out += _el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 0))
    pix = np.array([10, 20, 30, 40], dtype="<u2").tobytes()
    out += _el_explicit(0x7FE0, 0x0010, "OW", pix)
    return out


def dicom_multiframe_le() -> bytes:
    """Explicit-VR-LE enhanced-CT-style multi-frame file: NumberOfFrames=3
    (0028,0008), 2×2 uint16 planes concatenated frame-major in PixelData
    (PS3.5 §8.2), rescale slope 2 / intercept -10.

    Frame k voxel (r,c) = 100·k + 10·r + c, so the decoded stack and the
    converter's rescaled volume are hand-computable."""
    out = _meta("1.2.840.10008.1.2.1")
    out += _el_explicit(0x0008, 0x0060, "CS", b"CT")
    out += _el_explicit(0x0020, 0x0013, "IS", b"1 ")
    out += _el_explicit(0x0028, 0x0008, "IS", b"3 ")          # NumberOfFrames
    out += _el_explicit(0x0028, 0x0010, "US", struct.pack("<H", 2))
    out += _el_explicit(0x0028, 0x0011, "US", struct.pack("<H", 2))
    out += _el_explicit(0x0028, 0x0030, "DS", b"1\\1 ")
    out += _el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16))
    out += _el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 0))
    out += _el_explicit(0x0028, 0x1052, "DS", b"-10 ")
    out += _el_explicit(0x0028, 0x1053, "DS", b"2 ")
    pix = np.array(
        [100 * k + 10 * r + c
         for k in range(3) for r in range(2) for c in range(2)],
        dtype="<u2",
    ).tobytes()
    out += _el_explicit(0x7FE0, 0x0010, "OW", pix)
    return out


def main():
    (HERE / "golden_be_qform.nii.gz").write_bytes(
        # mtime=0 + fixed filename field → deterministic gzip bytes
        gzip.compress(nifti_be_qform(), mtime=0)
    )
    (HERE / "golden_le_ext_sform.nii").write_bytes(nifti_le_ext_sform())
    (HERE / "golden_implicit_le.dcm").write_bytes(dicom_implicit_le())
    (HERE / "golden_explicit_le.dcm").write_bytes(dicom_explicit_le())
    (HERE / "golden_multiframe_le.dcm").write_bytes(dicom_multiframe_le())
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
