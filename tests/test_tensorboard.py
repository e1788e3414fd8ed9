"""Dependency-free TensorBoard event writer (utils/tensorboard.py).

The reference declares tensorboard in requirements.txt:32 but never
imports it (SURVEY §5: "never imported — no SummaryWriter anywhere").
These tests prove our hand-encoded TFRecord/Event stream is the real
format: cross-checked BOTH directions against the official tensorboard
package (installed in this image), plus CRC vectors and corruption
detection.
"""

import math
import struct

import pytest

from multimodal_organ_segmentation_tpu.utils.tensorboard import (
    SummaryWriter,
    crc32c,
    read_scalar_events,
)


class TestCrc32c:
    def test_standard_vector(self):
        # the canonical Castagnoli check value
        assert crc32c(b"123456789") == 0xE3069283

    def test_empty(self):
        assert crc32c(b"") == 0


class TestRoundTrip:
    def test_write_read_scalars(self, tmp_path):
        with SummaryWriter(tmp_path) as w:
            for step in range(1, 4):
                w.add_scalar("loss/train", 1.0 / step, step)
            w.add_scalar("lr", 3e-4, 1)
        events = read_scalar_events(w.path)
        assert [s for s, _ in events["loss/train"]] == [1, 2, 3]
        assert events["loss/train"][2][1] == pytest.approx(1 / 3, rel=1e-6)
        assert events["lr"][0][1] == pytest.approx(3e-4, rel=1e-6)

    def test_nonfinite_skipped(self, tmp_path):
        with SummaryWriter(tmp_path) as w:
            w.add_scalar("x", float("nan"), 1)
            w.add_scalar("x", float("inf"), 2)
            w.add_scalar("x", 5.0, 3)
        events = read_scalar_events(w.path)
        assert events["x"] == [(3, 5.0)]

    def test_corruption_detected(self, tmp_path):
        with SummaryWriter(tmp_path) as w:
            w.add_scalar("x", 1.0, 1)
        raw = bytearray(w.path.read_bytes())
        raw[-6] ^= 0xFF  # flip a payload byte of the last record
        w.path.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="CRC"):
            read_scalar_events(w.path)

    def test_truncation_raises_valueerror(self, tmp_path):
        # a writer killed mid-record must surface as the documented
        # ValueError, not struct.error (which is not a ValueError subclass)
        with SummaryWriter(tmp_path) as w:
            w.add_scalar("x", 1.0, 1)
            w.add_scalar("x", 2.0, 2)
        raw = w.path.read_bytes()
        for cut in (len(raw) - 3, len(raw) - 9, len(raw) - 15):
            w.path.write_bytes(raw[:cut])
            with pytest.raises(ValueError, match="truncated|CRC"):
                read_scalar_events(w.path)

    def test_two_writers_same_second_get_distinct_files(self, tmp_path):
        # back-to-back Trainers in one process (sweeps, tests) must not
        # append into one file and duplicate steps
        w1 = SummaryWriter(tmp_path)
        w2 = SummaryWriter(tmp_path)
        w1.add_scalar("x", 1.0, 1)
        w2.add_scalar("x", 9.0, 1)
        w1.close()
        w2.close()
        assert w1.path != w2.path
        assert read_scalar_events(w1.path)["x"] == [(1, 1.0)]
        assert read_scalar_events(w2.path)["x"] == [(1, 9.0)]


class TestOfficialParity:
    """Cross-check against the real tensorboard package, both directions."""

    def test_official_reader_parses_our_file(self, tmp_path):
        # the writer exists precisely so tensorboard is NOT required on the
        # host — skip, don't fail, where the package is absent
        pytest.importorskip("tensorboard")
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        with SummaryWriter(tmp_path) as w:
            for step in range(5):
                w.add_scalar("metrics/val_dice", 0.1 * step, step)
                w.add_scalar("loss/val", math.exp(-step), step)

        acc = EventAccumulator(str(tmp_path))
        acc.Reload()
        tags = acc.Tags()["scalars"]
        assert set(tags) == {"metrics/val_dice", "loss/val"}
        dice = acc.Scalars("metrics/val_dice")
        assert [e.step for e in dice] == list(range(5))
        assert dice[3].value == pytest.approx(0.3, rel=1e-6)

    def test_our_reader_parses_torch_file(self, tmp_path):
        torch_tb = pytest.importorskip("torch.utils.tensorboard")

        w = torch_tb.SummaryWriter(log_dir=str(tmp_path))
        for step in range(3):
            w.add_scalar("a/b", float(step) * 2.5, step)
        w.close()
        (event_file,) = [
            p for p in tmp_path.iterdir() if "tfevents" in p.name
        ]
        events = read_scalar_events(event_file)
        assert [v for _, v in events["a/b"]] == pytest.approx([0.0, 2.5, 5.0])


class TestFraming:
    def test_first_record_is_file_version(self, tmp_path):
        with SummaryWriter(tmp_path) as w:
            w.add_scalar("x", 1.0, 1)
        data = w.path.read_bytes()
        (length,) = struct.unpack("<Q", data[:8])
        payload = data[12 : 12 + length]
        assert b"brain.Event:2" in payload
