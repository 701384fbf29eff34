"""TensorBoard event-file export (core/tb_export.py).

The writer must produce byte-correct TFRecord framing (masked CRC32C) and
protobuf Events, verified three ways: a CRC-checked round-trip through the
module's own independent parser, known-answer CRC32C vectors, and — when a
TensorFlow/TensorBoard install is present — the official loader.
"""

import os
import struct

import numpy as np
import pytest

from soft_contrastive_learning_tpu.core import tb_export
from soft_contrastive_learning_tpu.core.logging import MetricsWriter


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli).
    assert tb_export._crc32c(b"") == 0x00000000
    assert tb_export._crc32c(b"123456789") == 0xE3069283
    assert tb_export._crc32c(bytes(32)) == 0x8A9136AA


def test_varint_matches_protobuf_spec():
    assert tb_export._varint(0) == b"\x00"
    assert tb_export._varint(1) == b"\x01"
    assert tb_export._varint(300) == b"\xac\x02"
    # negative int64 encodes as 10-byte two's complement varint
    assert len(tb_export._varint(-1)) == 10


def test_event_file_roundtrip(tmp_path):
    w = tb_export.EventFileWriter(str(tmp_path))
    w.add_scalars({"loss": 1.5, "lr": 5e-6}, step=10, wall_time=123.0)
    w.add_scalars({"loss": 0.75}, step=20, wall_time=124.0)
    w.close()

    events = tb_export.read_events(w.path)
    # record 0 is the brain.Event:2 version header
    assert events[0][1] == 0 and events[0][2] == {}
    wall, step, vals = events[1]
    assert (wall, step) == (123.0, 10)
    assert vals["loss"] == pytest.approx(1.5)
    assert vals["lr"] == pytest.approx(5e-6, rel=1e-6)
    assert events[2][1] == 20
    assert events[2][2]["loss"] == pytest.approx(0.75)


def test_corrupt_crc_detected(tmp_path):
    w = tb_export.EventFileWriter(str(tmp_path))
    w.add_scalars({"x": 1.0}, step=1)
    w.close()
    data = bytearray(open(w.path, "rb").read())
    data[-5] ^= 0xFF  # flip a payload byte; its trailing CRC now mismatches
    open(w.path, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        tb_export.read_events(w.path)


def test_export_run_from_jsonl(tmp_path):
    run_dir = str(tmp_path)
    for role in ("local", "other"):
        mw = MetricsWriter(run_dir, role=role)
        for step in range(5):
            mw.scalar("train_loss", float(np.sin(step)), step)
        mw.scalar("50m-auc@Top1", 0.9, 100)

    counts = tb_export.export_run(run_dir)
    assert counts == {"local": 6, "other": 6}
    for role in ("local", "other"):
        d = os.path.join(run_dir, "tb", role)
        files = [f for f in os.listdir(d) if f.startswith("events.out.tfevents.")]
        assert len(files) == 1
        events = tb_export.read_events(os.path.join(d, files[0]))
        scalar_events = [e for e in events if e[2]]
        assert len(scalar_events) == 6
        tags = {t for _, _, vals in scalar_events for t in vals}
        assert tags == {"train_loss", "50m-auc@Top1"}


@pytest.mark.slow
def test_official_reader_if_available(tmp_path):
    """If a real TF/tensorboard is installed, the files must load with it."""
    tf = pytest.importorskip("tensorflow")
    w = tb_export.EventFileWriter(str(tmp_path))
    w.add_scalars({"a/b": 2.0}, step=7)
    w.close()
    got = []
    for rec in tf.data.TFRecordDataset(w.path):
        ev = tf.compat.v1.Event.FromString(rec.numpy())
        for v in ev.summary.value:
            got.append((ev.step, v.tag, v.simple_value))
    assert got == [(7, "a/b", 2.0)]


def test_framing_layout_is_tfrecord(tmp_path):
    """First 8 bytes are the little-endian payload length; the 4 bytes after
    are its masked CRC — the exact invariant TensorBoard's loader checks."""
    w = tb_export.EventFileWriter(str(tmp_path))
    w.close()
    data = open(w.path, "rb").read()
    (length,) = struct.unpack_from("<Q", data, 0)
    assert 12 + length + 4 == len(data)
    (hcrc,) = struct.unpack_from("<I", data, 8)
    assert hcrc == tb_export._masked_crc(data[:8])
